"""Structured Streaming over genomic reads.

The batch sources (BAM/CRAM/SAM) are bounded files, but a sequencing
facility's pipeline sees reads ARRIVE -- per flow-cell, per run, per
sample. The natural Spark expression is a parquet-landing zone written
by the instrument-side ETL (``sinks.materialize``) consumed with
``readStream``; these operators are the incremental analytics that run
on top. All state is bounded: per-bin counters (genome/bin_size keys)
and watermark-bounded windows, never per-read state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_read_counts(stream: DataFrame, bin_size: int = 10_000) -> DataFrame:
    """Incremental per-bin read counts (streaming analog of
    ``operators.genomics.coverage_bins``): every arriving read adds 1
    to each ``bin_size`` bin its span overlaps. The explode emits
    span/bin_size + 1 rows per read (1-2 for short reads), and the
    aggregation state is one counter per touched (contig, bin) --
    genome-bounded, so 'complete'/'update' output modes stay safe at
    any stream length."""
    bins = F.expr(
        f"sequence(cast((start - 1) / {bin_size} as long), "
        f"cast((end - 1) / {bin_size} as long))"
    )
    return (
        stream.filter(
            F.col("contig").isNotNull()
            & F.col("start").isNotNull()
            & F.col("end").isNotNull()
        )
        .select("contig", F.explode(bins).alias("bin"))
        .groupBy("contig", "bin")
        .agg(F.count("*").alias("n_reads"))
    )
