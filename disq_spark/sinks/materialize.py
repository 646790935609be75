"""Columnar materialization of genomics datasets (SURVEY.md §7 M7).

The reference's entire physical toolkit — BGZF split planning, record
guessing, index-driven pruning (§4) — exists because BAM/VCF are
row-oriented compressed text/binary. Landing the same rows in Parquet
makes all of it unnecessary: interval predicates become ordinary
partition pruning (contig directory) + row-group min/max pruning (start,
end), both free in the Parquet reader, at any scale.

Layout choices for 100 TB:
- ``partitionBy(contig)``: partition pruning on the equality half of an
  interval predicate; contig cardinality (~100s) keeps directory fan-out
  sane.
- ``repartitionByRange(contig, start) + sortWithinPartitions(start)``:
  clusters each file by position so row-group [min, max) spans are tight
  and an interval query touches O(interval/row-group) groups, not O(file).
  Range partitioning also bounds skew: hot contigs spread across many
  files while each file stays position-local.
- Statistics work out of the box: Parquet stores min/max per row group
  for long columns; Spark pushes >=/<= filters (PushedFilters in
  .explain), so reads.filter(overlaps(...)) scans only matching groups.

The header sidecar is persisted as ``_header.json`` next to the data so a
materialized dataset round-trips back to BAM/VCF losslessly.
"""

from __future__ import annotations

import io

from disq_spark import fs as _dfs

import json
import os

from pyspark.sql import DataFrame, SparkSession

from disq_spark.headers import SamHeader, VcfHeader

HEADER_FILE = "_header.json"


def _write(
    df: DataFrame,
    path: str,
    header_text: str,
    kind: str,
    num_files_per_contig: int | None,
) -> None:
    n = num_files_per_contig or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = (
        df.repartitionByRange(n, "contig", "start")
        .sortWithinPartitions("contig", "start")
        .write.mode("overwrite")
        .partitionBy("contig")
    )
    out.parquet(path)
    with io.TextIOWrapper(_dfs.open_output(os.path.join(path, HEADER_FILE)), encoding="utf-8") as f:
        json.dump({"kind": kind, "text": header_text}, f)


def materialize_reads(
    df: DataFrame, header: SamHeader, path: str, num_files_per_contig: int | None = None
) -> None:
    """reads DataFrame -> contig-partitioned, position-sorted Parquet."""
    _write(df, path, header.text, "reads", num_files_per_contig)


def materialize_variants(
    df: DataFrame, header: VcfHeader, path: str, num_files_per_contig: int | None = None
) -> None:
    """variants DataFrame -> contig-partitioned, position-sorted Parquet."""
    _write(df, path, header.text, "variants", num_files_per_contig)


def read_materialized(spark: SparkSession, path: str, intervals=None):
    """(DataFrame, header). With ``intervals``, the overlap predicate is
    applied as a plain Column filter — Catalyst turns it into partition
    pruning (contig=) + Parquet row-group min/max skipping; check
    ``df.explain()`` for PartitionFilters / PushedFilters."""
    with io.TextIOWrapper(_dfs.open_input(os.path.join(path, HEADER_FILE)), encoding="utf-8") as f:
        meta = json.load(f)
    header = (
        SamHeader(text=meta["text"]) if meta["kind"] == "reads" else VcfHeader(text=meta["text"])
    )
    df = spark.read.parquet(path)
    # partition-directory values are type-inferred (contig "1" -> int);
    # restore the schema contract: contig is always a string, in canonical
    # column order
    from pyspark.sql import functions as F

    from disq_spark.schemas import READS_COLUMNS, VARIANTS_COLUMNS

    df = df.withColumn("contig", F.col("contig").cast("string"))
    order = READS_COLUMNS if meta["kind"] == "reads" else VARIANTS_COLUMNS
    df = df.select(*[c for c in order if c in df.columns])
    if intervals is not None:
        from disq_spark.functions.intervals import overlaps

        df = df.filter(overlaps(intervals))
    return df, header
