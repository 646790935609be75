"""SAM/BAM -> reads DataFrame (SAM text path here; BAM in bam_source.py).

SAM lifecycle re-expressed (SamSource.java:61-104): Hadoop text splits ->
skip '@' header lines -> per-record parse. Spark-first: ``spark.read.text``
(already locality-aware + splittable) feeds an Arrow-batched pandas parse;
the '@' filter is a Catalyst predicate that prunes whole batches before
Python sees them.
"""

from __future__ import annotations

import io

from disq_spark import fs as _dfs

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disq_spark.formats.sam import parse_sam_lines
from disq_spark.headers import SamHeader
from disq_spark.schemas import READS_SCHEMA
from disq_spark.sources.plan import resolve_paths

SAM_EXTENSIONS = (".sam",)


def read_sam_header(path: str) -> SamHeader:
    """Driver-side header read from the first file
    (AbstractSamSource.java:54-71 semantics)."""
    lines = []
    with io.TextIOWrapper(_dfs.open_input(path), encoding="utf-8") as f:
        for line in f:
            if line.startswith("@"):
                lines.append(line)
            else:
                break
    return SamHeader(text="".join(lines))


def read_sam(
    spark: SparkSession,
    path: str,
    intervals: list | None = None,
    traverse_unplaced_unmapped: bool = False,
    mode: str = "STRICT",
) -> tuple[DataFrame, SamHeader]:
    """Load SAM (file, dir, or glob) as a reads DataFrame + header.

    ``intervals``: brute-force residual overlap filter — SAM has no index,
    matching the reference (TraversalOverlapDetector.java:34-59 applied at
    SamSource.java:93-102). ``mode``: STRICT/LENIENT/SILENT validation
    stringency (HtsjdkReadsRddStorage.java:85-88).
    """
    paths = resolve_paths(path, SAM_EXTENSIONS)
    header = read_sam_header(paths[0])

    text = spark.read.text(list(paths)).filter(~F.col("value").startswith("@"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield parse_sam_lines(pdf["value"], mode)

    df = text.mapInPandas(parse, READS_SCHEMA)
    if intervals is not None or traverse_unplaced_unmapped:
        from disq_spark.functions.intervals import filter_intervals

        df = filter_intervals(df, intervals, traverse_unplaced_unmapped)
    return df, header
