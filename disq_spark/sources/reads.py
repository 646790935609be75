"""SAM/BAM -> reads DataFrame (SAM text path here; BAM in bam_source.py).

SAM lifecycle re-expressed (SamSource.java:61-104): Hadoop text splits ->
skip '@' header lines -> per-record parse. Spark-first: ``spark.read.text``
(already locality-aware + splittable) feeds an Arrow-batched pandas parse;
the '@' filter is a Catalyst predicate that prunes whole batches before
Python sees them.
"""

from __future__ import annotations

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
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.startswith("@"):
                lines.append(line)
            else:
                break
    return SamHeader(text="".join(lines))


def read_sam(spark: SparkSession, path: str) -> tuple[DataFrame, SamHeader]:
    """Load SAM (file, dir, or glob) as a reads DataFrame + header."""
    paths = resolve_paths(path, SAM_EXTENSIONS)
    header = read_sam_header(paths[0])

    text = spark.read.text(list(paths)).filter(~F.col("value").startswith("@"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield parse_sam_lines(pdf["value"])

    return text.mapInPandas(parse, READS_SCHEMA), header
