"""BED interval files: the lingua franca for genomic region lists
(targets, blacklists, capture kits).

BED is 0-based half-open; the reads/variants schemas are 1-based closed
(htsjdk convention, SURVEY §1.2) — conversion happens HERE, once, so
everything downstream stays in one coordinate system:
    start_1 = bed_start + 1, end_1 = bed_end.

Two consumers:
- ``read_bed``: distributed DataFrame (big BED files join against reads
  via operators/genomics.interval_join).
- ``bed_intervals``: driver-side list[Interval] for index pushdown into
  read_bam/read_vcf/read_cram (interval lists are small when used for
  partition pruning — a capture kit is ~10^5 rows).
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disq_spark import fs as _dfs
from disq_spark.functions.intervals import Interval, merge_intervals

_SKIP_PREFIXES = ("#", "track", "browser")


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    """BED -> DataFrame(contig, start, end, name) in 1-based closed
    coordinates. Splittable (``spark.read.text``); header/track/comment
    lines are dropped by a Catalyst predicate before parsing."""
    text = spark.read.text(path)
    v = F.col("value")
    for p in _SKIP_PREFIXES:
        text = text.filter(~v.startswith(p))
    text = text.filter(F.length(F.trim(v)) > 0)
    parts = F.split(v, "\t")
    return text.select(
        parts[0].alias("contig"),
        (parts[1].cast("long") + 1).alias("start"),
        parts[2].cast("long").alias("end"),
        F.when(F.size(parts) > 3, parts[3]).alias("name"),
    )


def bed_intervals(path: str, merge: bool = True) -> list[Interval]:
    """Driver-side BED read -> merged list[Interval] (1-based closed),
    ready for the ``intervals=`` pushdown of every genomics source."""
    out: list[Interval] = []
    with io.TextIOWrapper(_dfs.open_input(path), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip() or line.startswith(_SKIP_PREFIXES):
                continue
            fields = line.split("\t")
            out.append(Interval(fields[0], int(fields[1]) + 1, int(fields[2])))
    return merge_intervals(out) if merge else out
