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


def parse_bed_line(line: str) -> tuple[str, int, int, str | None] | None:
    """One BED line -> (contig, start_1, end_1, name) in 1-based closed
    coordinates, or None for blank/comment/track lines. The single
    line-level parse shared by ``bed_intervals`` and the ``bed``
    DataSource so coordinate conversion cannot drift between them."""
    line = line.rstrip("\n")
    if not line.strip() or line.startswith(_SKIP_PREFIXES):
        return None
    t = line.split("\t")
    return t[0], int(t[1]) + 1, int(t[2]), (t[3] if len(t) > 3 else None)


def bed_intervals(path: str, merge: bool = True) -> list[Interval]:
    """Driver-side BED read -> merged list[Interval] (1-based closed),
    ready for the ``intervals=`` pushdown of every genomics source."""
    out: list[Interval] = []
    with io.TextIOWrapper(_dfs.open_input(path), encoding="utf-8") as f:
        for line in f:
            parsed = parse_bed_line(line)
            if parsed is not None:
                out.append(Interval(parsed[0], parsed[1], parsed[2]))
    return merge_intervals(out) if merge else out
