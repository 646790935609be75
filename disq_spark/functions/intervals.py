"""Genomic interval predicates as Catalyst Column expressions.

The reference's interval traversal (HtsjdkReadsTraversalParameters.java:
38-55, BoundedTraversalUtil.java:35-51, AbstractBinarySamSource.java:
103-158) becomes: (a) partition pruning in the source planner where an
index exists, plus (b) the residual per-record overlap predicate below —
which is all Spark needs for correctness; the index pruning is purely a
physical optimization.

Intervals are 1-based closed (contig, start, end), htsjdk-style.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from disq_spark.schemas import FLAG_UNMAPPED


@dataclass(frozen=True)
class Interval:
    contig: str
    start: int  # 1-based inclusive
    end: int  # 1-based inclusive


def merge_intervals(intervals: list[Interval]) -> list[Interval]:
    """Sort + merge overlapping/adjacent intervals per contig — the
    QueryInterval.optimizeIntervals step (BoundedTraversalUtil.java:35-51)."""
    by_key = sorted(intervals, key=lambda iv: (iv.contig, iv.start, iv.end))
    out: list[Interval] = []
    for iv in by_key:
        if out and out[-1].contig == iv.contig and iv.start <= out[-1].end + 1:
            if iv.end > out[-1].end:
                out[-1] = Interval(out[-1].contig, out[-1].start, iv.end)
        else:
            out.append(iv)
    return out


def overlaps(intervals: list[Interval], contig="contig", start="start", end="end") -> Column:
    """Column predicate: record overlaps any interval (1-based closed
    overlap semantics, htsjdk ``contained=false``
    AbstractBinarySamSource.java:136)."""
    if not intervals:
        return F.lit(False)
    pred = None
    for iv in merge_intervals(intervals):
        p = (
            (F.col(contig) == iv.contig)
            & (F.col(start) <= iv.end)
            & (F.col(end) >= iv.start)
        )
        pred = p if pred is None else (pred | p)
    return pred


def is_unplaced_unmapped(flags="flags", start="start") -> Column:
    """Unplaced-unmapped: unmapped flag set and no position
    (AbstractBinarySamSource.java:141-157 tail-traversal semantics)."""
    return (F.col(flags).bitwiseAND(FLAG_UNMAPPED) != 0) & F.col(start).isNull()


def filter_intervals(
    df: DataFrame,
    intervals: list[Interval] | None,
    traverse_unplaced_unmapped: bool = False,
) -> DataFrame:
    """The HtsjdkReadsTraversalParameters surface as a DataFrame filter.

    ``intervals=None`` with ``traverse_unplaced_unmapped=True`` returns
    only unplaced-unmapped reads; both None is an error, mirroring
    AbstractBinarySamSource.java:75-79.
    """
    if intervals is None and not traverse_unplaced_unmapped:
        raise ValueError("intervals and traverse_unplaced_unmapped both unset")
    pred = None
    if intervals is not None:
        pred = overlaps(intervals)
    if traverse_unplaced_unmapped:
        uu = is_unplaced_unmapped()
        pred = uu if pred is None else (pred | uu)
    return df.filter(pred)


def parse_intervals(spec: str) -> list[Interval]:
    """'chr1:100-200,chrX:5-10' -> [Interval] (1-based closed, the
    samtools region-string convention) — the option format the
    registrable DataSources accept, since the Python DataSource API
    carries strings, not objects."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        contig, _, rng = part.rpartition(":")
        if not contig:
            raise ValueError(f"bad interval {part!r} (want contig:start-end)")
        lo, _, hi = rng.partition("-")
        out.append(Interval(contig, int(lo), int(hi or lo)))
    return out
