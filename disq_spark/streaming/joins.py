"""Watermarked stream-stream joins.

The pattern behind real-time enrichment (click <- most-recent purchase,
impression <- conversion attribution): an inner join keyed on an entity
id with a time-range predicate, where BOTH sides are unbounded. Spark
buffers each side's unmatched rows in state; the watermark + time bound
are what let it EVICT state — without them the join's memory grows with
the stream. State per key is bounded by (watermark delay + window)
worth of rows, independent of total stream length — the only property
that matters for an always-on pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window: str = "30 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event happened
    within ``window`` BEFORE the left event (attribution direction).
    Both sides must carry ``key`` and ``ts`` columns; right columns come
    back ``right_prefix``-ed.

    Both sides get ``watermark``; state eviction needs the watermark AND
    the two-sided time predicate (Spark derives each side's buffer
    retention from them).
    """
    r = right
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    lw = left.withWatermark(ts, watermark)
    rw = r.withWatermark(f"{right_prefix}{ts}", watermark)
    rkey, rts = f"{right_prefix}{key}", f"{right_prefix}{ts}"
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) <= F.col(ts))
        & (F.col(rts) >= F.col(ts) - F.expr(f"INTERVAL {window}"))
    )
    return lw.join(rw, cond, "inner")
