"""Streaming event analytics: watermarked tumbling windows and
gap-based session windows over an event stream.

Batch equivalents of both live in queries/events.py (oracle-checked);
these are the incremental formulations: same logical aggregation, with
state bounded by the watermark. Tested by driving a parquet-backed
stream to completion with an availableNow trigger + memory sink.

Scale notes: state store size = (#keys x #open windows); the 10-minute
watermark bounds replay/late-data state. session_window merges
adjacent state entries, the standard way to sessionize unbounded
streams without a per-user sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window count/sum per event type (append-mode safe)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization via session_window — the streaming
    equivalent of the batch lag+cumsum formulation in queries/events.py."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
