"""Streaming sketch maintenance — continuous profiling over unbounded
streams.

The batch sketch operators (operators/sketches.py) are deliberately
shaped as projection + groupBy-aggregate, which is exactly the class of
plan Structured Streaming can run incrementally in update mode with
bounded state:

- HLL registers:  groupBy(bucket).max(rho) — state = 2^p rows per group
                  set, FOREVER, regardless of stream volume. Each
                  micro-batch updates only the registers its rows touch.
- count-min:      groupBy((row, col)).count() — state = depth*width
                  cells. Running heavy-hitter counts with O(1) memory.

These wrappers exist to document and pin that property (the batch fns
accept streaming DataFrames unchanged); tests drive them with
availableNow and compare the final state against the batch sketch of the
same data — which must match EXACTLY, because both are the same
deterministic md5 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from disq_spark.operators.sketches import countmin_table, hll_registers


def streaming_hll_registers(stream: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Continuously-maintained HLL register table of a streaming column.
    Write with outputMode('update') or 'complete'; at any point the sink
    holds a mergeable cardinality sketch of everything seen so far."""
    if not stream.isStreaming:
        raise ValueError("streaming_hll_registers expects a streaming DataFrame")
    return hll_registers(stream, col, p)


def streaming_countmin(
    stream: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Continuously-maintained count-min cells of a streaming column.
    State is depth*width counters — bounded for any stream volume."""
    if not stream.isStreaming:
        raise ValueError("streaming_countmin expects a streaming DataFrame")
    return countmin_table(stream, col, depth, width)
