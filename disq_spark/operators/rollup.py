"""Multi-resolution time rollups (hypertable-style continuous
aggregates).

The OLAP staple: the same measures at minute/hour/day grain. The naive
formulation aggregates the RAW table once per grain — k full scans. The
cascade re-aggregates each coarser level from the next finer one
instead: raw -> minute is the only full scan; hour comes from minute
(60x smaller), day from hour (24x smaller). Correct for the
decomposable aggregates (sum/count/min/max — count re-aggregates as
SUM of child counts); avg is carried as (sum, count) and finalized per
level.

At 100 TB the cascade is also the INCREMENTAL maintenance shape: a new
partition of raw data updates its minute slices, and the coarser levels
re-aggregate only the touched slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grain name -> (truncation unit for date_trunc, parent grain)
GRAINS = {"minute": "minute", "hour": "hour", "day": "day"}


def cascade_rollup(
    df: DataFrame,
    ts: str = "ts",
    keys: tuple[str, ...] = (),
    value: str = "value",
) -> dict[str, DataFrame]:
    """{'minute'|'hour'|'day': DataFrame(keys..., bucket, n, total, vmin,
    vmax)} — each coarser level re-aggregated from the finer one.

    One raw scan total; the hour plan reads the minute AGGREGATE (its
    lineage, re-executed unless persisted — persist/materialize the
    minute level in a real pipeline and both coarser levels become
    nearly free).
    """
    kcols = [F.col(k) for k in keys]

    minute = (
        df.groupBy(*kcols, F.date_trunc("minute", F.col(ts)).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(value).alias("total"),
            F.min(value).alias("vmin"),
            F.max(value).alias("vmax"),
        )
    )

    def _up(child: DataFrame, unit: str) -> DataFrame:
        return (
            child.groupBy(*kcols, F.date_trunc(unit, F.col("bucket")).alias("bucket"))
            .agg(
                F.sum("n").alias("n"),          # count re-aggregates as sum
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )

    hour = _up(minute, "hour")
    day = _up(hour, "day")
    return {"minute": minute, "hour": hour, "day": day}
