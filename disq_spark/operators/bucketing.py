"""Bucketed tables: co-located fact-fact joins without a shuffle.

At 100 TB the dominant cost of orders x lineitem-shaped joins is the
exchange of both facts. Writing the facts bucketed (and sorted) by the
join key once turns every later equi-join on that key into a zero-
exchange sort-merge join — Spark matches bucket specs at plan time and
drops both Exchange nodes. The write pays one shuffle; every downstream
join is free. This is the disk-layout analog of what
``sinks/materialize.py`` does for interval predicates.

Verified by plan inspection in tests/test_operators.py: the join over
the bucketed tables contains no Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) table."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key/bucket-count: planned as
    an exchange-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
