"""Skew mitigation: salted joins and salted high-cardinality aggregation.

AQE's skew-join handles moderate skew at runtime; explicit salting is
the deterministic tool for the pathological case — a join key (hot
contig, viral-genome position, boilerplate fingerprint) carrying an
orders-of-magnitude share of rows, where one reducer would own the whole
key. The techniques here are the standard pair:

- ``salted_join``: fact side gets a uniform random salt in [0, n);
  the dimension side is exploded n ways (one row per salt value), so the
  hot key's rows spread over n reducers. Exact same join result —
  replication factor n on the (small) right side is the price.
- ``two_phase_agg``: count/sum-style aggregation over a skewed key in
  two hops: partial agg on (key, salt), final agg on key. Spark's
  map-side partial aggregation usually makes this unnecessary; it
  matters when the partial state itself is large (collect_set,
  approx sketches) and one reducer would hold the hot key's state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the right
    side replicated n_salts times. Result set identical to
    ``left.join(right, on, how)`` for inner/left joins."""
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_replicated, keys + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Salted two-phase aggregation for algebraic functions.

    ``aggs``: output column -> "fn(input)" with fn in {count, sum, min,
    max}. Phase 1 groups by (keys + salt); phase 2 re-aggregates partials
    (count re-aggregates as sum).
    """
    import re

    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1, phase2 = [], []
    for out_col, spec in aggs.items():
        m = re.fullmatch(r"(count|sum|min|max)\((.*)\)", spec.strip())
        if not m:
            raise ValueError(f"unsupported agg spec {spec!r}")
        fn, arg = m.group(1), m.group(2).strip()
        if fn == "count":
            phase1.append(F.count(F.lit(1) if arg in ("*", "") else F.col(arg)).alias(out_col))
            phase2.append(F.sum(out_col).alias(out_col))
        else:
            phase1.append(getattr(F, fn)(F.col(arg)).alias(out_col))
            phase2.append(getattr(F, fn)(F.col(out_col)).alias(out_col))
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1)
    return partial.groupBy(*key_cols).agg(*phase2)
