"""Z-order (Morton) clustering — multi-column data layout for min/max
row-group pruning.

A Parquet lake prunes row groups with per-column min/max statistics;
sorting by one column makes its stats tight but leaves every other
column's ranges full-width. Interleaving the bits of several quantized
columns into one Morton key and range-partitioning + sorting by that key
makes EVERY participating column's per-row-group range narrow, so a
conjunctive box predicate (x BETWEEN ... AND y BETWEEN ...) skips most
groups. This is the standard lakehouse layout trick (Delta/Iceberg
`OPTIMIZE ZORDER BY`), implemented here as plain integer Column
arithmetic — quantization is exact integer rank-scaling, so the layout
(and the gate query over it) is reproducible bit-for-bit in any engine.

Scale shape: one scalar min/max aggregate (broadcast), one
repartitionByRange on the z-key (the one unavoidable shuffle — it IS
the re-layout), and a per-partition sort. No Python, no skew (Morton
keys of rank-quantized columns are near-uniform by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per column; 2 cols x 8 bits = 16-bit Morton keys.
DEFAULT_BITS = 8


def quantize_sql(col: str, mn: str, mx: str, bits: int, div: str) -> str:
    """Integer rank-scaling of ``col`` onto [0, 2^bits): exact integer
    arithmetic, identical in Spark SQL (div='div') and DuckDB (div='//').

    Supported input range: ``z_value`` enforces range <= 2^62 / (2^bits
    - 1) (~1.8e16 at the default 8 bits) — one bit under the int64 limit
    as headroom for the min/max aggregates feeding the guard. Beyond the
    int64 limit Spark (ANSI off) silently wraps
    while DuckDB raises — ``z_value`` guards this with a runtime
    ``assert_true`` on the computed column ranges so the wrap can never
    happen silently."""
    levels = (1 << bits) - 1
    return f"((({col}) - ({mn})) * {levels}) {div} greatest(({mx}) - ({mn}), 1)"


def interleave_sql(qcols: Sequence[str], bits: int) -> str:
    """Morton interleave of pre-quantized integer expressions. Bit i of
    column j lands at position i * n_cols + (n_cols - 1 - j), so earlier
    columns take the more significant within-round slots."""
    n = len(qcols)
    terms = []
    for i in range(bits):
        for j, q in enumerate(qcols):
            pos = i * n + (n - 1 - j)
            # fully parenthesized: DuckDB gives '+' higher precedence
            # than '<<', so a bare `x << p + y << q` chain misparses
            terms.append(f"(((({q}) >> {i}) & 1) << {pos})")
    return "(" + " + ".join(terms) + ")"


def z_value(
    df: DataFrame, cols: Sequence[str], bits: int = DEFAULT_BITS
) -> DataFrame:
    """Add a ``__z`` Morton-key column over ``cols`` (integer columns).

    Column mins/maxes come from one scalar aggregate broadcast back —
    two scans total, the second being the one that re-writes anyway."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    qexprs = [
        quantize_sql(c, f"__mn_{c}", f"__mx_{c}", bits, "div") for c in cols
    ]
    # overflow guard: (mx - mn) * (2^bits - 1) must fit in int64 or the
    # multiply in quantize_sql wraps silently (ANSI off). assert_true is
    # NULL when the check passes, so coalescing the checks into the __z
    # sum is a no-op arithmetically but keeps them from being pruned;
    # double cast so the guard's own subtraction can't overflow.
    safe_range = float((1 << 62) // ((1 << bits) - 1))
    checks = [
        F.assert_true(
            (
                F.col(f"__mx_{c}").cast("double")
                - F.col(f"__mn_{c}").cast("double")
            )
            <= F.lit(safe_range),
            F.lit(
                f"z_value: range of column {c!r} too wide for exact "
                f"{bits}-bit quantization (would overflow int64)"
            ),
        ).cast("long")
        for c in cols
    ]
    zcol = F.expr(interleave_sql(qexprs, bits)).cast("long") + F.coalesce(
        *checks, F.lit(0).cast("long")
    )
    out = out.withColumn("__z", zcol)
    return out.drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    n_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` in Morton order: range-partition by the z-key
    (contiguous key ranges per output file) and sort within partitions
    (tight row-group stats inside each file). Write the result with
    ``.write.parquet`` and conjunctive filters on ``cols`` prune."""
    z = z_value(df, cols, bits)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return z.repartitionByRange(n, "__z").sortWithinPartitions("__z").drop("__z")
