"""Distributed sketch operators: HyperLogLog, count-min, Bloom pruning.

The profiling toolkit a 100 TB pipeline reaches for before it can afford
exact answers: cardinality estimates per group (HLL), heavy-hitter
counts (count-min), and join-input pruning (Bloom). All three follow the
same Spark shape — one pass, map-side partial aggregation, a shuffle of
SKETCH-sized (not data-sized) state:

- ``hll_registers``:  groupBy(bucket).max(rho) — the shuffle carries at
                      most m=2**p rows per group regardless of input
                      size, and partial agg collapses everything else
                      map-side. Registers merge by max, so sketches of
                      shards combine without rescanning.
- ``countmin_table``: groupBy((row, col)).count() — depth*width cells
                      total; estimates read min over depth cells.
- ``bloom_bitmap``:   distinct bit positions (<= m_bits after map-side
                      dedup) collected once; the filter side then tests
                      k bits per row against a plan literal — no join,
                      no shuffle, applied before the real join's
                      exchange.

Determinism contract (same as operators/dedup.py): every hash is
md5-of-string and all arithmetic is integer or exactly-representable
powers of two, so HLL and count-min results are bit-identical across
engines — each has an exact ANSI-SQL oracle built from the same
generated fragments. The HLL estimate keeps its harmonic numerator as
an exact BIGINT (sum of 2**(R-rho) terms) and divides a precomputed
double constant by it: one IEEE division, no float summation order to
diverge. Bloom pruning needs no oracle parity at all — false positives
are removed by the exact join that follows, so the oracle is the plain
join.

The reference engine has no sketch surface; this module is part of the
beyond-reference LLM-pipeline layer (SURVEY.md §2.5 note).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared SQL fragments (valid in both Spark SQL and DuckDB — see the
# parity pattern in operators/dedup.py::_HEXVAL)
# ---------------------------------------------------------------------------

_HEXVAL = "(instr('0123456789abcdef', {d}) - 1)"

#: rho reads this many hex digits after the bucket prefix (48 bits).
RHO_DIGITS = 12
#: rho range: 1..R with R = 4*RHO_DIGITS + 1 (all-zero hash window).
RHO_MAX = 4 * RHO_DIGITS + 1


def hex2int_sql(hexpr: str, ndigits: int) -> str:
    """SQL: integer value of the first ``ndigits`` hex chars of ``hexpr``.

    ``hexpr`` should be a (cheap) column reference, not a recomputed
    expression — it is substituted once per digit.
    """
    # multipliers as BIGINT literals: digit * 16^7 already overflows
    # int32, which Spark's ANSI mode (4.x default) raises on
    terms = [
        _HEXVAL.format(d=f"substring({hexpr}, {i + 1}, 1)")
        + f" * CAST({16 ** (ndigits - 1 - i)} AS BIGINT)"
        for i in range(ndigits)
    ]
    return "(" + " + ".join(terms) + ")"


def rho_sql(s12: str) -> str:
    """SQL: HLL rho (1 + count of leading zero BITS) of a 12-hex-digit
    window expression ``s12``; the all-zero window maps to RHO_MAX."""
    stripped = f"trim(LEADING '0' FROM {s12})"
    lz_chars = f"({RHO_DIGITS} - length({stripped}))"
    v = _HEXVAL.format(d=f"substring({stripped}, 1, 1)")
    within = f"(CASE WHEN {v} >= 8 THEN 0 WHEN {v} >= 4 THEN 1 WHEN {v} >= 2 THEN 2 ELSE 3 END)"
    return (
        f"(CASE WHEN length({stripped}) = 0 THEN {RHO_MAX} "
        f"ELSE 4 * {lz_chars} + {within} + 1 END)"
    )


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m registers."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame, col: str, p: int = 12, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """HLL register table: (group_cols..., bucket, max_rho).

    ``p`` must be a multiple of 4 in [4, 12] (bucket = first p/4 hex
    digits of md5; p <= 12 keeps the estimate numerator exact in
    BIGINT). The register table IS the sketch state: shards merge by
    ``groupBy(bucket).max(max_rho)``, so incremental/distributed
    maintenance is free. ``col`` is hashed via md5('' || col) — int and
    string keys format identically in Spark and DuckDB.
    """
    if p % 4 != 0 or not 4 <= p <= 12:
        raise ValueError(f"p must be a multiple of 4 in [4, 12], got {p}")
    bd = p // 4
    with_h = df.withColumn("__h", F.expr(f"md5('' || {col})"))
    bucket = F.expr(hex2int_sql("__h", bd)).alias("bucket")
    rho = F.expr(rho_sql(f"substring(__h, {bd + 1}, {RHO_DIGITS})"))
    keys = [F.col(g) for g in group_cols] + [bucket]
    return with_h.groupBy(*keys).agg(F.max(rho).alias("max_rho"))


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: tuple[str, ...] = (),
    correct_small: bool = True,
) -> DataFrame:
    """Approximate count-distinct of ``col`` (per group): one row per
    group with ``est_distinct`` (double).

    Estimate = alpha * m^2 / sum_j 2^-rho_j over all m registers (empty
    register: rho=0). The harmonic sum is carried as the exact integer
    sum of 2^(RHO_MAX - rho_j) — bit-identical across engines — and the
    constant alpha*m^2*2^RHO_MAX is folded into one double literal, so
    the raw estimate is a single IEEE division.

    ``correct_small=True`` applies the standard linear-counting branch
    (m * ln(m/empty) when est < 2.5m and empty > 0) — more accurate, but
    ln() may differ in the last ulp across engines; gate queries that
    must hash-match an oracle use ``correct_small=False``.
    """
    m = 1 << p
    c = hll_alpha(m) * m * m * float(1 << RHO_MAX)
    reg = hll_registers(df, col, p, group_cols)
    agg = reg.groupBy(*[F.col(g) for g in group_cols]).agg(
        (F.lit(m) - F.count("*")).cast("long").alias("__empty"),
        F.sum(F.expr(f"cast(pow(2, {RHO_MAX} - max_rho) as bigint)")).alias("__occ"),
    )
    num = F.col("__occ") + F.col("__empty") * F.lit(1 << RHO_MAX)
    raw = F.lit(c) / num.cast("double")
    if correct_small:
        est = F.when(
            (raw <= 2.5 * m) & (F.col("__empty") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__empty").cast("double")),
        ).otherwise(raw)
    else:
        est = raw
    return agg.select(*group_cols, est.alias("est_distinct"))


def hll_estimate_sql(p: int, correct_small: bool = False) -> tuple[str, str]:
    """(empty_expr, estimate_expr) SQL fragments over a register table
    aggregation — for oracle construction. The register aggregation must
    provide columns ``__empty`` and ``__occ`` as produced by the
    equivalent of hll_distinct's groupBy; estimate_expr then reproduces
    the Spark result bit-for-bit (with correct_small=False).
    """
    m = 1 << p
    c = hll_alpha(m) * m * m * float(1 << RHO_MAX)
    num = f"(__occ + __empty * {1 << RHO_MAX})"
    raw = f"({c!r} / CAST({num} AS DOUBLE))"
    if not correct_small:
        return "__empty", raw
    lin = f"({float(m)!r} * ln({float(m)!r} / CAST(__empty AS DOUBLE)))"
    return "__empty", f"(CASE WHEN {raw} <= {2.5 * m} AND __empty > 0 THEN {lin} ELSE {raw} END)"


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def _cm_width_digits(width: int) -> int:
    wd = round(math.log(width, 16))
    if 16**wd != width:
        raise ValueError(f"width must be a power of 16, got {width}")
    return wd


def countmin_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of the (non-distinct) stream of ``col`` values:
    (row, col, cnt) with depth*width cells.

    One explode (depth cells per input row) + one groupBy with map-side
    partial aggregation — the shuffle carries at most depth*width rows
    per map partition. ``width`` must be a power of 16 so the column
    index is a clean hex-prefix of md5(row || ':' || value).
    """
    wd = _cm_width_digits(width)
    cells = []
    for r in range(depth):
        h = f"md5('{r}:' || {col})"
        cells.append(F.struct(F.lit(r).alias("row"), F.expr(hex2int_sql(h, wd)).alias("col")))
    return (
        df.select(F.explode(F.array(*cells)).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_lookup(
    cm: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimate stream counts for each probe value: (col..., cm_est).

    cm_est = min over the depth cells the value hashes to — an upper
    bound on the true count (over-count only, never under). The probe
    side is expected small (heavy-hitter candidates); cm itself is
    depth*width rows, so both join inputs are sketch-sized.
    """
    wd = _cm_width_digits(width)
    cells = [
        F.struct(
            F.lit(r).alias("row"),
            F.expr(hex2int_sql(f"md5('{r}:' || {col})", wd)).alias("col"),
        )
        for r in range(depth)
    ]
    probed = probes.select(
        F.col(col), F.explode(F.array(*cells)).alias("cell")
    ).select(col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probed.join(F.broadcast(cm), ["row", "col"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

#: 5 hex digits = 20 bits of position entropy; m_bits must stay below.
_BLOOM_POS_DIGITS = 5
_BLOOM_POS_SPACE = 16**_BLOOM_POS_DIGITS


def bloom_bitmap(keys_df: DataFrame, col: str, m_bits: int = 16384, k: int = 3) -> str:
    """Build a Bloom bitmap (hex string, m_bits/4 chars) over the key
    column. Bit positions are md5-derived, so the same key always sets
    the same bits — build and probe agree across engines and sessions.

    Distributed build: the k positions per key are deduped map-side
    (groupBy partial agg) before the <= m_bits distinct positions are
    collected — driver traffic is bitmap-sized, never key-set-sized.
    """
    if m_bits > _BLOOM_POS_SPACE:
        raise ValueError(f"m_bits must be <= {_BLOOM_POS_SPACE}")
    pos = [
        F.expr(hex2int_sql(f"md5('{i}:' || {col})", _BLOOM_POS_DIGITS)) % m_bits
        for i in range(k)
    ]
    rows = (
        keys_df.select(F.explode(F.array(*pos)).alias("p")).distinct().collect()
    )
    digits = [0] * (m_bits // 4)
    for r in rows:
        b = r[0]
        digits[b // 4] |= 8 >> (b % 4)  # MSB-first within each hex digit
    return "".join(format(d, "x") for d in digits)


def bloom_prune(
    df: DataFrame, col: str, bitmap: str, m_bits: int = 16384, k: int = 3
) -> DataFrame:
    """Keep only rows whose key might be in the Bloom set (no false
    negatives). The bitmap rides the plan as a literal — the test is k
    bit-lookups per row, applied BEFORE any join exchange, so the
    pruned rows never shuffle. Follow with the exact join; false
    positives (rate ~ (1 - e^(-kn/m))^k) are removed there, which is
    why bloom-pruned plans need no oracle of their own.

    Deliberately NO fan_out here (r11 stage sweep flagged the 2.3 s
    single-task k-bit-test scan at sf0.01): downstream consumers sum
    doubles off the pruned rows, and a repartition changes partial-agg
    accumulation order — measured flipping bloom_semi_join's
    round(sum, 2) by one cent at a .415 boundary. The serial scan is a
    narrow-fixture artifact only; at scale the source carries >= cores
    partitions natively.
    """
    pred = None
    for i in range(k):
        pos = (F.expr(hex2int_sql(f"md5('{i}:' || {col})", _BLOOM_POS_DIGITS)) % m_bits).alias(
            "__p"
        )
        digit = F.substring(F.lit(bitmap), (pos / 4).cast("int") + 1, 1)
        # hex value of the digit, then test bit (pos % 4), MSB first
        dv = F.instr(F.lit("0123456789abcdef"), digit) - 1
        bit = F.floor(dv / F.pow(F.lit(2), F.lit(3) - pos % 4)).cast("long") % 2
        t = bit == 1
        pred = t if pred is None else (pred & t)
    return df.filter(pred)


# ---------------------------------------------------------------------------
# table profiling
# ---------------------------------------------------------------------------


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    p: int = 8,
    correct_small: bool = True,
) -> DataFrame:
    """Column profile: (column, n_rows, n_null, n_distinct_est, min_str,
    max_str) — the first look at an unknown 100 TB table.

    Two scans total, never one per column:
      1. one wide aggregate row: count + per-column null count and
         min/max (compared in native type, reported as string),
      2. a ``stack`` melt to (column, value) feeding the grouped HLL —
         per-column distinct estimates from one pass, shuffle =
         #cols * 2^p register rows.

    Values hash via their string form, so int/string/date/timestamp
    columns match the DuckDB oracle exactly (float columns profile fine
    but their string forms — and so the hash buckets — are
    engine-specific). ``correct_small=True`` (default) applies HLL
    linear counting so low-cardinality columns read right; gate queries
    needing bit-exact oracles pass False (raw path) and stick to
    columns with >= 2.5 * 2^p distinct values.
    """
    cols = cols or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    per_col = stats.select(
        F.col("__n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"__null_{c}").alias("n_null"),
                        F.col(f"__min_{c}").alias("min_str"),
                        F.col(f"__max_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("s"),
    ).select("s.col_name", "n_rows", "s.n_null", "s.min_str", "s.max_str")

    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    melted = df.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, value)"
    ).filter(F.col("value").isNotNull())
    est = hll_distinct(
        melted, "value", p=p, group_cols=("col_name",), correct_small=correct_small
    ).select("col_name", F.round("est_distinct", 4).alias("n_distinct_est"))

    return per_col.join(est, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct_est", F.lit(0.0)).alias("n_distinct_est"),
        "min_str",
        "max_str",
    )
