"""Declarative data-quality constraint verification (Deequ-style).

A 100 TB ingest pipeline gates every batch on cheap invariants before
spending compute on it: key completeness/distinctness, value domains,
numeric bounds, format patterns, row-count sanity, and referential
containment between tables. The public precedent is AWS Deequ
("Automating Large-Scale Data Quality Verification", VLDB 2018); this is
the Spark-native single-pass re-expression: every constraint compiles to
one aggregate expression, ALL of them evaluate in ONE scan of the table
(one job, one row of metrics, exploded back to a row per constraint),
and failures are *recorded*, not raised — the caller decides whether a
failed check quarantines the batch.

Scale shape: the metrics row is a full-table aggregate — partial
(map-side) aggregation applies to every kind except ``distinctness``,
whose exact count-distinct adds one expand+shuffle per distinct column
(Spark plans multi-distinct via Expand; for approximate mode at 100 TB
use the HLL sketches in ``operators/sketches.py`` instead and accept the
~2% error). ``containment`` is the one constraint that cannot ride the
single scan: it joins the child column against the DISTINCT parent keys
(AQE broadcasts the parent side when small). No collect, no Python in
any row path; every metric has an exact ANSI-SQL equivalent used by the
DuckDB oracle.

No counterpart in the reference (disq is genomics I/O); this is part of
the beyond-reference pipeline tier alongside dedup/sampling/packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECK_SCHEMA_COLS = ("name", "kind", "col", "metric", "passed")


def _ratio_over_nonnull(flag_col) -> F.Column:
    """avg of a 0/1 flag computed only over non-null inputs (avg skips
    nulls) — the share-of-valid-values metric used by pattern/in_set."""
    return F.avg(flag_col.cast("double"))


def check_constraints(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Evaluate ``constraints`` against ``df`` in a single scan.

    Each constraint is a dict with ``name`` and ``kind`` plus
    kind-specific keys; returns one row per constraint:
    (name, kind, col, metric double, passed boolean).

    Kinds:
    - ``completeness``: share of non-null values in ``column``;
      passes when metric >= ``min_ratio`` (default 1.0).
    - ``distinctness``: count(distinct column) / count(*) (nulls count
      in the denominator only); passes when >= ``min_ratio``.
    - ``min`` / ``max``: the column extremum (cast to double); passes
      when >= / <= ``bound``.
    - ``pattern``: share of NON-NULL values matching the Java regex
      ``pattern`` (anchor it yourself — rlike is a find, not a full
      match); passes when >= ``min_ratio``.
    - ``in_set``: share of non-null values in ``values``; passes when
      >= ``min_ratio``.
    - ``row_count``: total rows; passes when within [``min``, ``max``]
      (either bound optional).

    Empty input: ratio metrics are null (avg over zero rows) and those
    constraints FAIL (null >= x is null -> coalesced to false) — an
    empty batch should never silently pass a domain check.
    """
    metric_exprs = []
    rows = []
    for i, c in enumerate(constraints):
        kind = c["kind"]
        mname = f"m{i}"
        col = F.col(c["column"]) if "column" in c else None
        if kind == "completeness":
            metric_exprs.append(
                F.avg(col.isNotNull().cast("double")).alias(mname)
            )
            passed = F.col(mname) >= float(c.get("min_ratio", 1.0))
        elif kind == "distinctness":
            metric_exprs.append(
                (
                    F.countDistinct(col).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias(mname)
            )
            passed = F.col(mname) >= float(c.get("min_ratio", 1.0))
        elif kind == "min":
            metric_exprs.append(F.min(col).cast("double").alias(mname))
            passed = F.col(mname) >= float(c["bound"])
        elif kind == "max":
            metric_exprs.append(F.max(col).cast("double").alias(mname))
            passed = F.col(mname) <= float(c["bound"])
        elif kind == "pattern":
            flag = F.when(col.isNull(), F.lit(None)).otherwise(
                col.rlike(c["pattern"]).cast("double")
            )
            metric_exprs.append(_ratio_over_nonnull(flag).alias(mname))
            passed = F.col(mname) >= float(c.get("min_ratio", 1.0))
        elif kind == "in_set":
            flag = F.when(col.isNull(), F.lit(None)).otherwise(
                col.isin(*c["values"]).cast("double")
            )
            metric_exprs.append(_ratio_over_nonnull(flag).alias(mname))
            passed = F.col(mname) >= float(c.get("min_ratio", 1.0))
        elif kind == "row_count":
            metric_exprs.append(F.count(F.lit(1)).cast("double").alias(mname))
            passed = F.lit(True)
            if "min" in c:
                passed = passed & (F.col(mname) >= float(c["min"]))
            if "max" in c:
                passed = passed & (F.col(mname) <= float(c["max"]))
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        rows.append(
            F.struct(
                F.lit(c["name"]).alias("name"),
                F.lit(kind).alias("kind"),
                F.lit(c.get("column")).cast("string").alias("col"),
                F.col(mname).alias("metric"),
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    one = df.agg(*metric_exprs)
    return one.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


def containment_check(
    df: DataFrame,
    column: str,
    ref: DataFrame,
    ref_column: str,
    name: str,
    min_ratio: float = 1.0,
) -> DataFrame:
    """Referential containment: share of NON-NULL ``df.column`` values
    present in ``ref.ref_column`` (the Deequ ``isContainedIn`` /
    foreign-key check). Same output schema as ``check_constraints`` so
    results union into one report.

    Plan: equi-join against the DISTINCT parent keys — the parent side
    collapses to its key cardinality before the join, so a 10^12-row
    child joins a key set, not the parent table; AQE broadcasts it when
    small. Null child values are excluded from the ratio (completeness
    is a separate check).
    """
    keys = ref.select(F.col(ref_column).alias("__ck")).distinct()
    joined = df.select(F.col(column).alias("__cv")).join(
        keys, F.col("__cv") == F.col("__ck"), "left"
    )
    flag = F.when(F.col("__cv").isNull(), F.lit(None)).otherwise(
        F.col("__ck").isNotNull().cast("double")
    )
    return joined.agg(_ratio_over_nonnull(flag).alias("metric")).select(
        F.lit(name).alias("name"),
        F.lit("containment").alias("kind"),
        F.lit(column).alias("col"),
        F.col("metric"),
        F.coalesce(F.col("metric") >= min_ratio, F.lit(False)).alias("passed"),
    )
