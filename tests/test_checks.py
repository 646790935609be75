"""Unit tests for the Deequ-style constraint suite (operators/checks.py)."""

from disq_spark.operators.checks import check_constraints, containment_check


def _report(df, constraints):
    return {
        r["name"]: (r["metric"], r["passed"])
        for r in check_constraints(df, constraints).collect()
    }


def test_check_constraints_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "A-x", 5.0), (2, "B-y", -1.0), (2, None, 3.0)],
        ["k", "s", "v"],
    )
    got = _report(
        df,
        [
            {"name": "k_complete", "kind": "completeness", "column": "k"},
            {"name": "s_complete", "kind": "completeness", "column": "s",
             "min_ratio": 0.9},
            {"name": "k_distinct", "kind": "distinctness", "column": "k"},
            {"name": "v_min", "kind": "min", "column": "v", "bound": 0.0},
            {"name": "v_max", "kind": "max", "column": "v", "bound": 10.0},
            {"name": "s_pattern", "kind": "pattern", "column": "s",
             "pattern": "^[A-Z]-"},
            {"name": "s_domain", "kind": "in_set", "column": "s",
             "values": ["A-x", "B-y"], "min_ratio": 1.0},
            {"name": "rows", "kind": "row_count", "min": 3, "max": 3},
        ],
    )
    assert got["k_complete"] == (1.0, True)
    # 2/3 non-null < 0.9 -> fail, metric still reported
    assert round(got["s_complete"][0], 6) == round(2 / 3, 6)
    assert got["s_complete"][1] is False
    # distinct k = 2 of 3 rows
    assert round(got["k_distinct"][0], 6) == round(2 / 3, 6)
    assert got["k_distinct"][1] is False
    assert got["v_min"] == (-1.0, False)
    assert got["v_max"] == (5.0, True)
    # pattern/in_set ratios are over NON-NULL values only (2 of them)
    assert got["s_pattern"] == (1.0, True)
    assert got["s_domain"] == (1.0, True)
    assert got["rows"] == (3.0, True)


def test_check_constraints_empty_input_fails_ratio_checks(spark):
    df = spark.createDataFrame([], "k long, s string")
    got = _report(
        df,
        [
            {"name": "k_complete", "kind": "completeness", "column": "k"},
            {"name": "s_pattern", "kind": "pattern", "column": "s",
             "pattern": "^x"},
            {"name": "rows", "kind": "row_count", "min": 1},
        ],
    )
    # null metrics must coalesce to FAIL, never silently pass
    assert got["k_complete"][1] is False
    assert got["s_pattern"][1] is False
    assert got["rows"] == (0.0, False)


def test_containment_check_nulls_and_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = containment_check(
        child, "fk", parent, "pk", name="fk_in_pk", min_ratio=1.0
    ).collect()[0]
    # 2 of 3 non-null children contained; null excluded from the ratio
    assert round(row["metric"], 6) == round(2 / 3, 6)
    assert row["passed"] is False
    assert row["kind"] == "containment"


def test_check_constraints_single_scan(spark):
    """All non-containment constraints ride ONE aggregate over the input:
    the optimized plan must contain exactly one scan of the table."""
    df = spark.range(100).selectExpr("id", "cast(id % 7 as double) as v")
    rep = check_constraints(
        df,
        [
            {"name": "a", "kind": "completeness", "column": "id"},
            {"name": "b", "kind": "min", "column": "v", "bound": 0.0},
            {"name": "c", "kind": "max", "column": "v", "bound": 6.0},
            {"name": "d", "kind": "row_count", "min": 1},
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1
