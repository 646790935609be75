"""Z-order layout: Morton-key arithmetic + the pruning benefit it buys."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from disq_spark.operators.zorder import interleave_sql, z_value, zorder_cluster
from disq_spark.queries.tables import load

SF = "/root/testdata/sf0.001"


def test_interleave_known_values(spark):
    """3-bit Morton: x=0b101, y=0b011 -> z = 0b100111 (x in odd slots)."""
    df = spark.createDataFrame([(5, 3)], "x long, y long")
    z = df.selectExpr(f"{interleave_sql(['x', 'y'], 3)} AS z").first().z
    assert z == 0b100111


def test_z_value_matches_manual_interleave(spark):
    li = load(spark, SF, "lineitem").select("l_partkey", "l_suppkey").limit(200)
    got = z_value(li, ["l_partkey", "l_suppkey"], 8).collect()
    mn_p, mx_p, mn_s, mx_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()

    def quant(v, mn, mx):
        return (v - mn) * 255 // max(mx - mn, 1)

    for r in got:
        qp, qs = quant(r.l_partkey, mn_p, mx_p), quant(r.l_suppkey, mn_s, mx_s)
        want = 0
        for i in range(8):
            want |= ((qp >> i) & 1) << (2 * i + 1)
            want |= ((qs >> i) & 1) << (2 * i)
        assert r["__z"] == want


def test_z_value_rejects_overflowing_range(spark):
    """A column range wide enough that (range * 255) wraps int64 must
    raise, not silently produce wrapped z-values (DuckDB would raise on
    the same SQL, so a silent wrap is also a cross-engine divergence)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        SparkRuntimeException,
    )

    wide = spark.createDataFrame(
        [(0, 0), (1 << 62, 1)], "x long, y long"
    )
    # ANSI on: the multiply itself raises ArithmeticException; ANSI off:
    # the z_value assert_true guard raises SparkRuntimeException. Either
    # way the wrap can never be silent.
    with pytest.raises((ArithmeticException, SparkRuntimeException, Py4JJavaError)):
        z_value(wide, ["x", "y"], 8).collect()
    # in-range data still works with the guard in place
    ok = spark.createDataFrame([(0, 0), (100, 7)], "x long, y long")
    assert z_value(ok, ["x", "y"], 8).count() == 2


def _row_groups_matching(path, p_lo, p_hi, s_lo, s_hi):
    """Row groups whose min/max stats intersect the box (what a reader
    must scan); fewer = better layout."""
    total, hit = 0, 0
    import glob
    import os

    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sp = g.column(names["l_partkey"]).statistics
            ss = g.column(names["l_suppkey"]).statistics
            total += 1
            if sp.min <= p_hi and sp.max >= p_lo and ss.min <= s_hi and ss.max >= s_lo:
                hit += 1
    return hit, total


def test_zorder_layout_prunes_box_predicates(spark, tmp_path):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    natural = str(tmp_path / "natural")
    zordered = str(tmp_path / "zordered")
    li.repartition(8).write.parquet(natural)
    zorder_cluster(li, ["l_partkey", "l_suppkey"], n_partitions=8).write.parquet(
        zordered
    )

    # a small box in both dimensions
    p_lo, p_hi = 10, 30
    s_lo, s_hi = 1, 3
    hit_n, tot_n = _row_groups_matching(natural, p_lo, p_hi, s_lo, s_hi)
    hit_z, tot_z = _row_groups_matching(zordered, p_lo, p_hi, s_lo, s_hi)
    assert tot_n >= 8 and tot_z >= 8
    # natural random layout: every group spans the full key range
    assert hit_n == tot_n
    # z-order: the box touches a strict subset of groups
    assert hit_z < tot_z

    # layout must not change content
    back = spark.read.parquet(zordered)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_orderkey")).first()[0] == li.agg(
        F.sum("l_orderkey")
    ).first()[0]
