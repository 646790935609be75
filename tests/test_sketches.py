"""Sketch operators: HLL cardinality, count-min, Bloom pruning.

Accuracy bounds are checked against exact answers on the sf0.001
fixtures; merge/monotonicity properties are structural (must hold for
any input); determinism is cross-checked against DuckDB running the
same generated SQL fragments (the oracle-parity mechanism the gate
queries rely on).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from disq_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_hll_accuracy_p12(spark, orders):
    exact = orders.select("o_custkey").distinct().count()
    est = SK.hll_distinct(orders, "o_custkey", p=12).collect()[0]["est_distinct"]
    # std err = 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(est - exact) / exact < 0.085, (est, exact)


def test_hll_registers_merge(spark, orders):
    """Sketch of the union == max-merge of shard sketches."""
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    full = SK.hll_registers(orders, "o_custkey", p=8)
    merged = (
        SK.hll_registers(lo, "o_custkey", p=8)
        .union(SK.hll_registers(hi, "o_custkey", p=8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_matches_duckdb_oracle(spark, orders):
    """Raw-path estimate is bit-identical to DuckDB evaluating the same
    generated fragments — the property the gate queries depend on."""
    p = 8
    bd = p // 4
    est_spark = SK.hll_distinct(
        orders, "o_custkey", p=p, correct_small=False
    ).collect()[0]["est_distinct"]

    empty_col, est_expr = SK.hll_estimate_sql(p, correct_small=False)
    m = 1 << p
    sql = f"""
    WITH h AS (
      SELECT md5('' || o_custkey) AS __h FROM read_parquet('{SF}/orders.parquet')
    ),
    reg AS (
      SELECT {SK.hex2int_sql('__h', bd)} AS bucket,
             max({SK.rho_sql(f"substring(__h, {bd + 1}, {SK.RHO_DIGITS})")}) AS max_rho
      FROM h GROUP BY 1
    ),
    agg AS (
      SELECT CAST({m} - count(*) AS BIGINT) AS __empty,
             CAST(sum(cast(pow(2, {SK.RHO_MAX} - max_rho) as bigint)) AS BIGINT) AS __occ
      FROM reg
    )
    SELECT {est_expr} AS est FROM agg
    """
    est_duck = duckdb.sql(sql).fetchone()[0]
    assert est_spark == est_duck


def test_hll_partial_aggregation_plan(spark, orders):
    """The register build must partial-aggregate map-side: shuffle volume
    is register-count, not row-count."""
    plan = SK.hll_registers(orders, "o_custkey", p=12)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_countmin_overcounts_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")).filter(
        F.length("tok") > 0
    )
    exact = toks.groupBy("tok").count().orderBy(F.desc("count"), "tok").limit(10)
    cm = SK.countmin_table(toks, "tok", depth=4, width=256)
    est = SK.countmin_lookup(cm, exact.select("tok"), "tok", depth=4, width=256)
    joined = exact.join(est, "tok").collect()
    assert len(joined) == 10
    for r in joined:
        assert r["cm_est"] >= r["count"], r  # never undercounts
    # top token in a 256-wide sketch over a small stream: collisions add
    # at most the residual mass; sanity-bound the over-count factor
    top = max(joined, key=lambda r: r["count"])
    assert top["cm_est"] <= top["count"] * 3


def test_bloom_no_false_negatives_and_prunes(spark, orders):
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bitmap = SK.bloom_bitmap(urgent, "o_orderkey", m_bits=16384, k=3)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pruned = SK.bloom_prune(li, "l_orderkey", bitmap, m_bits=16384, k=3)
    # no false negatives: the exact join result is unchanged
    exact = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
    after = pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey).count()
    assert exact == after
    # and it actually prunes: URGENT is ~20% of orders, so the pass-set
    # (true keys + false positives) must be well under the full table
    total = li.count()
    kept = pruned.count()
    assert kept < total * 0.6, (kept, total)
    assert kept >= exact


# ---------------------------------------------------------------------------
# sampling / sharding / packing (operators/sampling.py)
# ---------------------------------------------------------------------------


def test_hash_sample_partition_invariant(spark, orders):
    """The selected set is identical under any partitioning — the
    property Spark's RNG-based df.sample lacks."""
    from disq_spark.operators import sampling as SP

    a = sorted(r[0] for r in SP.hash_sample(orders, 0.2, "o_orderkey").select("o_orderkey").collect())
    b = sorted(
        r[0]
        for r in SP.hash_sample(orders.repartition(13), 0.2, "o_orderkey")
        .select("o_orderkey")
        .collect()
    )
    assert a == b
    n = orders.count()
    assert 0.15 * n < len(a) < 0.25 * n  # rate lands near 20%


def test_hash_sample_seed_decorrelates(spark, orders):
    from disq_spark.operators import sampling as SP

    a = set(r[0] for r in SP.hash_sample(orders, 0.2, "o_orderkey", seed="x").select("o_orderkey").collect())
    b = set(r[0] for r in SP.hash_sample(orders, 0.2, "o_orderkey", seed="y").select("o_orderkey").collect())
    n = orders.count()
    overlap = len(a & b)
    # independent 20% samples overlap ~4%; same-seed would be 100%
    assert overlap < 0.1 * n


def test_assign_shards_balanced_and_stable(spark, orders):
    from disq_spark.operators import sampling as SP

    s = SP.assign_shards(orders, 16, "o_orderkey")
    counts = {r["shard"]: r["n"] for r in s.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(16))
    n = orders.count()
    for c in counts.values():
        assert abs(c - n / 16) < n / 16 * 0.5  # within 50% of even


def test_pack_sequences_invariants(spark):
    """Offsets tile each shard's tape exactly: sorted offsets are the
    prefix sums of token counts, and pack_id = offset div budget."""
    from disq_spark.operators import sampling as SP

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = docs.withColumn("toks", F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long"))
    p = SP.pack_sequences(d, 128, "toks", "doc_id", n_shards=4).collect()
    by_shard = {}
    for r in p:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["tape_offset"])
        cum = 0
        for r in rows:
            assert r["tape_offset"] == cum
            assert r["pack_id"] == cum // 128
            cum += r["toks"]


def test_profile_table_accuracy(spark, orders):
    """Linear-counted profile reads right on both low- and
    high-cardinality columns; null counts and min/max are exact."""
    got = {
        r["col_name"]: r
        for r in SK.profile_table(
            orders, ["o_orderkey", "o_orderpriority", "o_custkey"]
        ).collect()
    }
    n = orders.count()
    exact = {
        c: orders.select(c).distinct().count()
        for c in ("o_orderkey", "o_orderpriority", "o_custkey")
    }
    for c, r in got.items():
        assert r["n_rows"] == n
        assert r["n_null"] == 0
        assert abs(r["n_distinct_est"] - exact[c]) / exact[c] < 0.15, (c, r)
    assert got["o_orderpriority"]["min_str"] == "1-URGENT"
    assert got["o_orderpriority"]["max_str"] == "5-LOW"
