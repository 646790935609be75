"""Link-graph analytics: PageRank power iteration.

Crawl pipelines rank hosts/pages by link structure (quality priors for
sampling weights; Common Crawl publishes exactly this as its host-level
ranking). PageRank is THE canonical iterative DataFrame workload:

    rank_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} rank_t(u)/outdeg(u)
                                    + dangling_mass_t / N )

Plan shape per iteration: one join of the rank table against the edge
list keyed on src (shuffle on node id — unavoidable; at scale you
pre-partition BOTH by id so iterations reuse the exchange), one
aggregation keyed on dst, plus the dangling-mass scalar folded INTO
the plan as a broadcast single-row crossJoin (the lm.py KL-drift
pattern) — no per-iteration driver ``collect()``, so the whole run is
one submitted action plus the small async broadcast-exchange jobs,
instead of a full driver round-trip (with lineage recomputation since
the last checkpoint) every iteration. ``localCheckpoint`` every few
rounds truncates the growing lineage — the same iterative-loop hygiene
as label propagation in dedup.

Determinism: fixed iteration count (no convergence test — a float
threshold is partition-order sensitive), float64 arithmetic, final
rounding chosen by the caller. The DuckDB oracle unrolls the identical
recurrence as chained CTEs, so the gate hash-matches at the rounded
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 15,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations over the distinct
    edge list. Nodes = union of sources and destinations; parallel
    edges collapse (distinct) so outdeg counts distinct targets.

    ``checkpoint_every=1`` is deliberate: each iteration references the
    previous ranks subtree TWICE (contribution join + dangling-mass
    aggregate), so the un-truncated logical plan DOUBLES per iteration —
    2^k subtree copies between checkpoints, and Catalyst analysis time
    grows with it (r8 advice). The checkpoints are lazy
    (``eager=False``), so per-iteration truncation costs one small
    plan->RDD conversion at build time, not an action; raising
    ``checkpoint_every`` above ~3 buys nothing and risks exponential
    analysis blow-up."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_total = nodes.count()
    if n_total == 0:
        # empty edge list: empty result with the right schema, not a
        # division by zero buried in an executor task
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("u").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    base = (1.0 - damping) / n_total
    for i in range(iters):
        # dangling nodes (no out-edges) spread their whole mass uniformly;
        # the scalar stays IN the plan as a broadcast one-row aggregate
        # (same double-precision ops as the former driver-side literal)
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["u"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contrib = (
            ranks.join(e, ranks["node"] == e["u"])
            .join(outdeg, "u")
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("__dang") / F.lit(float(n_total))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_sql_ctes(
    edges_cte: str, damping: float = 0.85, iters: int = 15
) -> str:
    """DuckDB CTE chain mirroring pagerank() exactly: expects a CTE
    named ``edges(u, v)`` (already distinct) defined by ``edges_cte``;
    produces final CTE ``pr_final(node, rank)``."""
    d = float(damping)
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and an
    # unrolled recurrence where pr_{i+1} references pr_i three times
    # expands EXPONENTIALLY (observed: "Too many open files" from
    # thousands of parquet re-opens at 12 iterations)
    parts = [
        edges_cte.replace("edges AS (", "edges AS MATERIALIZED (", 1),
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM edges UNION SELECT DISTINCT v FROM edges)",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes)",
        "outdeg AS MATERIALIZED (SELECT u, count(*) AS deg FROM edges GROUP BY u)",
        "pr_0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"pr_{i}", f"pr_{i + 1}"
        parts.append(
            f"""dang_{i} AS MATERIALIZED (
  SELECT coalesce(sum(rank), 0.0) AS m
  FROM {prev} p LEFT JOIN outdeg o ON p.node = o.u WHERE o.u IS NULL
),
con_{i} AS MATERIALIZED (
  SELECT e.v AS node, sum(p.rank / o.deg) AS inflow
  FROM {prev} p JOIN edges e ON p.node = e.u JOIN outdeg o ON e.u = o.u
  GROUP BY e.v
),
{cur} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (coalesce(c.inflow, 0.0) + (SELECT m FROM dang_{i}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN con_{i} c ON n.node = c.node
)"""
        )
    parts.append(f"pr_final AS (SELECT node, rank FROM pr_{iters})")
    return ",\n".join(parts)
