"""BM25 relevance scoring over the ``documents`` table.

Full-corpus BM25 (Okapi, Lucene idf variant) expressed as pure
DataFrame operations — no Python in the hot path, every stage
partial-aggregates before its shuffle:

- per-(doc, term) term frequencies: one explode + one groupBy on
  (doc_id, token) restricted to the query terms *before* the shuffle
  (the filter makes the exploded relation O(|matches|), not O(corpus
  tokens));
- document frequency per term: a second aggregation over the tf
  relation (k rows, k = |query terms|) — broadcast back;
- corpus stats (N, avgdl): a scalar aggregate, broadcast via crossJoin.

At 100 TB this is one corpus scan + one shuffle keyed on (doc_id,
token) whose size is bounded by the number of query-term occurrences;
the dimension sides (term df, corpus stats) are bytes. Scores are
summed over at most |query terms| doubles and rounded, so the DuckDB
oracle hash-matches despite engine summation order.

No reference analog: disq-bio/disq has no text-ranking surface; this
is part of the training-data-pipeline extension (relevance filtering /
quality-targeted selection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from disq_spark.functions import text as TX


def bm25(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Score every document containing >= 1 query term.

    Output: (doc_id, n_matched_terms, score) — compose with top-k /
    threshold filters downstream; no global sort is imposed here.
    """
    terms = sorted(set(query_terms))
    toks = TX.tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("toks"),
    )

    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(list(terms)))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )

    df_t = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched_terms"),
            F.round(F.sum("term_score"), round_to).alias("score"),
        )
        .orderBy("doc_id")
    )
