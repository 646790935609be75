"""Corpus-fit n-gram language-model scoring — the CCNet-style
perplexity filter (Wenzek et al. 2020 fit a KenLM and drop the
worst-perplexity tail; the distributed analog fits the LM on the corpus
itself with one aggregation pass per order).

``bigram_perplexity`` fits a conditional bigram LM with add-k smoothing
and scores every document:

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 .) + k * V)

where c(w1 .) is w1's count as a bigram HISTORY (occurrences in
non-final positions — exactly sum_w2 c(w1 w2), so the conditional
distribution normalizes) and V is the corpus vocabulary size. Document
score = exp(mean negative log-probability over its bigrams), the
standard perplexity; single-token and empty documents carry no bigrams
and surface with null perplexity rather than a fabricated score.

Scale shape: two corpus aggregations (bigram counts, history counts —
both one explode + partial-agg groupBy, shuffle rows ~= distinct
n-grams, NOT corpus tokens), V and the corpus total as broadcast
scalars, then the scoring pass joins the doc bigram stream against the
two count tables on their natural string keys — plain hash joins that
AQE broadcasts when the vocab fits and shuffles when it doesn't. No
driver-side state, no iteration: at 100 TB the LM "model" IS the two
count DataFrames (millions of rows), exactly the resting state you
want for reuse across scoring runs (persist them and ``score_bigrams``
is a pure join job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from disq_spark.functions.text import tokens


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence (with multiplicity)."""
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    n = F.size("t")
    pairs = F.arrays_zip(
        F.slice("t", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice("t", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return t.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_lm_fit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts(w1, w2, c12), history_counts(w1, c1),
    scalars(vocab_v)) fitted on the corpus."""
    bg = _doc_bigrams(df, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    return c12, c1, vocab


def bigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    round_to: int = 3,
) -> DataFrame:
    """(id, n_bigrams, avg_nll, perplexity) per document, scored by the
    corpus-fit smoothed bigram LM. Documents with < 2 tokens emit
    n_bigrams = 0 and null scores."""
    c12, c1, vocab = bigram_lm_fit(df, text_col, id_col)
    bg = _doc_bigrams(df, text_col, id_col)
    scored = (
        bg.join(c12, ["w1", "w2"])  # every doc bigram exists in the fit
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log(
                (F.col("c12") + F.lit(add_k))
                / (F.col("c1") + F.lit(add_k) * F.col("v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), round_to).alias("perplexity"),
    )
    # left join back so bigram-less docs appear with nulls
    ids = df.select(id_col).distinct()
    return (
        ids.join(per_doc, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
    )
