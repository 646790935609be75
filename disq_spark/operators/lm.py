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


def collocations_pmi(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` collocations by pointwise mutual information — the
    phrase-detection pass (word2vec-phrases / NLTK collocations) a
    corpus-analysis tier runs before tokenizer training.

    PMI over the corpus BIGRAM distribution: with c12 = count(w1 w2),
    h1 = count of w1 in first position, t2 = count of w2 in second
    position, N = total bigram occurrences,

        lift = c12 * N / (h1 * t2)        pmi = ln(lift)

    Pairs below ``min_count`` are dropped (rare-pair PMI explodes — the
    standard guard). Returns (w1, w2, c12, lift, pmi), ordered by
    (lift desc, w1, w2).

    Determinism: lift is computed as an INTEGER-product ratio
    (c12*N)/(h1*t2) — both products stay in int64 and their double
    quotient is correctly rounded, so any engine produces the identical
    double and the identical ordering; only the final ln() is rounded
    for display. (At extreme scale c12*N can overflow int64 once
    N > ~9e18/c12; flip the expression to (c12/h1)*(N/t2) there and
    accept last-ulp ordering jitter.)

    Scale shape: one explode into bigram rows, three partial-agg
    groupBys (pair/head/tail counts — shuffle rows ~= distinct grams,
    not corpus tokens), N as a broadcast scalar, two joins keyed by
    single words (AQE broadcasts the marginal tables when the vocab
    fits), one top-k sort of the filtered pair table.
    """
    bg = _doc_bigrams(df, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    h1 = bg.groupBy("w1").agg(F.count("*").alias("h1"))
    t2 = bg.groupBy("w2").agg(F.count("*").alias("t2"))
    n = bg.agg(F.count("*").alias("n"))
    lift = (F.col("c12") * F.col("n")).cast("double") / (
        F.col("h1") * F.col("t2")
    ).cast("double")
    return (
        c12.filter(F.col("c12") >= min_count)
        .join(h1, "w1")
        .join(t2, "w2")
        .crossJoin(F.broadcast(n))
        .withColumn("lift", lift)
        .select(
            "w1",
            "w2",
            "c12",
            F.round("lift", 6).alias("lift_r"),
            F.round(F.log("lift"), 6).alias("pmi"),
            "lift",
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(top_k)
        .drop("lift")
    )


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


def corpus_kl_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Distribution drift per group: KL(group || corpus) over unigram
    token distributions with add-k smoothing — the drift monitor a
    curation pipeline runs when a new dump/source lands (is this slice
    statistically like the corpus it joins?), and the signal behind
    mixture re-weighting decisions.

    For each group g and token w over the CORPUS vocabulary V:

        p_g(w) = (c_gw + k) / (n_g + k|V|)
        p_c(w) = (c_w  + k) / (n_c + k|V|)
        KL(g)  = sum_w p_g(w) * ln(p_g(w) / p_c(w))

    Tokens absent from the group still contribute (c_gw = 0) — dropping
    them would understate drift for narrow slices, so the sum runs over
    the full group x vocab grid.

    Returns (group_col, n_tokens, vocab_used, kl), kl in nats >= 0.

    Scale shape: two partial-agg token counts (corpus + per-group;
    shuffle rows ~= |V|, not corpus tokens), group totals as a small
    table, then the grid join |V| x #groups — #groups is a source enum,
    not data-sized, so the grid stays ~|V| rows per group and the final
    sum is one more partial agg. No collect, no Python.
    """
    tok = df.select(F.col(group_col).alias("g"), F.explode(tokens(F.col(text_col))).alias("tok"))
    cw = tok.groupBy("tok").agg(F.count("*").alias("cw"))
    cgw = tok.groupBy("g", "tok").agg(F.count("*").alias("cgw"))
    ng = tok.groupBy("g").agg(F.count("*").alias("ng"))
    scalars = cw.agg(
        F.sum("cw").alias("nc"), F.count("*").alias("v")
    )
    grid = (
        cw.crossJoin(F.broadcast(ng))
        .join(cgw, ["g", "tok"], "left")
        .crossJoin(F.broadcast(scalars))
        .withColumn("cgw", F.coalesce("cgw", F.lit(0)))
    )
    pg = (F.col("cgw") + F.lit(add_k)) / (
        F.col("ng") + F.lit(add_k) * F.col("v")
    )
    pc = (F.col("cw") + F.lit(add_k)) / (
        F.col("nc") + F.lit(add_k) * F.col("v")
    )
    per_group = grid.withColumn("term", pg * F.log(pg / pc)).groupBy("g").agg(
        F.sum("term").alias("kl")
    )
    used = cgw.groupBy("g").agg(F.count("*").alias("vocab_used"))
    return (
        ng.join(used, "g")
        .join(per_group, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("ng").alias("n_tokens"),
            "vocab_used",
            F.col("kl"),
        )
    )
