"""Hashed linear text-classifier INFERENCE — the fastText-shaped
quality/toxicity scorer every large filtering pipeline runs (a linear
head over hashed bag-of-tokens features; training happens offline on
labeled samples, scoring happens over the full 100 TB corpus — this is
the scoring path).

Pure column expressions: token -> md5-derived bucket (the repo's
standard engine-portable hash, ``dedup.gram_hash``), bucket -> weight
via an array literal (a few-KB plan constant; a 50k-bucket production
head would broadcast-join a weights table instead — same semantics,
the gate pins the arithmetic), score = sigmoid(bias + mean of token
weights). DuckDB mirrors every step, so the gate hash-matches at the
output rounding.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from disq_spark.functions.text import tokens
from disq_spark.operators.dedup import gram_hash


def deterministic_weights(n_buckets: int, label: str = "disq-qw") -> list[float]:
    """Reproducible stand-in weight vector in [-1, 1) (gates/tests; a
    real deployment loads trained weights)."""
    out = []
    for i in range(n_buckets):
        h = int(hashlib.md5(f"{label}-{i}".encode()).hexdigest()[:8], 16)
        out.append(round(h / float(1 << 31) - 1.0, 6))
    return out


def hashed_linear_score(
    col, weights: list[float], bias: float = 0.0, round_to: int = 6
) -> Column:
    """sigmoid(bias + mean_t weights[gram_hash(t) % n]) over whitespace
    tokens of the normalized text; empty text scores sigmoid(bias)."""
    n = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = tokens(col)
    per_tok = F.transform(
        toks, lambda t: F.element_at(warr, (gram_hash(t) % n + 1).cast("int"))
    )
    mean_w = F.when(
        F.size(toks) > 0,
        F.aggregate(per_tok, F.lit(0.0), lambda acc, x: acc + x) / F.size(toks),
    ).otherwise(F.lit(0.0))
    z = F.lit(float(bias)) + mean_w
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)


def score_hashed_linear(
    df,
    weights: list[float],
    text_col: str = "text",
    bias: float = 0.0,
    out_col: str = "score",
    round_to: int = 6,
    method: str = "auto",
):
    """DataFrame form with size-based dispatch (operators/dispatch):
    the pure-column HOF path runs the per-token fold INTERPRETED on the
    JVM (measured sf5, 250k docs x 64 buckets: 75.8 s), so at scale the
    scoring runs as an Arrow kernel — md5 per distinct token with a
    batch memo (Zipf), left-to-right accumulation in the same order as
    the JVM fold, same sigmoid/rounding. Both paths agree at round_to
    (pinned by test)."""
    from disq_spark.operators.dispatch import resolve_method

    if resolve_method(method, df) == "sql":
        return df.withColumn(
            out_col, hashed_linear_score(F.col(text_col), weights, bias, round_to)
        )

    import hashlib as _hashlib
    import re as _re

    n = len(weights)
    w = [float(x) for x in weights]
    b = float(bias)
    cols = list(df.columns)
    if out_col not in cols:
        cols.append(out_col)
    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" if c in df.columns else f"{c} double"
        for c in cols
    )

    def kernel(batches):
        import math

        memo: dict[str, float] = {}

        def tok_weight(t: str) -> float:
            v = memo.get(t)
            if v is None:
                h = int(_hashlib.md5(t.encode()).hexdigest()[:15], 16)
                v = w[h % n]
                memo[t] = v
            return v

        for pdf in batches:
            scores = []
            for text in pdf[text_col]:
                # null text scores like empty text — sigmoid(bias) —
                # exactly as the SQL path's otherwise(0.0) branch does
                # re.ASCII: Java regex \s (the SQL path's tokens()) is
                # ASCII-only; Python's default \s is Unicode-wide and
                # would split on U+00A0 etc., diverging from the SQL
                # path on non-ASCII whitespace
                norm = (
                    _re.sub(r"\s+", " ", text.lower(), flags=_re.ASCII).strip()
                    if isinstance(text, str)
                    else ""
                )
                toks = norm.split(" ") if norm else []
                acc = 0.0
                for t in toks:  # left-to-right like the JVM fold
                    acc += tok_weight(t)
                z = b + (acc / len(toks) if toks else 0.0)
                s = 1.0 / (1.0 + math.exp(-z))
                # half-up like Spark's F.round (Python round() is banker's)
                scale = 10.0 ** round_to
                scores.append(math.floor(s * scale + 0.5) / scale)
            pdf = pdf.copy()
            pdf[out_col] = scores
            yield pdf[cols]

    return df.mapInPandas(kernel, schema)


def hashed_linear_score_sql(
    expr_norm_tokens: str, weights: list[float], bias: float = 0.0, round_to: int = 6
) -> str:
    """DuckDB mirror. ``expr_norm_tokens`` must be the token-list
    expression (the caller's _TOKS equivalent)."""
    n = len(weights)
    wlist = "[" + ", ".join(repr(float(w)) for w in weights) + "]"
    bucket = (
        "(CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % " + str(n) + " + 1)"
    )
    mean_w = (
        f"(CASE WHEN len({expr_norm_tokens}) > 0 THEN "
        f"list_sum(list_transform({expr_norm_tokens}, t -> ({wlist})[{bucket}]))"
        f" / len({expr_norm_tokens}) ELSE 0.0 END)"
    )
    return f"round(1.0 / (1.0 + exp(-({float(bias)} + {mean_w}))), {round_to})"


def train_hashed_logreg(
    df,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    round_w: int = 6,
) -> tuple[list[float], float]:
    """TRAIN the hashed linear head by full-batch gradient descent —
    closing the loop on ``hashed_linear_score`` (inference): same model
    (score = bias + mean of bucket weights over tokens, sigmoid link),
    log-loss gradient, zero init.

        p_d    = sigmoid(bias + sum_b cf_db * w_b)
        grad_b = sum_d (p_d - y_d) * cf_db / N      (cf_db = cnt/len_d)
        w_b   <- round(w_b - lr * grad_b, round_w)

    Returns (weights, bias). The per-iteration ROUNDING is the same
    cross-engine determinism device k-means and PageRank use: both
    engines round the updated parameters each step, so last-ulp
    summation differences cannot compound across iterations and the
    unrolled-CTE oracle (``train_hashed_logreg_sql``) stays hash-exact.

    Scale shape: the feature table (doc, bucket, cf) is built once and
    persisted; each iteration is two partial-agg shuffles (per-doc score,
    per-bucket gradient) plus an O(n_buckets) driver collect — the
    k-means pattern (model state is bounded, data never moves to the
    driver). Empty/token-less docs contribute to the bias gradient only.
    """
    from disq_spark.operators.dedup import gram_hash

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("d"),
        toks.alias("toks"),
        F.col(label_col).cast("double").alias("y"),
    )
    cf = (
        base.select("d", F.size("toks").alias("nd"), F.explode("toks").alias("t"))
        .groupBy("d", (gram_hash(F.col("t")) % n_buckets).alias("bucket"))
        .agg((F.count("*") / F.min("nd")).alias("cf"))
        .persist()
    )
    docs = base.select("d", "y").persist()
    try:
        n_docs = float(docs.count())
        w = [0.0] * n_buckets
        b = 0.0
        for _ in range(iters):
            warr = F.array(*[F.lit(float(x)) for x in w])
            sc = cf.groupBy("d").agg(
                F.sum(
                    F.col("cf")
                    * F.element_at(warr, (F.col("bucket") + 1).cast("int"))
                ).alias("s")
            )
            resid = docs.join(sc, "d", "left").select(
                "d",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.lit(b) + F.coalesce(F.col("s"), F.lit(0.0))))
                    )
                    - F.col("y")
                ).alias("r"),
            )
            grows = (
                cf.join(resid, "d")
                .groupBy("bucket")
                .agg((F.sum(F.col("r") * F.col("cf")) / n_docs).alias("g"))
                .collect()
            )
            g = {int(r["bucket"]): float(r["g"]) for r in grows}
            gb = float(resid.agg(F.sum("r")).collect()[0][0]) / n_docs
            # sign-aware half-away-from-zero to match DuckDB/Spark round()
            # (Python round() is banker's: a dyadic halfway update such as
            # 2^-7 = 0.0078125 would round differently and compound)
            scale = 10.0 ** round_w
            _r = lambda x: math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale
            w = [_r(w[j] - lr * g.get(j, 0.0)) for j in range(n_buckets)]
            b = _r(b - lr * gb)
        return w, b
    finally:
        cf.unpersist()
        docs.unpersist()


def train_hashed_logreg_sql(
    label_expr: str,
    toks_expr: str,
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    round_w: int = 6,
) -> str:
    """DuckDB mirror of ``train_hashed_logreg`` as one unrolled-CTE
    query over ``documents`` returning (bucket, weight) with the bias at
    bucket = -1 (the PageRank oracle pattern: the SAME recurrence, each
    iteration rounded identically)."""
    ctes = [
        f"base AS (SELECT doc_id AS d, {toks_expr} AS toks, "
        f"CAST({label_expr} AS DOUBLE) AS y FROM documents)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base)",
        "tok AS (SELECT d, len(toks) AS nd, unnest(toks) AS t FROM base)",
        (
            "cf AS (SELECT d, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) "
            f"% {n_buckets} AS bucket, "
            "CAST(count(*) AS DOUBLE) / CAST(min(nd) AS DOUBLE) AS cf "
            "FROM tok GROUP BY 1, 2)"
        ),
        f"w0 AS (SELECT i AS bucket, 0.0 AS w FROM range({n_buckets}) u(i))",
        "b0 AS (SELECT 0.0 AS b)",
    ]
    for t in range(iters):
        ctes.append(
            f"s{t} AS (SELECT base.d, "
            f"1.0 / (1.0 + exp(-((SELECT b FROM b{t}) + coalesce(sc.s, 0.0)))) "
            f"- base.y AS r FROM base LEFT JOIN "
            f"(SELECT cf.d, sum(cf.cf * w{t}.w) AS s FROM cf "
            f"JOIN w{t} USING (bucket) GROUP BY cf.d) sc USING (d))"
        )
        ctes.append(
            f"w{t + 1} AS (SELECT w{t}.bucket, "
            f"round(w{t}.w - {lr!r} * coalesce(g.g, 0.0), {round_w}) AS w "
            f"FROM w{t} LEFT JOIN "
            f"(SELECT cf.bucket, sum(s{t}.r * cf.cf) / (SELECT n FROM nn) AS g "
            f"FROM cf JOIN s{t} USING (d) GROUP BY cf.bucket) g USING (bucket))"
        )
        ctes.append(
            f"b{t + 1} AS (SELECT round((SELECT b FROM b{t}) - {lr!r} * "
            f"(SELECT sum(r) FROM s{t}) / (SELECT n FROM nn), {round_w}) AS b)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT CAST(bucket AS BIGINT) AS bucket, "
        f"w AS weight FROM w{iters} "
        f"UNION ALL SELECT -1, b FROM b{iters} ORDER BY bucket"
    )
