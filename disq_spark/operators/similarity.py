"""Similarity search over embedding columns (array<float>).

- cosine_topk:     brute-force cosine top-k, queries x corpus. The query
                   side is broadcast (it is small by construction); the
                   corpus streams — at 100 TB this is one scan, no
                   shuffle, with the top-k reduced per-partition first
                   (window over a broadcast-joined cross product would
                   shuffle; we rank with a window on the joined result
                   whose size is |queries| * |corpus| rows pre-aggregated
                   per partition by Catalyst's partial TopK via
                   rank-filter pushdown under AQE).
- signlsh_topk:    IVF/LSH-style scale path: coarse bucket = sign bits of
                   the first B dimensions (a deterministic hyperplane
                   family), equi-join on bucket, exact cosine only within
                   the bucket. Turns the cross product into an equi-join
                   -> hash shuffle on a low-cardinality key. Recall is
                   tunable via B (smaller B = bigger buckets = higher
                   recall & cost).

Dot products are computed JVM-side with higher-order functions
(zip_with + aggregate over double) — deterministic left-to-right folds,
no Python. Scores are rounded so the DuckDB oracle (which folds in the
same order via list_transform/list_sum) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot_sql(a: str, b: str) -> str:
    """The dot-product fold as a SQL string. Parsed in ONE py4j round
    trip; the tree (zip_with of double casts folded left-to-right from
    a double 0) is the same one the Column-lambda form built — Column
    HOF lambdas cost dozens of py4j round trips per call, which
    dominated similarity-query plan-BUILD time (r11 profile)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        "cast(y as double)), cast(0.0 as double), (acc, x) -> acc + x)"
    )


def _dot(a, b) -> F.Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(a, a)})")
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_with_norms(a, b, norm_a, norm_b) -> F.Column:
    """cosine() with the norms precomputed per-vector BEFORE a pair join.

    Bit-identical arithmetic to cosine() — dot/(sqrt(aa)*sqrt(bb)) with
    the same left-to-right folds — but the aggregate over the vector runs
    once per *row* instead of twice more per *pair*. On a bucketed
    self-join emitting ~target_bucket_size pairs per vector this cuts
    the dominant HOF cost 3x (measured: dedup_embedding_cosine at sf1
    65s -> ~22s). Oracles need no change. Column-NAME args build one
    parsed expression (see _dot_sql); Column args keep the lambda path."""
    if all(isinstance(x, str) for x in (a, b, norm_a, norm_b)):
        return F.expr(f"{_dot_sql(a, b)} / ({norm_a} * {norm_b})")
    return _dot(a, b) / (norm_a * norm_b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    method: str = "auto",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``method="auto"`` (default) picks by the corpus's Catalyst size
    estimate: the broadcast-join SQL path under ~8 MB (Python-worker
    spin-up + Arrow transfer dominate small corpora — r6 bench, sf0.1
    warm 0.62 -> 1.13 s on blas), the GEMM path above (sf10: 15.5 ->
    2.3 s). Both round scores to ``round_to``, where float64 GEMM and
    the sequential fold agree.

    ``method="blas"``: queries (small by construction) are
    collected and shipped in the task closure as one numpy matrix; the
    corpus streams through ``mapInPandas`` where each Arrow batch runs
    a single (batch x dim) @ (dim x |queries|) float64 GEMM and keeps
    its per-query top-k (tie-broken by neighbor id like the final
    rank) — one corpus scan, no shuffle until the k x |queries| x
    #batches candidate rows, then one tiny window. This is the plan
    you want at 100 TB AND it removes the |corpus| x |queries|
    interpreted zip_with folds (measured sf10, 200k x 5: 15.5 -> ~2 s).
    ``method="sql"`` keeps the pure-column broadcast-join path.

    Output: (query_id, neighbor_id, rank, score). Self-matches excluded.
    """
    from disq_spark.operators.dispatch import resolve_method

    method = resolve_method(method, corpus)
    if method == "blas":
        import numpy as np

        qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
        q_ids = np.array([r[0] for r in qrows])
        qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
        qn = np.sqrt((qm * qm).sum(axis=1))
        id_t = corpus.schema[id_col].dataType.simpleString()

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf[id_col].to_numpy()
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                nrm = np.sqrt((v * v).sum(axis=1))
                scores = (v @ qm.T) / (nrm[:, None] * qn[None, :])
                out_q, out_n, out_s = [], [], []
                for qi in range(len(q_ids)):
                    col = scores[:, qi]
                    idx = np.nonzero(ids != q_ids[qi])[0]
                    order = idx[np.lexsort((ids[idx], -col[idx]))][:k]
                    out_q.append(np.full(len(order), q_ids[qi]))
                    out_n.append(ids[order])
                    out_s.append(col[order])
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "score": np.concatenate(out_s),
                    }
                )

        from disq_spark.operators.dispatch import fan_out

        # a low-partition source (one small parquet file) would cap the
        # scan at #files cores; harmless for results, required for wall
        src = fan_out(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        cand = src.mapInPandas(
            gen, f"query_id {id_t}, neighbor_id {id_t}, score double"
        )
        w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "rank",
                F.round("score", round_to).alias("score"),
            )
        )
    if method != "sql":
        raise ValueError(f"method must be 'blas' or 'sql': {method!r}")
    from disq_spark.operators.dispatch import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("q_norm"),
    )
    # the |corpus| x |queries| HOF cosine folds are the stage cost; a
    # single-file scan would run them serially (sf0.1: 0.52 -> 0.40 s)
    c = fan_out(corpus.select(F.col(id_col), F.col(vec_col)), id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("score", round_to).alias("score"),
        )
    )


def scale_n_bits(n: int, target_bucket_size: int = 8192, min_bits: int = 4, max_bits: int = 24) -> int:
    """Bucket-count sizing: enough sign bits that the *expected* bucket
    holds <= target_bucket_size vectors (within-bucket work is O(b^2),
    so fixed bit counts go quadratic as n grows — bits must scale with
    log2(n)). Clamped: >= 2^min_bits buckets for parallelism, <= 2^max_bits
    so the key stays a cheap int."""
    import math

    if n <= 0:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(max(n / target_bucket_size, 1.0)))))


def sign_bucket(vec, n_bits: int = 8, offset: int = 0) -> F.Column:
    """Deterministic coarse bucket: bit i = sign(vec[offset + i]).

    Equivalent to hyperplane LSH with axis-aligned hyperplanes — cheap,
    engine-portable, and good enough for high-dim random embeddings.
    ``offset`` selects a disjoint dimension slice, giving independent
    bucket families for multi-probe recall. Accepts a column NAME
    (preferred — builds one parsed expression, see _dot_sql) or a
    Column.
    """
    if isinstance(vec, str):
        terms = " + ".join(
            f"(CASE WHEN element_at({vec}, {offset + i + 1}) >= 0.0d "
            f"THEN {2**i} ELSE 0 END)"
            for i in range(n_bits)
        )
        return F.expr(f"cast((0 + {terms}) as int)")
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec, offset + i + 1) >= 0.0, F.lit(2**i)).otherwise(F.lit(0))
    return b.cast("int")


def _family_buckets(vec, n_bits: int, n_families: int) -> F.Column:
    """array of per-family bucket ids (family f = dims [f*n_bits, (f+1)*n_bits))."""
    return F.array(*[sign_bucket(vec, n_bits, offset=f * n_bits) for f in range(n_families)])


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    prefilter_bits: int | None = None,
) -> DataFrame:
    """Coarse quantization: assign each vector to its ``nprobe`` nearest
    centroids by cosine. Centroids are a small DataFrame (cid, cvec) —
    broadcast, so assignment is one scan with no shuffle. Output:
    (id, bucket, probe_rank).

    ``prefilter_bits``: score only centroids sharing the vector's
    ``sign_bucket`` (the same axis-sign LSH used elsewhere, applied to
    the centroids too) — the broadcast nested-loop over all k centroids
    becomes a broadcast HASH join on the bucket key, dropping assignment
    cost from O(n*k) dot products to O(n*k/2^bits) expected. Vectors
    whose bucket holds no centroid fall back to full scoring, so every
    vector always gets assigned. Deterministic and expressed in the
    DuckDB oracle verbatim (gate ``ann_ivf_topk``)."""
    from pyspark.sql import Window as W2

    c = centroids.select(
        F.col("cid"), F.col("cvec"), _norm("cvec").alias("c_n")
    )
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(vec_col).alias("v_n"),
    )
    if prefilter_bits is None:
        scored = vecs.join(F.broadcast(c))
    else:
        cb = c.withColumn("cb", sign_bucket("cvec", prefilter_bits))
        # tiny driver collect: <= 2^bits distinct centroid buckets
        covered = [r["cb"] for r in cb.select("cb").distinct().collect()]
        vb = vecs.withColumn("vb", sign_bucket("v", prefilter_bits))
        matched = vb.filter(F.col("vb").isin(covered)).join(
            F.broadcast(cb), F.col("vb") == F.col("cb")
        )
        uncovered = vb.filter(~F.col("vb").isin(covered)).join(F.broadcast(cb))
        scored = matched.unionByName(uncovered).drop("vb", "cb")
    w = W2.partitionBy("id").orderBy(
        F.desc(
            cosine_with_norms("v", "cvec", "v_n", "c_n")
        ),
        F.asc("cid"),
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("id", F.col("cid").alias("bucket"), "probe_rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    prefilter_bits: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: the index-structure scale path next to
    sign-LSH. Deterministic coarse quantizer: ``n_centroids`` (default
    ceil(sqrt(n)) — balances #lists against list length so probe cost is
    O(sqrt(n)) instead of the n/const a fixed count gives) corpus
    vectors chosen by md5-hash order of their id — a deterministic
    uniform sample, reproducible across engines, no iterative training
    and no head-of-file bias. Corpus vectors are assigned to their
    nearest centroid (the inverted lists); queries probe their
    ``nprobe`` nearest lists. Exact cosine only within probed lists:
    the cross product becomes an equi-join on the bucket key, shuffle
    proportional to list sizes. Output: (query_id, neighbor_id, rank,
    score).
    """
    if n_centroids is None:
        import math

        n_centroids = max(1, math.ceil(math.sqrt(corpus.count())))
    cents = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    corpus_b = ivf_assign(
        corpus, cents, id_col, vec_col, nprobe=1, prefilter_bits=prefilter_bits
    ).select(F.col("id").alias("neighbor_id"), "bucket")
    query_b = ivf_assign(
        queries, cents, id_col, vec_col, nprobe=nprobe, prefilter_bits=prefilter_bits
    ).select(F.col("id").alias("query_id"), "bucket")
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_norm"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("q_norm"),
    )
    cand = (
        query_b.join(corpus_b, "bucket")
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        cand.join(F.broadcast(q_vec), "query_id")
        .join(c_vec, "neighbor_id")
        .withColumn(
            "score",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", round_to).alias("score"))
    )


def _bucket_pair_kernel(threshold: float, round_to: int):
    """applyInPandas kernel: all within-group pairs scored by one
    float64 GEMM over row strips (<=128 MB score strip). Rows arrive
    sorted by id so position order == id order and id_a < id_b falls
    out of the upper triangle."""

    def score_bucket(pdf):
        import numpy as np
        import pandas as pd

        out_cols = ["id_a", "id_b", "score"]
        if len(pdf) < 2:
            return pd.DataFrame(columns=out_cols)
        pdf = pdf.sort_values("id", kind="mergesort")
        ids = pdf["id"].to_numpy()
        v = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy()
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        strip = max(1, (1 << 24) // n)
        for s0 in range(0, n, strip):
            sl = slice(s0, min(s0 + strip, n))
            scores = np.round((v[sl] @ v.T) / (nrm[sl, None] * nrm[None, :]), round_to)
            ii, jj = np.nonzero(scores >= threshold)
            keep = (ii + s0) < jj  # strict upper triangle in id order
            out_a.append(ids[ii[keep] + s0])
            out_b.append(ids[jj[keep]])
            out_s.append(scores[ii[keep], jj[keep]])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else [],
                "id_b": np.concatenate(out_b) if out_b else [],
                "score": np.concatenate(out_s) if out_s else [],
            }
        )

    return score_bucket


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_bits: int | None = None,
    n_families: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    method: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Self-join restricted to the sign bucket (hyperplane LSH): the O(n^2)
    cross product becomes an equi-join whose shuffle is proportional to
    bucket sizes. ``n_bits=None`` (the scale default) sizes the bucket
    count from the corpus so expected bucket population stays bounded —
    a fixed bit count makes the within-bucket self-join O((n/2^bits)^2),
    quadratic as n grows. ``n_families > 1`` probes disjoint dimension
    slices (one posexplode, one join — no per-family unions) to recover
    the recall a single hyperplane family loses; requires
    n_families * n_bits <= dim.

    ``method="blas"`` (default) scores each bucket's pairs with one
    Arrow-batched float64 GEMM (``applyInPandas`` over the bucket key)
    instead of materializing the within-bucket self-join and folding
    each pair through interpreted ``zip_with`` lambdas — the sf10
    measurement (SCALE.md) had 2.45M interpreted pair-cosines dominate
    the wall. Norms stay JVM-computed per vector; scores round to
    ``round_to`` in both paths, where float64 GEMM and the sequential
    fold agree (disagreement needs a true cosine within ~1e-15 of a
    rounding boundary). ``method="sql"`` keeps the pure-column path.

    Output: (id_a, id_b, score) with id_a < id_b, score >= threshold.
    """
    if n_bits is None:
        # driver-side sizing action, same spirit as the reference running
        # split planning as Spark jobs (BamSource.java:120-139)
        n_bits = scale_n_bits(df.count())
    # method="auto": SQL fold for provably-small corpora (Python-worker
    # spin-up dominates), bucket-GEMM at scale — see operators/dispatch.
    from disq_spark.operators.dispatch import fan_out, resolve_method

    method = resolve_method(method, df)
    # per-vector norms + the within-bucket cosine folds are the CPU
    # cost; a single-file scan runs them serially (sf0.1 measured:
    # 0.78 -> 0.49 s). No-op at scale — see fan_out.
    df = fan_out(df, id_col)
    if method == "blas":
        id_t = df.schema[id_col].dataType.simpleString()
        kernel = _bucket_pair_kernel(threshold, round_to)
        schema = f"id_a {id_t}, id_b {id_t}, score double"
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _norm(vec_col).alias("nrm"),
        )
        if n_families <= 1:
            tagged = base.withColumn("bucket", sign_bucket("v", n_bits))
            return tagged.groupBy("bucket").applyInPandas(kernel, schema)
        tagged = base.select(
            "id", "v", "nrm", F.posexplode(_family_buckets("v", n_bits, n_families)).alias("fam", "bucket")
        )
        return (
            tagged.groupBy("fam", "bucket")
            .applyInPandas(kernel, schema)
            # a pair sharing several family buckets must emit once;
            # the score is identical in every family group
            .dropDuplicates(["id_a", "id_b"])
        )
    if method != "sql":
        raise ValueError(f"method must be 'blas' or 'sql': {method!r}")
    if n_families <= 1:
        a = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("a_vec"),
            _norm(vec_col).alias("a_norm"),
            sign_bucket(vec_col, n_bits).alias("bucket"),
        )
        b = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("b_vec"),
            _norm(vec_col).alias("b_norm"),
            sign_bucket(vec_col, n_bits).alias("bucket"),
        )
        cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        fams = _family_buckets(vec_col, n_bits, n_families)
        a = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("a_vec"),
            _norm(vec_col).alias("a_norm"),
            F.posexplode(fams).alias("fam", "bucket"),
        )
        b = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("b_vec"),
            _norm(vec_col).alias("b_norm"),
            F.posexplode(fams).alias("fam", "bucket"),
        )
        cand = (
            a.join(b, ["fam", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            # a pair sharing several family buckets must score once
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.withColumn(
            "score",
            F.round(
                cosine_with_norms(
                    F.col("a_vec"), F.col("b_vec"), F.col("a_norm"), F.col("b_norm")
                ),
                round_to,
            ),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int | None = None,
    n_families: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket(s). ``n_bits=None`` auto-sizes buckets from the corpus count
    (see scale_n_bits); ``n_families > 1`` unions candidates from
    disjoint dimension slices via one posexplode — recall multiplies,
    cost stays an equi-join.

    Output: (query_id, neighbor_id, rank, score) — rank within candidates.
    """
    if n_bits is None:
        n_bits = scale_n_bits(corpus.count())
    if n_families <= 1:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(vec_col).alias("q_norm"),
            sign_bucket(vec_col, n_bits).alias("bucket"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(vec_col).alias("c_norm"),
            sign_bucket(vec_col, n_bits).alias("bucket"),
        )
        scored = c.join(F.broadcast(q), "bucket").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
    else:
        fams = _family_buckets(vec_col, n_bits, n_families)
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(vec_col).alias("q_norm"),
            F.posexplode(fams).alias("fam", "bucket"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(vec_col).alias("c_norm"),
            F.posexplode(fams).alias("fam", "bucket"),
        )
        scored = (
            c.join(F.broadcast(q), ["fam", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
    scored = scored.withColumn(
        "score",
        cosine_with_norms(
            F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("score", round_to).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# int8 quantization — the embedding-store size lever
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df, vec_col: str = "embedding", q_col: str = "q", scale_col: str = "scale"
):
    """Per-vector max-abs int8 quantization: scale = max|v| / 127,
    q_i = floor(v_i/scale + 0.5) in [-127, 127].

    4x smaller than float32 (16x vs float64) — at 100 TB the difference
    between an embedding store that fits executor storage and one that
    doesn't. Cosine is scale-invariant, so similarity search runs on the
    int8 vectors DIRECTLY (integer dot products; see ``cosine_q``) — no
    dequantize pass. floor(x + 0.5) instead of round() so the oracle is
    rounding-convention-independent across engines. Zero vectors get
    scale 0 and all-zero codes.
    """
    v = F.col(vec_col)
    dv = F.transform(v, lambda x: x.cast("double"))
    scale = F.aggregate(dv, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))) / F.lit(127.0)
    qexpr = F.when(
        F.col(scale_col) == 0.0,
        F.transform(dv, lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(dv, lambda x: F.floor(x / F.col(scale_col) + 0.5).cast("int"))
    )
    return df.withColumn(scale_col, scale).withColumn(q_col, qexpr)


def dequantize(q_col="q", scale_col="scale") -> F.Column:
    """int8 codes + scale -> array<double> approximation of the input."""
    return F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col))


def cosine_q(qa, qb) -> F.Column:
    """Cosine similarity straight from two int8 code arrays (the scales
    cancel): dot(qa,qb) / (|qa| |qb|). All-integer dot product."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n = lambda v: F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
    )
    return dot.cast("double") / (n(qa) * n(qb))


def semantic_dedup_pairs(
    df: "DataFrame",
    threshold: float = 0.95,
    k: int | str = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "first_ids",
    round_centroids: int = 6,
    method: str = "auto",
    block_size: int | None = None,
    target_cell_size: int = 1536,
) -> "DataFrame":
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    k-means cluster the embeddings, then compute EXACT pairwise cosine
    only within each cluster — cluster-scoped candidate generation makes
    the all-pairs comparison tractable at corpus scale.

    Output: (id_a, id_b, cid, score) with id_a < id_b and
    score = round(cosine, 4) >= threshold. Pairs that straddle two
    clusters are missed by design (the SemDeDup trade: recall bounded by
    clustering quality, cost bounded by sum of cluster_size^2).

    ``method="blas"`` (default) scores pairs in an Arrow-batched
    ``applyInPandas`` kernel: each task gets one (cid, block_i, block_j)
    group and runs a float64 numpy GEMM over row strips — the sf5
    lesson (SCALE.md) is that ``zip_with``/``aggregate`` lambdas run
    INTERPRETED on the JVM, multiplying per-pair cost ~100x; pairwise
    scoring at scale belongs in batched BLAS. Blocks are hash-assigned
    (``xxhash64(id) % n_blocks``, n_blocks sized so an expected block
    is <= ``block_size`` rows), every unordered pair lands in exactly
    one block-pair, and per-task memory is bounded by
    2 * block_size * dim doubles + a strip of the score matrix
    regardless of cluster size. ``block_size=None`` (default) picks
    ``max(1024, expected_cluster/16)``: measured on 100k x 64-dim
    vectors at k=8 (~625M pair-cosines), coarse grids leave straggler
    tails (bs=8192 -> 110 s; one tile = 33M pairs) while ~1k tiles run
    uniform (bs=1024 -> ~10 s warm); the /16 floor bounds the tagged
    row duplication (each row is shipped n_blocks times) at 16x
    shuffle amplification for any cluster size. ``method="sql"`` keeps the previous
    pure-column path (bit-exact fold order, zero Python) for parity
    checks and Arrow-less deployments; both round scores to 4 decimals,
    and float64 GEMM agrees with the sequential fold at that rounding
    for any realistic input (disagreement needs a true cosine within
    ~1e-15 of a 0.5e-4 boundary).

    Scale shape: the k-means rounds are broadcast-centroid projections
    (see ``clustering.kmeans``); the pair stage shuffles once on
    (cid, bi, bj) and emits ~n^2/k pairs for balanced clusters — at
    100 TB you grow k with n (k ~ n / target_cluster_size, like
    ``scale_n_bits`` does for the LSH variant) so per-cluster work
    stays constant, while the block grid keeps task memory flat and
    parallelism >= clusters x block-pairs even when k is small.
    """
    from disq_spark.operators.clustering import kmeans, scale_k

    if k == "auto":
        # grow cells with the corpus (k ~ n / target_cell_size): fixed
        # k is a measured quality cliff — clean-kernel R 0.815 -> 0.705
        # and P 0.64 -> 0.49 going 50k -> 500k docs at k=32 — and a
        # quadratic cost cliff (within-cell work is sum(cell^2) ~
        # n^2/k). The default target (1536) is the cell size at the
        # measured-good 50k/k=32 operating point; the r11 re-measured
        # series (SCALE.md §Round-11) shows auto-k dominating fixed k
        # past 50k on every axis (500k: R .743 / P .787 / F1 .764 vs
        # .705/.485/.574) while recall still eases mildly with scale.
        k = scale_k(df.count(), target_cell_size)
    assign = kmeans(
        df,
        k=k,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        init=init,
        round_centroids=round_centroids,
    ).select("id", "cid")
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(vec_col).alias("nrm"),
    )
    t = assign.join(vecs, "id")
    # method="auto": SQL pair-fold for provably-small inputs, blocked
    # GEMM at scale — see operators/dispatch.
    from disq_spark.operators.dispatch import resolve_method

    method = resolve_method(method, df)
    if method == "sql":
        a = t.select(F.col("cid"), F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
        b = t.select(F.col("cid"), F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        return (
            a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "score",
                F.round(cosine_with_norms("va", "vb", "na", "nb"), 4),
            )
            .filter(F.col("score") >= threshold)
            .select("id_a", "id_b", "cid", "score")
        )
    if method != "blas":
        raise ValueError(f"method must be 'blas' or 'sql': {method!r}")

    n = t.count()
    expected = max(n // max(k, 1), 1)
    if block_size is None:
        block_size = max(1024, -(-expected // 16))
    n_blocks = max(1, -(-expected // block_size))
    bid = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks))
    base = t.withColumn("b", bid.cast("int"))
    # role A covers block-pairs (b, j >= b); role B covers (i < b, b).
    # The diagonal pair (b, b) is carried by role A alone, so every
    # unordered block pair materializes exactly once.
    role_a = base.select(
        "cid", "id", "v", "nrm", F.lit("a").alias("role"),
        F.col("b").alias("bi"),
        F.explode(F.sequence(F.col("b"), F.lit(n_blocks - 1))).alias("bj"),
    )
    # role B must skip b == 0: Spark's sequence(0, b-1) is DESCENDING
    # for b == 0 — it yields [0, -1], not an empty array — which used
    # to hand every block-0 row a spurious role-b copy in its own
    # diagonal group (each same-block pair then scored 4x: 2x2 row
    # copies, the diag keep-one filter halves orientations only). The
    # literal n_blocks guard stays so the single-block plan prunes the
    # whole branch at fold time.
    role_b = base.filter((F.lit(n_blocks) > 1) & (F.col("b") > 0)).select(
        "cid", "id", "v", "nrm", F.lit("b").alias("role"),
        F.explode(F.sequence(F.lit(0), F.col("b") - 1)).alias("bi"),
        F.col("b").alias("bj"),
    )
    tagged = role_a.unionByName(role_b)

    def score_block(pdf):
        import numpy as np
        import pandas as pd

        cid = pdf["cid"].iloc[0]
        diag = pdf["bi"].iloc[0] == pdf["bj"].iloc[0]
        a_rows = pdf if diag else pdf[pdf["role"] == "a"]
        b_rows = pdf if diag else pdf[pdf["role"] == "b"]
        if len(a_rows) == 0 or len(b_rows) == 0:
            # empty frame with the INPUT's dtypes (ids may be strings)
            return pd.DataFrame(
                {
                    "id_a": pdf["id"][:0],
                    "id_b": pdf["id"][:0],
                    "cid": pdf["cid"][:0],
                    "score": pd.Series(dtype="float64"),
                }
            )
        ids_a = a_rows["id"].to_numpy()
        ids_b = b_rows["id"].to_numpy()
        va = np.stack(a_rows["v"].to_numpy()).astype(np.float64)
        vb = np.stack(b_rows["v"].to_numpy()).astype(np.float64)
        na = a_rows["nrm"].to_numpy()
        nb = b_rows["nrm"].to_numpy()
        out_a, out_b, out_s = [], [], []
        strip = max(1, (1 << 24) // max(len(ids_b), 1))  # <=128MB score strip
        for s0 in range(0, len(ids_a), strip):
            sl = slice(s0, s0 + strip)
            scores = (va[sl] @ vb.T) / (na[sl, None] * nb[None, :])
            scores = np.round(scores, 4)
            ii, jj = np.nonzero(scores >= threshold)
            ia, ib = ids_a[sl][ii], ids_b[jj]
            keep = ia != ib if diag else np.ones(len(ia), bool)
            ia, ib, sc = ia[keep], ib[keep], scores[ii, jj][keep]
            lo = np.minimum(ia, ib)
            hi = np.maximum(ia, ib)
            if diag:  # each unordered pair appears twice; keep one
                first = lo == ia
                lo, hi, sc = lo[first], hi[first], sc[first]
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sc)
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else ids_a[:0],
                "id_b": np.concatenate(out_b) if out_b else ids_b[:0],
                "cid": cid,
                "score": np.concatenate(out_s) if out_s else np.array([], np.float64),
            }
        )

    # schema derives from the INPUT (string/non-long ids worked on the
    # sql path and must keep working here — ADVICE r6); np.minimum/
    # np.maximum order object arrays fine, so the kernel is id-type
    # agnostic already.
    id_t = df.schema[id_col].dataType.simpleString()
    cid_t = assign.schema["cid"].dataType.simpleString()
    return tagged.groupBy("cid", "bi", "bj").applyInPandas(
        score_block, f"id_a {id_t}, id_b {id_t}, cid {cid_t}, score double"
    )
