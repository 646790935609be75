"""Product quantization (PQ) for embedding columns — the standard
compression + ANN-search path for corpus-scale vector data (Jegou et
al. 2011, the FAISS IVF-PQ design): split each d-dim vector into ``m``
subvectors, k-means each subspace, store only the m centroid codes
(m bytes/vector at k<=256 vs 4d bytes of float32 — 32x at d=64/m=4),
and answer top-k queries with asymmetric distance computation (ADC):
distance(query, vector) ~= sum over blocks of sqdist(query_subvec,
codebook[block][code]).

Scale shape (the part that matters at 100 TB):

- **Training** touches the corpus once per Lloyd iteration and trains
  ALL m subspaces in that one job: the vectors explode to
  (id, block, subvec) rows, assignment is a ROW-LOCAL argmin over the
  (block-dispatched) centroid literals — no join, no shuffle — and the
  update is one (block, cid, pos) groupBy whose output is m*k*(d/m)
  doubles, driver-trivial at any corpus size. Same determinism
  discipline as operators/clustering.kmeans (seed from the k lowest
  ids per block, round(avg, r) centroid updates so engine summation
  order can't drift) — the unrolled-CTE DuckDB oracle reproduces the
  codebooks exactly.
- **Encoding** is a pure projection (per-block row-local argmin, zero
  shuffle) — it pipelines onto whatever scan produces the vectors.
- **ADC top-k** materializes the classic lookup table IN-PLAN: the
  (query x block x centroid) distance table is a broadcast-sized
  crossJoin (Q*m*k rows), the exploded codes join it on (block, cid)
  [broadcast hash join], and one (q_id, id) aggregation sums the m
  block distances. One shuffle, rows = n*m per query batch. Ranking
  ties break on id, mirrored by the oracle's ORDER BY.

The reference has no vector path at all; this extends the repo's ANN
tier (similarity.py: brute GEMM / sign-LSH / IVF; int8 quantization)
with the codebook-compressed variant those designs hand off to at
full-corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from disq_spark.operators.clustering import _nearest, _nearest_sql, _sqdist


def _block_slices(vec_col: str, dim: int, m: int) -> list:
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return [F.slice(F.col(vec_col), b * sub + 1, sub) for b in range(m)]


def train_pq(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_centroids: int = 6,
) -> dict[tuple[int, int], list[float]]:
    """Per-subspace Lloyd's k-means; returns {(block, cid): centroid}.

    Deterministic and oracle-matchable: block ``b``'s seeds are the
    subvectors of the k lowest-id vectors; updates round(avg, r) per
    component (see module docstring)."""
    d = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    first = d.orderBy("id").limit(k).collect()
    if not first:
        return {}
    # fewer vectors than k: train that many centroids (the kmeans
    # convention) — downstream k is derived from the codebook keys
    k = min(k, len(first))
    dim = len(first[0].v)
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m={m}")

    blocks = d.select(
        "id",
        F.posexplode(
            F.array(*_block_slices("v", dim, m))
        ).alias("block", "sv"),
    )
    # fan a low-partition source out to the session's parallelism (the
    # clustering.kmeans lesson: a single parquet file would cap every
    # Lloyd round's row-local argmin at #input-partitions cores; all
    # downstream math is row-level, so this is result-neutral)
    from disq_spark.operators.dispatch import fan_out

    blocks = fan_out(blocks, "id", "block", size_of=d, min_bytes=2 * 1024 * 1024)
    # each Lloyd round rescans the exploded table: materialize once
    blocks = blocks.persist()
    try:
        cents: dict[tuple[int, int], list[float]] = {}
        for b in range(m):
            for cid, r in enumerate(first):
                cents[(b, cid)] = [float(x) for x in r.v[b * sub : (b + 1) * sub]]

        def assigned() -> DataFrame:
            # row-local argmin, block-dispatched: one CASE over the m
            # per-block centroid sets — no join, no exchange. Built as
            # ONE parsed expression: the centroid literals are m*k*sub
            # doubles, and building them as nested Columns cost one
            # py4j round trip each (seconds per Lloyd round at gate
            # sizes — r11 profile; see clustering._nearest_sql).
            base = _nearest_sql("sv", [(cid, cents[(0, cid)]) for cid in range(k)])
            if m > 1:
                branches = " ".join(
                    f"WHEN block = {b} THEN "
                    + _nearest_sql(
                        "sv", [(cid, cents[(b, cid)]) for cid in range(k)]
                    )
                    for b in range(1, m)
                )
                expr = F.expr(f"CASE {branches} ELSE {base} END")
            else:
                expr = F.expr(base)
            return blocks.select("id", "block", "sv", expr["cid"].alias("cid"))

        for _ in range(iters):
            rows = (
                assigned()
                .select("block", "cid", F.posexplode("sv").alias("pos", "x"))
                .groupBy("block", "cid", "pos")
                .agg(
                    F.round(
                        F.avg(F.col("x").cast("double")), round_centroids
                    ).alias("x")
                )
                .groupBy("block", "cid")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
                .select("block", "cid", F.col("px.x").alias("c"))
                .collect()
            )
            # a centroid that lost all members keeps its previous value
            # (same convention as the oracle: no row -> no update)
            for r in rows:
                cents[(int(r.block), int(r.cid))] = list(r.c)
        return cents
    finally:
        blocks.unpersist()


def _np_block_codes(X, C):
    """numpy argmin codes for one block, BIT-IDENTICAL to _nearest over
    the same centroids: distances accumulate per COMPONENT in ascending
    index order (the zip_with square then left-fold `acc + x` order —
    each += below is the fold's one addition for component i), and
    np.argmin keeps the FIRST minimum, matching the fold's strict `<`
    lower-cid tie-break. (The SQL path's `** 2` is Math.pow(x, 2.0),
    which fdlibm/OpenJDK special-case to x*x — the same multiply numpy
    does; equality is locked by a randomized test, not assumed.)

    X: (n, sub) float64 subvectors; C: (k, sub) float64 centroids."""
    import numpy as np

    n, sub = X.shape
    d2 = np.zeros((n, C.shape[0]), dtype=np.float64)
    # overflow/NaN are INTENTIONAL here (they reproduce the JVM's
    # double arithmetic on hostile rows and resolve to -1 below)
    with np.errstate(over="ignore", invalid="ignore"):
        for i in range(sub):
            diff = X[:, i][:, None] - C[:, i][None, :]
            d2 += diff * diff
    codes = np.argmin(d2, axis=1)
    # the fold's init is (cid=-1, dist=inf) and its `better` test is a
    # strict `<`, so a row whose BEST distance is non-finite (an inf
    # element, or a finite-but-huge one whose sqdist overflows — the
    # same doubles overflow identically in the JVM) never beats the
    # init and keeps cid -1; np.argmin would arbitrarily return 0
    codes[~np.isfinite(d2[np.arange(n), codes])] = -1
    return codes


def _blas_encode(df, cents_per_block, m, id_col, vec_col, cell_cents=None):
    """mapInPandas encode: (id, [cell,] codes) — one corpus scan, zero
    shuffle, numpy inner loops instead of m*k interpreted HOF folds per
    row (measured 8x at 100k vectors, SCALE.md §r10). cents_per_block:
    list of (k, sub) float64 matrices; cell_cents: optional (K, dim)
    coarse matrix (IVF)."""
    import numpy as np

    sub = cents_per_block[0].shape[1]
    dim = sub * len(cents_per_block)
    id_t = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL / ragged / non-finite rows must land exactly where
            # the sql fold lands them (r10 advice: the old np.stack
            # crashed where sql emitted sentinels, so 'auto' dispatch
            # made the same corpus encode at one scale and fail at
            # another). Fold semantics per block: init (cid=-1, inf),
            # zip_with pads the SHORTER side with nulls, so the code is
            # -1 unless the block slice has exactly `sub` finite
            # elements; the coarse cell additionally requires the FULL
            # vector length == dim (a longer vector pads the centroid
            # side with nulls). NaN-padding the matrix reproduces all
            # of that through the finite-min guard in _np_block_codes.
            vals = pdf[vec_col].tolist()
            nrows = len(vals)
            lens = np.empty(nrows, dtype=np.int64)
            X = np.full((nrows, dim), np.nan, dtype=np.float64)
            for i, v in enumerate(vals):
                if v is None:
                    lens[i] = -1
                    continue
                a = np.asarray(v, dtype=np.float64)
                lens[i] = a.shape[0]
                a = a[:dim]
                X[i, : a.shape[0]] = a
            codes = np.full((nrows, len(cents_per_block)), -1, dtype=np.int64)
            for b, C in enumerate(cents_per_block):
                ok = lens >= (b + 1) * sub
                if ok.any():
                    codes[ok, b] = _np_block_codes(X[ok, b * sub : (b + 1) * sub], C)
            out = {id_col: pdf[id_col]}
            if cell_cents is not None:
                cell = np.full(nrows, -1, dtype=np.int64)
                okc = lens == cell_cents.shape[1]
                if okc.any():
                    cell[okc] = _np_block_codes(X[okc][:, : cell_cents.shape[1]], cell_cents)
                out["cell"] = cell.astype(np.int32)
            out["codes"] = [[int(c) for c in row] for row in codes]
            yield pd.DataFrame(out)

    # a low-partition source (one parquet file) would cap the scan at
    # #files cores; result-neutral, required for wall (the kmeans lesson)
    from disq_spark.operators.dispatch import fan_out

    src = fan_out(df.select(F.col(id_col), F.col(vec_col)), id_col)
    cell_field = "cell int, " if cell_cents is not None else ""
    return src.mapInPandas(gen, f"{id_col} {id_t}, {cell_field}codes array<int>")


def _resolve_encode_method(method: str, df, m: int, k: int) -> str:
    """Encode-specific 'auto' dispatch. The generic size rule
    (dispatch.resolve_method) keys on the INPUT's Catalyst size
    estimate, which is the right proxy when kernel work scales with
    bytes — but encode work is rows * m * k argmin folds, and k is a
    free parameter: a 50k-doc hashed-BoW corpus is 1.9 MB of
    parquet-compressed ints (under the 8 MB sql threshold) yet costs
    80 s interpreted at m=4/k=256 vs ~1 s in the kernel (r10 BoW probe,
    SCALE.md). 'auto' therefore weights the size estimate by the argmin
    width relative to the 32-fold gate baseline (m=4, k=8), keeping
    tiny-corpus/tiny-k gates on the zero-overhead column path while any
    production-k encode takes the kernel."""
    from disq_spark.operators.dispatch import (
        SMALL_INPUT_BYTES,
        plan_size_bytes,
        resolve_method,
    )

    if method != "auto":
        return resolve_method(method, df)  # validates the string
    return (
        "sql"
        if plan_size_bytes(df) * (m * k) / 32 < SMALL_INPUT_BYTES
        else "blas"
    )


def _cent_matrices(codebooks, m: int):
    import numpy as np

    k = max(cid for _, cid in codebooks) + 1
    return [
        np.array([codebooks[(b, cid)] for cid in range(k)], dtype=np.float64)
        for b in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id_col, codes array<int>) — one corpus scan, zero shuffle.

    ``method``: the repo's standard kernel dispatch
    (operators/dispatch.resolve_method). ``"sql"`` is the pure-column
    row-local argmin — m chained-when folds over centroid literals;
    correct at any scale but the folds are higher-order functions,
    which Spark evaluates INTERPRETED at every k (the r10 codegen
    probe: no WholeStageCodegen span at k=8..256), so encode cost is
    m*k interpreted sqdist folds per vector and dominates the PQ
    serving split. ``"blas"`` streams the scan through an Arrow
    ``mapInPandas`` kernel (ordered-accumulation numpy, bit-identical
    codes — see _np_block_codes; equality test in
    tests/test_ranking_clustering.py). ``"auto"`` weights the input's
    plan-size estimate by the argmin width m*k relative to the 32-fold
    gate baseline before comparing against the ~8 MB sql threshold
    (see _resolve_encode_method: encode cost is rows*m*k folds with k a
    free parameter, so a production-k encode takes the kernel even on
    a byte-tiny corpus, while tiny-corpus/tiny-k gates keep the
    zero-overhead column path)."""
    if not codebooks:
        return df.select(F.col(id_col), F.array().cast("array<int>").alias("codes"))
    k = max(cid for _, cid in codebooks) + 1
    dim = m * len(codebooks[(0, 0)])
    if _resolve_encode_method(method, df, m, k) == "blas":
        return _blas_encode(df, _cent_matrices(codebooks, m), m, id_col, vec_col)
    sub = dim // m
    codes = F.expr(
        "array("
        + ", ".join(
            "("
            + _nearest_sql(
                f"slice({vec_col}, {b * sub + 1}, {sub})",
                [(cid, codebooks[(b, cid)]) for cid in range(k)],
            )
            + ").cid"
            for b in range(m)
        )
        + ")"
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def ivf_pq_encode(
    df: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    coarse: dict[tuple[int, int], list[float]],
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id_col, cell, codes) — the IVF-PQ ingest projection: coarse cell
    id and PQ codes computed in ONE row-local pass over the corpus scan
    (zero shuffle, pipelines onto ingest like ``pq_encode``). This is
    the write half of the at-scale serving split: run once when vectors
    land, persist the output, and point ``ivf_pq_topk(encoded_df=...)``
    at it — encoding is the measured-dominant cost (SCALE.md §r9 PQ
    probe: 2.45 s stored vs 31.6 s in-plan at 100k vectors)."""
    if not codebooks or not coarse:
        raise ValueError("empty codebooks (train_pq over an empty corpus?)")
    K = max(cid for _, cid in coarse) + 1
    k = max(cid for _, cid in codebooks) + 1
    dim = m * len(codebooks[(0, 0)])
    # the coarse argmin adds K full-dim folds: weight by the total width
    if _resolve_encode_method(method, df, 1, m * k + K) == "blas":
        return _blas_encode(
            df, _cent_matrices(codebooks, m), m, id_col, vec_col,
            cell_cents=_cent_matrices(coarse, 1)[0],
        )
    sub = dim // m
    cell = F.expr(
        "("
        + _nearest_sql(vec_col, [(cid, coarse[(0, cid)]) for cid in range(K)])
        + ").cid"
    )
    codes = F.expr(
        "array("
        + ", ".join(
            "("
            + _nearest_sql(
                f"slice({vec_col}, {b * sub + 1}, {sub})",
                [(cid, codebooks[(b, cid)]) for cid in range(k)],
            )
            + ").cid"
            for b in range(m)
        )
        + ")"
    )
    return df.select(F.col(id_col), cell.alias("cell"), codes.alias("codes"))


def pq_topk(
    df: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    queries: list[tuple[int, list[float]]],
    topk: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (q_id, id_col, adist), ``topk`` rows per query,
    ordered by (q_id, adist, id). ``queries`` is a driver-side list —
    query batches are small by definition; the corpus side never
    leaves the cluster.

    ``codes_df`` (optional): a precomputed ``pq_encode`` output
    (id_col, codes). THE serving shape at scale — encoding is the
    expensive half (m*k row-local distance folds per vector; measured
    dominant at 100k vectors, SCALE.md §r9 PQ probe) and runs ONCE at
    ingest; searches against the stored codes pay only the broadcast
    LUT join + one aggregation."""
    if not codebooks:
        raise ValueError("empty codebooks (train_pq over an empty corpus?)")
    spark = df.sparkSession
    k = max(cid for _, cid in codebooks) + 1
    dim = m * len(codebooks[(0, 0)])
    sub = dim // m

    enc = codes_df if codes_df is not None else pq_encode(
        df, codebooks, m, id_col, vec_col
    )
    coded = enc.select(
        F.col(id_col), F.posexplode("codes").alias("block", "cid")
    )
    # the classic ADC lookup table, built IN-PLAN (Q*m*k rows), then the
    # block-ORDERED distance fold — see _adc_score_topk for why an
    # unordered SUM over doubles would diverge between engines
    lut = _adc_lut(spark, codebooks, queries, m, k, sub)
    return _adc_score_topk(coded, lut, id_col, topk, ["block", "cid"])


def _adc_lut(spark, codebooks, queries, m: int, k: int, sub: int):
    """(q_id, block, cid, bd) — the ADC lookup table, built in-plan."""
    cdf = spark.createDataFrame(
        [(b, cid, codebooks[(b, cid)]) for b in range(m) for cid in range(k)],
        "block int, cid int, c array<double>",
    )
    qdf = spark.createDataFrame(
        [
            (qid, b, [float(x) for x in qv[b * sub : (b + 1) * sub]])
            for qid, qv in queries
            for b in range(m)
        ],
        "q_id long, block int, qsv array<double>",
    )
    return qdf.join(F.broadcast(cdf), "block").select(
        "q_id", "block", "cid", _sqdist("qsv", "c").alias("bd")
    )


def _adc_score_topk(coded: DataFrame, lut: DataFrame, id_col: str, topk: int,
                    join_on: list[str]) -> DataFrame:
    """Block-ORDERED distance fold per (q_id, id) + per-query top-k (see
    pq_topk's comment on why an unordered SUM would be wrong)."""
    scored = (
        coded.join(F.broadcast(lut), join_on)
        .groupBy("q_id", id_col)
        .agg(F.array_sort(F.collect_list(F.struct("block", "bd"))).alias("a"))
        .select(
            "q_id",
            id_col,
            F.aggregate(
                F.col("a.bd"), F.lit(0.0), lambda acc, x: acc + x
            ).alias("adist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("adist", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("q_id", id_col, "adist")
        .orderBy("q_id", "adist", id_col)
    )


def ivf_pq_topk(
    df: DataFrame,
    codebooks: dict[tuple[int, int], list[float]],
    coarse: dict[tuple[int, int], list[float]],
    queries: list[tuple[int, list[float]]],
    nprobe: int = 2,
    topk: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search: probe each query's ``nprobe`` nearest coarse cells
    and run ADC only within them — the FAISS-style serving shape where a
    query touches ~nprobe/K of the corpus instead of all of it.

    ``coarse`` is a full-vector quantizer trained as ``train_pq(df, m=1,
    k=K)`` (a coarse quantizer IS single-block PQ, so training reuses
    the same job and the same oracle CTEs). With ``nprobe == K`` the
    result equals ``pq_topk`` exactly (tested).

    Plan shape: cell id and PQ codes are ONE combined row-local
    projection over the corpus scan (never a corpus-corpus join); the
    probe ranking and the candidate semi-join broadcast (queries and
    probed-cell lists are tiny); cost per query batch =
    sum over queries of |probed cells' members| * m rows into the one
    (q_id, id) aggregation. Probing runs IN-PLAN, not driver-side: a
    knife-edge cell-distance tie resolved differently by a Python float
    fold would silently change the candidate set vs the SQL oracle."""
    if not codebooks or not coarse:
        raise ValueError("empty codebooks (train_pq over an empty corpus?)")
    spark = df.sparkSession
    K = max(cid for _, cid in coarse) + 1
    k = max(cid for _, cid in codebooks) + 1
    dim = m * len(codebooks[(0, 0)])
    sub = dim // m

    # precomputed (id, cell, codes) is the at-scale serving shape; see
    # pq_topk's codes_df note
    encoded = (
        encoded_df
        if encoded_df is not None
        else ivf_pq_encode(df, codebooks, coarse, m, id_col, vec_col)
    )

    qv = spark.createDataFrame(
        [(qid, [float(x) for x in v]) for qid, v in queries],
        "q_id long, qv array<double>",
    )
    gdf = spark.createDataFrame(
        [(cid, coarse[(0, cid)]) for cid in range(K)], "cell int, c array<double>"
    )
    wq = Window.partitionBy("q_id").orderBy("d", "cell")
    probed = (
        qv.crossJoin(F.broadcast(gdf))
        .select("q_id", "cell", _sqdist("qv", "c").alias("d"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cell")
    )
    coded = (
        encoded.join(F.broadcast(probed), "cell")
        .select("q_id", id_col, F.posexplode("codes").alias("block", "cid"))
    )
    lut = _adc_lut(spark, codebooks, queries, m, k, sub)
    return _adc_score_topk(coded, lut, id_col, topk, ["q_id", "block", "cid"])
