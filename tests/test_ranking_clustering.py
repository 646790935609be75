"""BM25 ranking + k-means clustering operator tests (sf0.001 + inline)."""

import pytest
from pyspark.sql import functions as F

from disq_spark.operators.clustering import kmeans, kmeans_summary
from disq_spark.operators.ranking import bm25
from disq_spark.queries.tables import load

SF = "/root/testdata/sf0.001"


def test_bm25_monotone_in_tf(spark):
    """More occurrences of a query term -> strictly higher score
    (equal doc length via padding with a non-query filler token)."""
    rows = [
        (1, "apple pad pad pad pad pad"),
        (2, "apple apple pad pad pad pad"),
        (3, "apple apple apple pad pad pad"),
        (4, "pad pad pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25(df, ["apple"]).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 matches nothing
    assert got[1] < got[2] < got[3]


def test_bm25_rare_term_outweighs_common(spark):
    """A term appearing in 1 of N docs carries more idf than one in all."""
    rows = [(i, "common pad pad") for i in range(1, 10)] + [(10, "common rare pad")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25(df, ["common", "rare"]).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[10].n_matched_terms == 2
    assert by_id[10].score > max(by_id[i].score for i in range(1, 10))


def test_bm25_corpus_runs_and_is_deterministic(spark):
    d = load(spark, SF, "documents")
    a = bm25(d, ["join", "spark", "window"]).collect()
    b = bm25(d, ["join", "spark", "window"]).collect()
    assert a == b and len(a) > 0
    assert all(r.score > 0 for r in a)


def test_kmeans_partitions_all_vectors(spark):
    e = load(spark, SF, "embeddings")
    n = e.count()
    a = kmeans(e, k=4, iters=2)
    assert a.count() == n
    assert a.select("id").distinct().count() == n
    assert a.agg(F.max("cid")).first()[0] <= 3
    assert a.filter(F.col("dist") < 0).count() == 0


def test_kmeans_blas_bit_identical_to_sql(spark):
    """The r11 Arrow assignment kernel (the wide-k path behind
    scale_k/auto-k) must be BIT-identical to the pure-column fold:
    same cids on planted exact ties, same dist doubles, and the same
    sentinel (cid -1, dist inf) on NULL/ragged/non-finite rows."""
    import math
    import random

    from disq_spark.operators.clustering import kmeans

    rng = random.Random(4099)
    dim = 16
    rows = [
        (i, [float(f"{rng.uniform(-1, 1):.6g}") for _ in range(dim)])
        for i in range(300)
    ]
    rows += [
        (300, None),
        (301, []),
        (302, [0.5] * (dim - 1)),
        (303, [0.5] * (dim + 1)),
        (304, [float("nan")] + [0.5] * (dim - 1)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # duplicate seed rows (ids 0/1 share a vector) plant an exact
    # centroid tie: both paths must keep the LOWER cid
    dup = spark.createDataFrame([(1, rows[0][1])], "vec_id long, embedding array<float>")
    df = df.filter("vec_id != 1").union(dup)

    a = {r.id: (r.cid, r.dist) for r in kmeans(df, k=6, iters=2, method="sql").collect()}
    b = {r.id: (r.cid, r.dist) for r in kmeans(df, k=6, iters=2, method="blas").collect()}
    assert set(a) == set(b)
    for i in a:
        assert a[i][0] == b[i][0], (i, a[i], b[i])
        if math.isinf(a[i][1]):
            assert math.isinf(b[i][1])
        else:
            assert a[i][1] == b[i][1], (i, a[i], b[i])  # exact doubles
    assert a[300][0] == -1 and a[301][0] == -1 and a[304][0] == -1
    assert math.isinf(a[300][1])


def test_scale_k_rule():
    from disq_spark.operators.clustering import scale_k

    assert scale_k(4000) == 8           # gate cap clamps to min_k
    assert scale_k(50_000) == 33        # the measured-good 50k point
    assert scale_k(500_000) == 326
    assert scale_k(10**10, max_k=4096) == 4096
    assert scale_k(0) == 8


def test_kmeans_inertia_improves_over_iterations(spark):
    e = load(spark, SF, "embeddings")

    def total_inertia(iters):
        s = kmeans_summary(e, k=4, iters=iters)
        return (
            s.agg(F.sum(F.col("inertia") * F.col("n_members"))).first()[0]
        )

    # tolerance above the operator's own rounding noise (inertia rounds
    # to 4 decimals, centroids to 6, summed over n_members weights)
    assert total_inertia(3) <= total_inertia(1) + 1e-2


def test_kmeans_sample_init(spark):
    e = load(spark, SF, "embeddings")
    s = kmeans_summary(e, k=4, iters=1)
    a = kmeans(e, k=4, iters=1, init="sample", seed=7)
    assert a.count() == e.count()
    assert s.agg(F.sum("n_members")).first()[0] == e.count()


def test_kmeans_sample_init_reproducible(spark):
    """init='sample' is genuinely seeded: identical assignments across
    runs and across input partitionings (seed rows chosen by seeded
    hash order, not scan order)."""
    e = load(spark, SF, "embeddings")
    a = sorted(kmeans(e, k=4, iters=1, init="sample", seed=7).collect())
    b = sorted(kmeans(e, k=4, iters=1, init="sample", seed=7).collect())
    c = sorted(
        kmeans(e.repartition(7), k=4, iters=1, init="sample", seed=7).collect()
    )
    assert a == b == c


def test_kmeans_rejects_unknown_init(spark):
    e = load(spark, SF, "embeddings")
    with pytest.raises(ValueError):
        kmeans(e, k=2, iters=1, init="bogus")


def test_percentile_filter_keeps_top_fraction(spark):
    from disq_spark.operators.sampling import percentile_filter

    rows = [(i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    kept = percentile_filter(
        df, "v", 0.8, "id", sample_rate=0.5, threshold_col="threshold"
    )
    n = kept.count()
    # sampled threshold: top ~20%, tolerance for sampling error
    assert 120 <= n <= 280
    # every kept value above every dropped value's threshold
    thr = kept.agg(F.min("threshold")).first()[0]
    assert kept.filter(F.col("v") < thr).count() == 0
    # default: threshold column dropped; input 'threshold' col tolerated
    plain = percentile_filter(df, "v", 0.8, "id", sample_rate=0.5)
    assert plain.columns == ["id", "v"]
    clash = df.withColumn("threshold", F.lit(0.0))
    assert (
        percentile_filter(clash, "v", 0.8, "id", sample_rate=0.5).count() == n
    )
    with pytest.raises(ValueError):
        percentile_filter(
            clash, "v", 0.8, "id", sample_rate=0.5, threshold_col="threshold"
        )
    # deterministic re-run
    assert kept.count() == percentile_filter(
        df, "v", 0.8, "id", sample_rate=0.5
    ).count()


def test_mixing_weights_shares_sum_to_one(spark):
    from disq_spark.queries.llm import corpus_mixing_weights

    out = corpus_mixing_weights(spark, SF).collect()
    assert len(out) > 1
    assert abs(sum(r.share for r in out) - 1.0) < 1e-3
    # weights inversely proportional to share: biggest share has smallest weight
    by_share = sorted(out, key=lambda r: r.share)
    assert by_share[0].weight >= by_share[-1].weight


def test_repetition_stats_edges(spark, tmp_path, monkeypatch):
    """Degenerate docs: empty, single-token, all-identical tokens."""
    from disq_spark.queries import llm as L

    rows = [
        (1, ""),
        (2, "word"),
        (3, "spam spam spam spam"),
        (4, "a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    monkeypatch.setattr(L, "load", lambda s, sf, name: df)
    out = {r.doc_id: r for r in L.text_repetition_stats(spark, "ignored").collect()}
    assert out[1].n_tokens == 0 and out[1].distinct_ratio == 1.0
    assert out[2].top_bigram_share == 0.0
    assert out[3].distinct_ratio == 0.25 and out[3].top_bigram_share == 1.0
    assert out[4].distinct_ratio == 1.0 and out[4].top_bigram_share == 0.25


def test_unigram_nll_orders_rare_docs_higher(spark, monkeypatch):
    """Docs made of rare tokens carry higher mean NLL than docs of
    common tokens; empty docs drop out."""
    from disq_spark.queries import llm as L

    rows = (
        [(i, "common common common") for i in range(1, 20)]
        + [(20, "zyzzyva qwerty")]
        + [(21, "")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(L, "load", lambda s, sf, name: df)
    out = {r.doc_id: r for r in L.text_unigram_nll(spark, "x").collect()}
    assert 21 not in out  # empty doc has no tokens
    assert out[20].avg_nll > out[1].avg_nll
    assert out[1].n_tokens == 3


def test_chunk_documents_windows(spark):
    from disq_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 512), (3, "c" * 513), (4, "d" * 1200), (5, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, size=512, overlap=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert {k: len(v) for k, v in by_doc.items()} == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}
    # overlap: consecutive chunks share `overlap` chars
    c4 = sorted(by_doc[4], key=lambda r: r.chunk_index)
    assert c4[0].chunk_text[-64:] == c4[1].chunk_text[:64]
    # full reconstruction: stride-concatenation reproduces the text
    rebuilt = c4[0].chunk_text + "".join(c.chunk_text[64:] for c in c4[1:])
    assert rebuilt == "d" * 1200
    # stable ids
    assert [c.chunk_id for c in c4] == ["4:0", "4:1", "4:2"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, size=100, overlap=100)


def test_entropy_orders_degenerate_text_lower(spark, monkeypatch):
    from disq_spark.queries import llm as L

    rows = [
        (1, "aaaaaaaaaaaaaaaa"),          # zero entropy
        (2, "abababababababab"),          # 1 bit
        (3, "the quick brown fox jumps"),  # natural text
        (4, ""),                           # drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(L, "load", lambda s, sf, name: df)
    out = {r.doc_id: r for r in L.text_entropy(spark, "x").collect()}
    assert 4 not in out
    assert out[1].entropy == 0.0 and out[1].n_distinct_chars == 1
    assert out[1].entropy < out[2].entropy < out[3].entropy
    import math
    assert abs(out[2].entropy - math.log(2)) < 1e-3


def test_percentile_filter_degenerate_params_keep_data(spark):
    """pct=0 keeps ~everything (threshold = sample min); an empty sample
    keeps EVERYTHING (-inf fallback) instead of silently deleting."""
    from disq_spark.operators.sampling import percentile_filter

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double")
    # pct=0 -> threshold = sample MINIMUM: keeps everything at/above it
    # (deterministic md5 sample; values below the sampled min drop)
    assert percentile_filter(df, "v", 0.0, "id", sample_rate=0.5).count() >= 90
    # sample_rate so small nothing is sampled -> keep all
    assert percentile_filter(df, "v", 0.8, "id", sample_rate=1e-12).count() == 100


# -- product quantization (operators/pq.py) -----------------------------------


def _pq_serial(vecs: dict, m: int, k: int, iters: int, rnd: int):
    """Driver-side reference: joint per-block Lloyd's with the same
    seed (k lowest ids per block), tie (lowest cid), and round(avg)
    conventions as train_pq — half-up decimal rounding is irrelevant
    here because Python round is only applied to averages the operator
    also rounds via Spark F.round; the test corpus is chosen with no
    halfway points (random floats)."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    sub = dim // m
    cents = {
        (b, cid): list(vecs[ids[cid]][b * sub : (b + 1) * sub])
        for b in range(m)
        for cid in range(k)
    }

    def nearest(b, sv):
        best, bd = None, None
        for cid in range(k):
            c = cents[(b, cid)]
            d = 0.0
            for x, y in zip(sv, c):
                d += (x - y) ** 2
            if bd is None or d < bd:
                best, bd = cid, d
        return best, bd

    for _ in range(iters):
        members: dict = {}
        for i in ids:
            for b in range(m):
                sv = vecs[i][b * sub : (b + 1) * sub]
                cid, _ = nearest(b, sv)
                members.setdefault((b, cid), []).append(sv)
        for key, svs in members.items():
            avg = [sum(col) / len(svs) for col in zip(*svs)]
            cents[key] = [round(x, rnd) for x in avg]
    return cents, sub, nearest


def test_pq_encode_matches_serial_reference(spark):
    import random

    from disq_spark.operators.pq import pq_encode, train_pq

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(12)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, k, iters = 3, 4, 2
    cb = train_pq(df, m=m, k=k, iters=iters)
    ref, sub, nearest = _pq_serial(vecs, m, k, iters, 6)
    # codebooks agree (rounded floats from random draws: no halfway pts)
    for key in ref:
        assert cb[key] == [round(x, 6) for x in ref[key]] or all(
            abs(a - b) < 1e-9 for a, b in zip(cb[key], ref[key])
        ), key
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, cb, m=m).collect()}
    for i, v in vecs.items():
        want = [nearest(b, v[b * sub : (b + 1) * sub])[0] for b in range(m)]
        assert got[i] == want, i


def test_pq_topk_matches_exact_adc(spark):
    """pq_topk's distributed ADC equals the serial ADC on the same
    codebooks: distance = sum over blocks of sqdist(query subvec,
    assigned centroid)."""
    import random

    from disq_spark.operators.pq import pq_encode, pq_topk, train_pq

    rng = random.Random(23)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(12)] for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, k, topk = 3, 4, 6
    cb = train_pq(df, m=m, k=k, iters=2)
    sub = 12 // m
    codes = {r.vec_id: list(r.codes) for r in pq_encode(df, cb, m=m).collect()}
    queries = [(0, vecs[0]), (7, vecs[7])]
    got = [
        (r.q_id, r.vec_id, r.adist)
        for r in pq_topk(df, cb, queries, topk=topk, m=m).collect()
    ]
    for qid, qv in queries:
        dists = []
        for i in vecs:
            d = 0.0
            for b in range(m):
                c = cb[(b, codes[i][b])]
                for x, y in zip(qv[b * sub : (b + 1) * sub], c):
                    d += (x - y) ** 2
            dists.append((d, i))
        dists.sort(key=lambda t: (t[0], t[1]))
        want = [(qid, i) for _, i in dists[:topk]]
        have = [(q, i) for q, i, _ in got if q == qid]
        assert have == want, qid


def test_pq_dim_not_divisible_raises(spark):
    import pytest

    from disq_spark.operators.pq import train_pq

    df = spark.createDataFrame([(0, [1.0] * 10)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(df, m=3)


def test_ivf_pq_full_probe_equals_pq_topk(spark):
    """With nprobe == coarse K every cell is probed, so IVF-PQ must
    return exactly pq_topk's rows (same codebooks, same queries)."""
    import random

    from disq_spark.operators.pq import ivf_pq_topk, pq_topk, train_pq

    rng = random.Random(31)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(12)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, K = 3, 4
    cb = train_pq(df, m=m, k=4, iters=2)
    coarse = train_pq(df, m=1, k=K, iters=2)
    queries = [(0, vecs[0]), (9, vecs[9])]
    full = [(r.q_id, r.vec_id, round(r.adist, 9))
            for r in pq_topk(df, cb, queries, topk=5, m=m).collect()]
    ivf = [(r.q_id, r.vec_id, round(r.adist, 9))
           for r in ivf_pq_topk(df, cb, coarse, queries, nprobe=K, topk=5, m=m).collect()]
    assert ivf == full


def test_ivf_pq_candidates_respect_probed_cells(spark):
    """Every returned id must live in one of its query's nprobe probed
    cells — the pruning contract (a result from an unprobed cell means
    the semi-join leaked)."""
    import random

    from disq_spark.operators.pq import ivf_pq_topk, pq_encode, train_pq

    rng = random.Random(37)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(12)] for i in range(80)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, K, nprobe = 3, 4, 2
    cb = train_pq(df, m=m, k=4, iters=2)
    coarse = train_pq(df, m=1, k=K, iters=2)
    cells = {r.vec_id: r.codes[0]
             for r in pq_encode(df, coarse, m=1).collect()}

    def probe(qv):
        ds = []
        for cid in range(K):
            c = coarse[(0, cid)]
            ds.append((sum((x - y) ** 2 for x, y in zip(qv, c)), cid))
        ds.sort()
        return {cid for _, cid in ds[:nprobe]}

    queries = [(0, vecs[0]), (11, vecs[11])]
    out = ivf_pq_topk(df, cb, coarse, queries, nprobe=nprobe, topk=8, m=m).collect()
    assert out
    qmap = dict(queries)
    for r in out:
        assert cells[r.vec_id] in probe(qmap[r.q_id]), (r.q_id, r.vec_id)


def test_pq_topk_stored_codes_equals_inplan(spark):
    """codes_df / encoded_df (the at-scale serving shape: encode once at
    ingest, search stored codes) must produce exactly the in-plan
    results."""
    import random

    from pyspark.sql import functions as F

    from disq_spark.operators.clustering import _nearest
    from disq_spark.operators.pq import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_pq,
    )

    rng = random.Random(41)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(12)] for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, K = 3, 4
    cb = train_pq(df, m=m, k=4, iters=2)
    coarse = train_pq(df, m=1, k=K, iters=2)
    queries = [(0, vecs[0]), (5, vecs[5])]
    codes = pq_encode(df, cb, m=m)
    cell = _nearest(
        F.col("embedding"), [(cid, coarse[(0, cid)]) for cid in range(K)]
    )["cid"]
    enc = df.select(F.col("vec_id"), cell.alias("cell")).join(codes, "vec_id")

    key = lambda rows: [(r.q_id, r.vec_id, round(r.adist, 9)) for r in rows]
    assert key(pq_topk(df, cb, queries, topk=6, m=m, codes_df=codes).collect()) == \
        key(pq_topk(df, cb, queries, topk=6, m=m).collect())
    assert key(ivf_pq_topk(df, cb, coarse, queries, nprobe=2, topk=6, m=m,
                           encoded_df=enc).collect()) == \
        key(ivf_pq_topk(df, cb, coarse, queries, nprobe=2, topk=6, m=m).collect())


def test_pq_encode_blas_bit_identical_to_sql(spark):
    """The r10 Arrow encode kernel must produce BIT-IDENTICAL codes to
    the pure-column argmin: ordered per-component accumulation mirrors
    the zip_with/fold order, np.argmin's first-min matches the fold's
    strict-< lower-cid tie-break, and Math.pow(x, 2.0) == x*x
    (fdlibm/OpenJDK special case) — this test is the lock on all three
    assumptions, over float32 inputs (the parquet embedding type, cast
    to double on both paths) including exact-tie vectors."""
    import random

    from disq_spark.operators.pq import ivf_pq_encode, pq_encode

    rng = random.Random(1007)
    m, k, dim = 4, 16, 32
    cb = {
        (b, cid): [rng.uniform(-1, 1) for _ in range(dim // m)]
        for b in range(m)
        for cid in range(k)
    }
    # two identical centroids in block 2: any vector's distance ties
    # exactly; both paths must keep the LOWER cid
    cb[(2, 7)] = list(cb[(2, 3)])
    coarse = {(0, cid): [rng.uniform(-1, 1) for _ in range(dim)] for cid in range(4)}
    rows = [
        (i, [float(f"{rng.uniform(-1, 1):.6g}") for _ in range(dim)])
        for i in range(400)
    ]
    # plant exact-centroid rows (distance 0 in one block, tie-prone)
    rows[5] = (5, cb[(0, 9)] + cb[(1, 0)] + cb[(2, 3)] + cb[(3, 15)])
    # hostile rows (r10 advice): the sql fold emits sentinel -1 codes
    # for NULL / ragged / non-finite vectors; the kernel must land on
    # the SAME codes instead of crashing, or 'auto' dispatch makes the
    # same corpus encode at one scale and fail at another
    rows += [
        (400, None),                                     # NULL vector
        (401, []),                                       # empty
        (402, [1.0] * (dim // m)),                       # one block only
        (403, [0.5] * dim + [1.0]),                      # longer than dim
        (404, [float("nan")] + [0.5] * (dim - 1)),       # NaN element
        (405, [float("inf")] + [0.5] * (dim - 1)),       # inf element
        (406, [None] + [0.5] * (dim - 1)),               # NULL element
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    sql_codes = {r.vec_id: list(r.codes)
                 for r in pq_encode(df, cb, m=m, method="sql").collect()}
    blas_codes = {r.vec_id: list(r.codes)
                  for r in pq_encode(df, cb, m=m, method="blas").collect()}
    assert sql_codes == blas_codes
    assert blas_codes[5][0] == 9 and blas_codes[5][2] == 3  # tie -> low cid
    assert blas_codes[400] == [-1] * m and blas_codes[401] == [-1] * m
    assert blas_codes[402][0] != -1 and blas_codes[402][1:] == [-1] * (m - 1)
    assert blas_codes[404][0] == -1 and blas_codes[404][1] != -1

    sql_enc = {r.vec_id: (r.cell, list(r.codes))
               for r in ivf_pq_encode(df, cb, coarse, m=m, method="sql").collect()}
    blas_enc = {r.vec_id: (r.cell, list(r.codes))
                for r in ivf_pq_encode(df, cb, coarse, m=m, method="blas").collect()}
    assert sql_enc == blas_enc
