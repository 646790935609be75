"""LLM training-data pipeline queries over ``documents`` / ``embeddings``:
dedup (exact / MinHash-LSH / n-gram Jaccard / SimHash), similarity search
(brute-force + sign-LSH), text analysis (tokens / quality / language-ID /
fingerprints), multimodal column metadata.

Oracle SQL for the hash-based operators is generated from the same
parameters as the Spark side, so the two formulations cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disq_spark.functions import text as TX
from disq_spark.operators import dedup as DD
from disq_spark.operators import similarity as SIM
from disq_spark.queries.tables import load, table_count

QUERIES = {}
ORACLE = {}


def _q(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


# SQL fragment shared by every oracle below: normalized text + tokens.
# NOTE: DuckDB regexp_replace needs the 'g' flag (Spark replaces all
# occurrences by default).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# Parity with functions/text.py tokens(): empty text -> empty list, where
# DuckDB's string_split('', ' ') would return [''] (length 1).
_TOKS = f"(CASE WHEN {_NORM} = '' THEN [] ELSE string_split({_NORM}, ' ') END)"

SHINGLE_K = 8
SHINGLE_STRIDE = 4
NUM_HASHES = DD.DEFAULT_NUM_HASHES
BANDS = DD.DEFAULT_BANDS
MINHASH_THRESHOLD = 0.25
JACCARD_THRESHOLD = 0.15
# document-frequency cap: shingles in more than max(20, 1% of docs)
# documents are dropped (hot-key mitigation, same formula both engines).
# Measured at sf0.1: 1% cuts the candidate join 10x vs 4% with BETTER
# recall (dropping ubiquitous shingles shrinks Jaccard denominators, so
# true near-dups clear the threshold more easily).
MAX_DF_FRACTION = 0.01
MAX_DF_FLOOR = 20.0
# Absolute ceiling on shingle document frequency. Without it max_df grows
# linearly with corpus size and the inverted-index candidate join is
# O(sum df^2) = O((0.01 n)^2 per hot shingle) — measured 18x wall at 10x
# data (sf0.1 -> sf1); the cap makes candidate generation O(n * CAP) —
# linear — at any corpus size. It is a COST bound, not a free precision
# filter: the r10 planted-truth benchmark (tools/dedup_quality.py,
# SCALE.md §r10) measured that a duplicate CLUSTER larger than the cap
# pushes its own shingles past max_df, so the cap blinds the tier to
# exactly the heaviest dup clusters (recall 0.03-0.06 capped vs
# 0.41-0.73 uncapped on Zipf-clustered corpora, ~equal precision; on
# replica-structured corpora, where clusters never exceed the cap,
# recall is unaffected — the pre-r10 claim). Production guidance:
# minhash BANDING absorbs uncapped df (1 row/doc/band) — run it
# uncapped for quality and keep the cap for the O(df^2) inverted-index
# tiers (ngram/winnowing), whose uncapped path is the prefix filter.
MAX_DF_CAP = 100.0


# the corpus count is a full-scan ACTION at gate-BUILD time; bench's
# three passes re-invoke every gate, so it is memoized — since r11 via
# tables.table_count, whose key carries the parquet file's identity
# (mtime_ns, size) so a corpus REWRITTEN at the same dir mid-session
# gets a fresh count instead of a silently stale max_df (which would
# change dedup gate OUTPUT, not just timing). _N_DOCS_CACHE stays
# exported for the bench's memo-health telemetry.
from disq_spark.queries.tables import _COUNT_CACHE as _N_DOCS_CACHE  # noqa: E402


def _max_df(spark: SparkSession, sf_dir: str) -> float:
    n = table_count(spark, sf_dir, "documents")
    return min(max(MAX_DF_FLOOR, MAX_DF_FRACTION * n), MAX_DF_CAP)


_MAX_DF_SQL = (
    f"least(greatest({MAX_DF_FLOOR}, {MAX_DF_FRACTION} * (SELECT count(*) FROM documents)), "
    f"{MAX_DF_CAP})"
)


def _oracle_shingles() -> str:
    k, s = SHINGLE_K, SHINGLE_STRIDE
    return (
        f"list_distinct([substring({_NORM}, i * {s} + 1, {k}) "
        f"for i in generate_series(0, greatest(cast(floor((length({_NORM}) - {k}) / {s}) as int), 0))])"
    )


# shared CTE prefix: exploded shingles with the document-frequency cap.
# ``src`` parameterizes the corpus so composite pipelines (corpus_prep)
# can run the same minhash over a filtered CTE instead of the raw table;
# ``max_df_sql`` likewise so the cap is computed over that corpus.
def _oracle_sh_cte(src: str = "documents", max_df_sql: str | None = None) -> str:
    cap = max_df_sql or _MAX_DF_SQL
    return f"""
sh0 AS MATERIALIZED (
  SELECT doc_id, unnest({_oracle_shingles()}) AS shingle FROM {src}
),
rare AS (
  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {cap}
),
sh AS MATERIALIZED (
  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)
)"""


# ---------------------------------------------------------------------------
# text_token_stats — token counting + length stats per source
# ---------------------------------------------------------------------------
@_q("text_token_stats")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(TX.token_count(F.col("text"))), 4).alias("avg_tokens"),
            F.round(F.avg(F.length(TX.normalize(F.col("text")))), 4).alias("avg_chars"),
            F.sum(TX.token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("source")
    )


ORACLE["text_token_stats"] = f"""
SELECT source, count(*) AS n_docs,
       round(avg(len({_TOKS})), 4) AS avg_tokens,
       round(avg(length({_NORM})), 4) AS avg_chars,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_bpe_stats — BPE-ish subword token counting (words / digit runs /
# punctuation marks over normalized text), the cost estimator a training
# pipeline budgets with; compared against whitespace tokens per source.
# ---------------------------------------------------------------------------
@_q("text_bpe_stats")
def text_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bpe = TX.bpe_token_count(F.col("text"))
    ws = TX.token_count(F.col("text"))
    return (
        d.groupBy("source")
        .agg(
            F.sum(bpe).alias("total_bpe"),
            F.round(F.avg(bpe), 4).alias("avg_bpe"),
            F.round(F.avg(bpe / F.greatest(ws, F.lit(1))), 4).alias("bpe_per_word"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# bpe_apply_tokens — REAL BPE: train a merge table from the corpus's
# word-frequency table (one distributed job + driver-side Sennrich
# merges), then segment every document with the rank-greedy inference
# rule, distributed (Arrow-batched, word-memoized). FULL DuckDB oracle:
# train+apply re-expressed as unrolled merge stages + a rank-recursion
# (operators/bpe.py bpe_oracle_ctes — merge-all is a string left-fold,
# rank-greedy == sequential rank order), hash-compared per document;
# additionally pinned by the serial differential
# (tests/test_text.py::test_bpe_apply_matches_serial_reference).
# ---------------------------------------------------------------------------
BPE_GATE_MERGES = 120


@_q("bpe_apply_tokens")
def bpe_apply_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.bpe import (
        apply_bpe,
        assert_merges_oracle_consistent,
        train_bpe,
    )

    d = load(spark, sf_dir, "documents")
    merges = train_bpe(d, n_merges=BPE_GATE_MERGES)
    # the rank-recursion oracle is only sound for collision-free merge
    # tables (see assert_merges_oracle_consistent) — fail LOUDLY here
    # rather than let the gate false-fail on a diverging segmentation
    assert_merges_oracle_consistent(merges)
    # source rides through the kernel (carry) — no join back against
    # the corpus, the shape that survives 100 TB
    seg = apply_bpe(d, merges, carry=("source",))
    per_doc = seg.select(
        "doc_id",
        "source",
        "n_tokens",
        F.md5(F.concat_ws("\x1f", F.col("tokens"))).alias("h"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("n_tokens").alias("total_bpe_applied"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", F.col("doc_id").cast("string"), "h")
                        )
                    ),
                )
            ).alias("seg_md5"),
        )
        .orderBy("source")
    )


def _bpe_oracle_prefix() -> str:
    from disq_spark.operators.bpe import bpe_oracle_ctes

    return "WITH RECURSIVE " + bpe_oracle_ctes(BPE_GATE_MERGES)


ORACLE["bpe_apply_tokens"] = f"""{_bpe_oracle_prefix()},
perdoc_src AS (
  SELECT p.doc_id, d.source, p.n_tokens, p.h
  FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id
)
SELECT source,
       CAST(sum(n_tokens) AS BIGINT) AS total_bpe_applied,
       md5(string_agg(doc_id || ':' || h, ',' ORDER BY doc_id || ':' || h)) AS seg_md5
FROM perdoc_src GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# crawl_pipeline_full — the WHOLE crawl tier composed end-to-end, one
# gate: sharded .warc.gz ingestion (member-snap splits) -> HTTP
# message split -> declared-charset body decode (latin-1 / utf-8 /
# charset-less legs) -> line-based boilerplate removal -> Unicode NFC
# (one leg's marker is DECOMPOSED so normalization materially matters)
# -> quality filter -> exact dedup. The oracle rebuilds the expected
# text from the raw documents table through the mirrored SQL chain
# (list_filter boilerplate, nfc_normalize, quality, sha256 dedup) —
# every tier must invert/compose exactly or the hash gate fails.
# ---------------------------------------------------------------------------
_FULL_SHARDS = 4


@_q("crawl_pipeline_full")
def crawl_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.functions import boilerplate as BP
    from disq_spark.functions import http as HT
    from disq_spark.functions.charset import decode_payload
    from disq_spark.functions.unicode import nfc_normalize_col
    from disq_spark.operators.dedup import exact_dedup
    from disq_spark.sources.warc import read_warc

    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-full-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warcfull_{key}")

    def _build(tmp: str) -> None:
        from disq_spark.formats.warc import build_warc

        legs = {
            0: ("iso-8859-1", "text/plain; charset=ISO-8859-1", " café-é."),
            1: ("utf-8", 'text/plain; charset="utf-8"', " café-😀."),
            # DECOMPOSED marker: e/é as base + combining acute
            2: ("utf-8", "text/plain", " cafe\u0301-e\u0301."),
        }
        writers = [
            open(os.path.join(tmp, f"part-{i:04d}.warc.gz"), "wb")
            for i in range(_FULL_SHARDS)
        ]
        try:
            it = (
                load(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
                .toLocalIterator()
            )
            for r in it:
                codec, ct, mark = legs[r.doc_id % 3]
                body_text = (
                    "We use cookies to track you\n"
                    + r.text
                    + mark
                    + "\nAll Rights Reserved"
                )
                body = body_text.encode(codec)
                payload = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
                rec = (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:doc:{r.doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"https://corpus.local/doc/{r.doc_id}",
                        "Content-Type": "application/http; msgtype=response",
                    },
                    payload,
                )
                writers[r.doc_id % _FULL_SHARDS].write(
                    build_warc([rec], gzip_members=True)
                )
        finally:
            for w in writers:
                w.close()

    ensure_cached_dir(cache, _build)
    df = read_warc(spark, cache, split_size=4096)
    body = HT.http_body(F.col("payload"))
    ctype = HT.http_content_type(F.col("payload"))
    docs = df.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        BP.remove_boilerplate_lines(decode_payload(body, ctype)).alias("text"),
    )
    docs = nfc_normalize_col(docs, "text")
    good = docs.filter(TX.quality_score(F.col("text")) >= CRAWL_QUALITY_MIN)
    kept = exact_dedup(good, "text", "doc_id")
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("n_copies").alias("n_good"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string"))))
        ).alias("kept_ids_md5"),
    )


def _full_pipeline_oracle() -> str:
    from disq_spark.functions.boilerplate import remove_boilerplate_sql

    # legs: 0/1 carry composed markers, leg 2 a DECOMPOSED one (base
    # letters + chr(769) combining acute) that NFC must compose back
    mark = (
        "CASE doc_id % 3 WHEN 0 THEN ' café-é.' "
        "WHEN 1 THEN ' café-😀.' "
        "ELSE ' cafe' || chr(769) || '-e' || chr(769) || '.' END"
    )
    page = (
        f"'We use cookies to track you' || chr(10) || documents.text || {mark} "
        f"|| chr(10) || 'All Rights Reserved'"
    )
    return f"""
WITH cleaned AS (
  SELECT doc_id, nfc_normalize({remove_boilerplate_sql(page)}) AS text
  FROM documents
),
good AS (
  SELECT doc_id, text FROM cleaned WHERE ({_QUALITY_SQL}) >= {CRAWL_QUALITY_MIN}
),
kept AS (
  SELECT min(doc_id) AS doc_id, count(*) AS n_copies
  FROM good GROUP BY sha256({_NORM})
)
SELECT cast(count(*) AS BIGINT) AS n_kept,
       cast(sum(n_copies) AS BIGINT) AS n_good,
       md5(string_agg(cast(doc_id AS VARCHAR), ',' ORDER BY cast(doc_id AS VARCHAR))) AS kept_ids_md5
FROM kept
"""


# (ORACLE["crawl_pipeline_full"] is assigned at the end of this module:
# the oracle builder references _QUALITY_SQL, defined further down.)


# ---------------------------------------------------------------------------
# crawl_robots_filter — robots.txt enforcement end-to-end: per-host
# robots payloads are PARSED (user-agent groups, Allow/Disallow,
# comments, empty-Disallow) and pages filtered by longest-prefix-match
# with Allow winning ties. The oracle never sees the robots text — it
# recomputes allowed-ness independently from the corpus-generation
# arithmetic, so parser AND enforcement must both be right.
#   hosts: site{doc_id%6}.example.com
#   robots per host h: disallow /private/; allow /private/ok/ when h
#   is even; host 5 has an irrelevant agent group only (no '*' rules).
#   pages: doc_id%4==0 -> /private/a{id}, %4==1 -> /private/ok/b{id},
#          %4==2 -> /public/c{id},      %4==3 -> /
# ---------------------------------------------------------------------------
@_q("crawl_robots_filter")
def crawl_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.robots import apply_robots, robots_rules

    d = load(spark, sf_dir, "documents").select("doc_id")
    h = (F.col("doc_id") % 6).cast("int")
    hostname = F.concat(F.lit("site"), h.cast("string"), F.lit(".example.com"))
    path = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/private/a"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/private/ok/b"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/public/c"), F.col("doc_id").cast("string")))
        .otherwise(F.lit("/"))
    )
    pages = d.select(
        "doc_id", F.concat(F.lit("https://"), hostname, path).alias("url")
    )
    robots_txt = []
    for hh in range(6):
        if hh == 5:
            txt = "User-agent: SpecialBot\nDisallow: /\n"  # no '*' group
        else:
            txt = (
                "# robots for tests\nUser-agent: GoogleBot\nUser-agent: *\n"
                "Disallow: /private/\n"
            )
            if hh % 2 == 0:
                txt += "Allow: /private/ok/\n"
            txt += "\nUser-agent: OtherBot\nDisallow: /\n"
        robots_txt.append((f"site{hh}.example.com", txt))
    robots_df = spark.createDataFrame(robots_txt, "host string, payload string")
    rules = robots_rules(robots_df)
    kept = apply_robots(pages, rules, "url")
    return kept.agg(
        F.count("*").alias("n_allowed"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string"))))
        ).alias("allowed_md5"),
    )


ORACLE["crawl_robots_filter"] = """
WITH verdicts AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 6 = 5 THEN TRUE            -- no '*' rules
           WHEN doc_id % 4 = 0 THEN FALSE           -- /private/ disallowed
           WHEN doc_id % 4 = 1 THEN (doc_id % 6) % 2 = 0  -- /private/ok/ allowed on even hosts
           ELSE TRUE                                -- /public/ and /
         END AS allowed
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_allowed,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR))) AS allowed_md5
FROM verdicts WHERE allowed
"""


# ---------------------------------------------------------------------------
# text_classifier_score — fastText-shaped quality-head INFERENCE (the
# scoring path that runs over the full corpus; training is offline):
# md5-hashed bag-of-tokens -> bucket weights -> sigmoid of the mean.
# Fixed deterministic weights; the oracle mirrors bucket arithmetic,
# list indexing, and the sigmoid, so the score hash-matches.
# ---------------------------------------------------------------------------
_CLF_BUCKETS = 64
_CLF_BIAS = -0.1


@_q("text_classifier_score")
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.classifier import deterministic_weights, hashed_linear_score

    from disq_spark.functions.classifier import score_hashed_linear

    w = deterministic_weights(_CLF_BUCKETS)
    d = load(spark, sf_dir, "documents")
    # size-dispatched: HOF fold small, Arrow kernel at scale (sf5: 75.8
    # -> ~8 s; paths round-identical, pinned by test)
    scored = score_hashed_linear(
        d.select("source", "text"), w, bias=_CLF_BIAS
    ).select("source", "score")
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("n_pass"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("source")
    )


def _clf_oracle() -> str:
    from disq_spark.functions.classifier import deterministic_weights, hashed_linear_score_sql

    w = deterministic_weights(_CLF_BUCKETS)
    score = hashed_linear_score_sql(_TOKS, w, bias=_CLF_BIAS)
    return f"""
WITH scored AS (SELECT source, {score} AS score FROM documents)
SELECT source, count(*) AS n_docs,
       round(avg(score), 6) AS avg_score,
       CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(min(score), 6) AS min_score,
       round(max(score), 6) AS max_score
FROM scored GROUP BY source ORDER BY source
"""


ORACLE["text_classifier_score"] = _clf_oracle()


# ---------------------------------------------------------------------------
# link_pagerank — host/page ranking over the crawl link graph (Common
# Crawl publishes exactly this as its host ranking; pipelines use it as
# a sampling-quality prior). Synthetic deterministic graph from doc_ids
# with dangling nodes (every 17th page has no out-links) so the
# dangling-mass redistribution is exercised; the oracle unrolls the
# identical power iteration as chained CTEs. Rounded to 6 decimals —
# float sums agree at that rounding across engines (in-degree <= ~9
# terms per node per iteration).
# ---------------------------------------------------------------------------
_PR_CAP = 400
_PR_ITERS = 12


def _pr_edges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _PR_CAP)
    links = F.array(
        *[
            (F.col("doc_id") * a + c) % _PR_CAP
            for a, c in ((7, 1), (13, 5), (3, 11))
        ]
    )
    return (
        d.filter(F.col("doc_id") % 17 != 0)  # every 17th page is dangling
        .select(F.col("doc_id").alias("src"), F.explode(links).alias("dst"))
    )


@_q("link_pagerank")
def link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.graph import pagerank

    pr = pagerank(
        _pr_edges_spark(spark, sf_dir), damping=0.85, iters=_PR_ITERS
    )
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(25)
    )


def _pagerank_oracle() -> str:
    from disq_spark.operators.graph import pagerank_sql_ctes

    edges_cte = f"""edges AS (
  SELECT DISTINCT src AS u, dst AS v FROM (
    SELECT doc_id AS src, (doc_id * 7 + 1) % {_PR_CAP} AS dst
    FROM documents WHERE doc_id < {_PR_CAP} AND doc_id % 17 != 0
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 5) % {_PR_CAP}
    FROM documents WHERE doc_id < {_PR_CAP} AND doc_id % 17 != 0
    UNION ALL
    SELECT doc_id, (doc_id * 3 + 11) % {_PR_CAP}
    FROM documents WHERE doc_id < {_PR_CAP} AND doc_id % 17 != 0
  )
)"""
    return f"""
WITH {pagerank_sql_ctes(edges_cte, 0.85, _PR_ITERS)}
SELECT node, round(rank, 6) AS rank
FROM pr_final ORDER BY round(rank, 6) DESC, node LIMIT 25
"""


ORACLE["link_pagerank"] = _pagerank_oracle()


# ---------------------------------------------------------------------------
# dedup_lsh_recall — measure, don't guess: recall/precision of the
# MinHash+LSH candidate pipeline against EXACT shingle-set Jaccard on
# a bounded slice, as one oracle-checked gate. Both sides are fully
# SQL-expressible (the minhash CTE chain and the inverted-index
# Jaccard share the same shingle CTE), so the quality numbers
# themselves are hash-verified — the operator's recall claim is a
# checked artifact, not a notebook anecdote.
# ---------------------------------------------------------------------------
_LSH_EVAL_CAP = 300


@_q("dedup_lsh_recall")
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _LSH_EVAL_CAP)
    exact = DD.ngram_jaccard_pairs(
        d, "text", "doc_id", threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K, stride=SHINGLE_STRIDE, max_df=None,
    ).select("id_a", "id_b")
    approx = DD.minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        threshold=MINHASH_THRESHOLD, k=SHINGLE_K, stride=SHINGLE_STRIDE,
        max_df=None,
    ).select("id_a", "id_b")
    hit = approx.intersect(exact)
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(approx.agg(F.count("*").alias("n_approx")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
        .select(
            "n_exact",
            "n_approx",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
            F.round(F.col("n_hit") / F.col("n_approx"), 4).alias("precision"),
        )
    )


def _lsh_recall_oracle() -> str:
    src = f"(SELECT * FROM documents WHERE doc_id < {_LSH_EVAL_CAP}) AS d"
    return f"""
WITH {_minhash_pair_ctes(src, max_df_sql="1000000000")},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
             JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) >= {MINHASH_THRESHOLD}
),
approx AS (SELECT id_a, id_b FROM pairs),
hit AS (SELECT id_a, id_b FROM approx INTERSECT SELECT id_a, id_b FROM exact)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM approx) AS n_approx,
       (SELECT count(*) FROM hit) AS n_hit,
       round((SELECT count(*) FROM hit) * 1.0 / (SELECT count(*) FROM exact), 4) AS recall,
       round((SELECT count(*) FROM hit) * 1.0 / (SELECT count(*) FROM approx), 4) AS precision
"""


# (ORACLE["dedup_lsh_recall"] assigned at end of module: the builder
# references _minhash_pair_ctes, defined further down.)


# ---------------------------------------------------------------------------
# dedup_paragraphs — cross-document repeated-paragraph removal (the
# C4/RefinedWeb boilerplate pass): each doc becomes three paragraphs —
# its own text (unique), a shared banner drawn from a 5-variant pool
# (repeated across ~100 docs -> removed), and a per-doc tail (unique).
# Exactly the shared paragraph must vanish from every page; order and
# original (un-normalized) text of survivors must be preserved. Oracle
# mirrors with generate_series indexing + string_agg ORDER BY.
# ---------------------------------------------------------------------------
@_q("dedup_paragraphs")
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    banner = F.concat(
        F.lit("Shared Site Banner Variant "), (F.col("doc_id") % 5).cast("string")
    )
    page = F.concat_ws(
        "\n\n",
        F.col("text"),
        banner,
        F.concat(F.lit("Unique tail for page "), F.col("doc_id").cast("string")),
    )
    pages = d.select("doc_id", page.alias("text"))
    cleaned = DD.remove_duplicate_paragraphs(pages, "text", "doc_id", min_docs=2)
    return cleaned.select(
        "doc_id",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("clean_md5"),
        "n_paragraphs",
        "n_removed",
    ).orderBy("doc_id")


ORACLE["dedup_paragraphs"] = """
WITH pages AS (
  SELECT doc_id,
         text || chr(10) || chr(10) ||
         'Shared Site Banner Variant ' || CAST(doc_id % 5 AS VARCHAR) ||
         chr(10) || chr(10) ||
         'Unique tail for page ' || CAST(doc_id AS VARCHAR) AS page
  FROM documents
),
split_p AS (SELECT doc_id, string_split(page, chr(10) || chr(10)) AS parts FROM pages),
paras AS (
  SELECT doc_id, i AS idx, parts[i] AS para,
         sha256(trim(regexp_replace(lower(parts[i]), '\\s+', ' ', 'g'))) AS h
  FROM split_p, unnest(generate_series(1, len(parts))) AS t(i)
),
hot AS (SELECT h FROM paras GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
flagged AS (SELECT p.*, (p.h IN (SELECT h FROM hot)) AS is_hot FROM paras p)
SELECT doc_id,
       md5(coalesce(string_agg(CASE WHEN NOT is_hot THEN para END,
                               chr(10) || chr(10) ORDER BY idx), '')) AS clean_md5,
       count(*) AS n_paragraphs,
       CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# crawl_boilerplate_removal — the CCNet-shaped line-cleaning tier:
# each doc becomes a multi-line page with injected cookie-banner /
# copyright / nav-crumb lines; the per-line predicate chain (marker
# phrases + short-line-without-terminal-punctuation) must strip
# exactly the injected lines. Spark runs split->filter->array_join
# HOFs; the oracle runs the mirrored string_split->list_filter chain.
# ---------------------------------------------------------------------------
@_q("crawl_boilerplate_removal")
def crawl_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions import boilerplate as BP

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    page = F.concat(
        F.lit("We use cookies to improve your experience\n"),
        F.lit("Home | News | Sports\n"),  # short nav crumb, no terminal punct
        F.col("text"),
        F.lit("\nShort header line?\n"),  # short BUT terminal punct -> kept
        F.lit("Subscribe to our newsletter\n"),
        F.lit("© 2026 corpus.local — All Rights Reserved"),
    )
    pages = d.select("doc_id", page.alias("page"))
    cleaned = pages.select(
        "doc_id",
        BP.line_count(F.col("page")).alias("n_lines"),
        BP.kept_line_count(F.col("page")).alias("n_kept"),
        F.md5(
            F.encode(BP.remove_boilerplate_lines(F.col("page")), "UTF-8")
        ).alias("clean_md5"),
    )
    return cleaned.orderBy("doc_id")


def _boilerplate_oracle() -> str:
    from disq_spark.functions.boilerplate import (
        kept_line_count_sql,
        line_count_sql,
        remove_boilerplate_sql,
    )

    page = (
        "'We use cookies to improve your experience' || chr(10) || "
        "'Home | News | Sports' || chr(10) || text || chr(10) || "
        "'Short header line?' || chr(10) || "
        "'Subscribe to our newsletter' || chr(10) || "
        "'© 2026 corpus.local — All Rights Reserved'"
    )
    return f"""
WITH pages AS (SELECT doc_id, {page} AS page FROM documents)
SELECT doc_id,
       CAST({line_count_sql("page")} AS BIGINT) AS n_lines,
       CAST({kept_line_count_sql("page")} AS BIGINT) AS n_kept,
       md5({remove_boilerplate_sql("page")}) AS clean_md5
FROM pages ORDER BY doc_id
"""


ORACLE["crawl_boilerplate_removal"] = _boilerplate_oracle()


# ---------------------------------------------------------------------------
# crawl_url_stats — host/TLD extraction + domain blocklist filtering,
# the first crawl aggregation after ingestion. URLs are synthesized
# deterministically from doc_id with userinfo/port/path/query traps;
# Spark extracts with functions/url.py, the oracle with the mirrored
# DuckDB regexes; the blocklist drops exact hosts AND their subdomains
# via a broadcast anti-join.
# ---------------------------------------------------------------------------
_URL_BLOCKED = ("spam7.example.net", "site3.example.com")


@_q("crawl_url_stats")
def crawl_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions import url as U

    d = load(spark, sf_dir, "documents").select("doc_id")
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")), (F.col("doc_id") % 3 + 1).cast("int")
    )
    sub = F.when(F.col("doc_id") % 7 == 0, F.lit("www.")).otherwise(F.lit(""))
    userinfo = F.when(F.col("doc_id") % 11 == 0, F.lit("user:pw@")).otherwise(F.lit(""))
    port = F.when(F.col("doc_id") % 5 == 0, F.lit(":8443")).otherwise(F.lit(""))
    host_core = F.concat(
        F.when(F.col("doc_id") % 13 == 7, F.lit("spam")).otherwise(F.lit("site")),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(".example."),
        tld,
    )
    url = F.concat(
        F.lit("https://"), userinfo, sub, host_core, port,
        F.lit("/p/"), F.col("doc_id").cast("string"), F.lit("?q=1#frag"),
    )
    pages = d.select("doc_id", url.alias("url"))
    kept = U.filter_blocked_hosts(pages, "url", _URL_BLOCKED)
    return (
        kept.groupBy(U.registered_domain(F.col("url")).alias("domain"))
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct(U.url_host(F.col("url"))).alias("n_hosts"),
            F.countDistinct(U.url_tld(F.col("url"))).alias("n_tlds"),
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list(U.url_path(F.col("url")))))
            ).alias("paths_md5"),
        )
        .orderBy("domain")
    )


def _url_oracle() -> str:
    from disq_spark.functions.url import url_host_sql, url_path_sql, url_tld_sql

    blocked = ", ".join(f"'{h}'" for h in _URL_BLOCKED)
    host = url_host_sql("url")
    sub_pred = " OR ".join(
        f"{host} = '{h}' OR {host} LIKE '%.{h}'" for h in _URL_BLOCKED
    )
    return f"""
WITH pages AS (
  SELECT doc_id,
         'https://' ||
         CASE WHEN doc_id % 11 = 0 THEN 'user:pw@' ELSE '' END ||
         CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
         CASE WHEN doc_id % 13 = 7 THEN 'spam' ELSE 'site' END ||
         CAST(doc_id % 10 AS VARCHAR) || '.example.' ||
         CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END ||
         CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END ||
         '/p/' || CAST(doc_id AS VARCHAR) || '?q=1#frag' AS url
  FROM documents
),
kept AS (
  SELECT * FROM pages WHERE NOT ({sub_pred})
)
SELECT regexp_extract({host}, '([a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS domain,
       count(*) AS n_pages,
       count(DISTINCT {host}) AS n_hosts,
       count(DISTINCT {url_tld_sql("url")}) AS n_tlds,
       md5(string_agg({url_path_sql("url")}, ',' ORDER BY {url_path_sql("url")})) AS paths_md5
FROM kept GROUP BY 1 ORDER BY domain
"""


ORACLE["crawl_url_stats"] = _url_oracle()


# ---------------------------------------------------------------------------
# text_nfc_dedup — Unicode normalization ahead of hashing: composed
# (U+00E9) and decomposed (e + U+0301) forms of the same text hash
# differently, so un-normalized exact dedup splits equal documents.
# The gate doubles each doc into an NFC twin and an NFD twin (built
# with explicit combining characters on both engines), normalizes with
# the Arrow kernel (Python unicodedata), and exact-dedups: every pair
# must collapse. Oracle = DuckDB nfc_normalize (utf8proc) — two
# independent UAX #15 implementations must hash-agree on every doc.
# ---------------------------------------------------------------------------
@_q("text_nfc_dedup")
def text_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.unicode import nfc_normalize_col

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    nfc_twin = d.select(
        (F.col("doc_id") * 2).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" café Ångström")).alias("text"),
    )
    nfd_twin = d.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" café Ångström")  # SAME glyphs, DECOMPOSED code points (e+U+0301 etc.)
        ).alias("text"),
    )
    both = nfc_twin.unionByName(nfd_twin)
    norm = nfc_normalize_col(both, "text", out_col="norm_text")
    per_doc = norm.select("doc_id", F.md5(F.encode(F.col("norm_text"), "UTF-8")).alias("h"))
    # every (2k, 2k+1) twin pair must share a hash after normalization
    return per_doc.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("h").alias("n_distinct_norm"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", F.col("doc_id").cast("string"), "h"))))
        ).alias("all_md5"),
    )


ORACLE["text_nfc_dedup"] = """
WITH both_t AS (
  SELECT doc_id * 2 AS doc_id,
         text || ' café Ångström' AS text FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1 AS doc_id,
         text || ' cafe' || chr(769) || ' A' || chr(778) || 'ngstro' || chr(776) || 'm' AS text
  FROM documents
),
normed AS (SELECT doc_id, md5(nfc_normalize(text)) AS h FROM both_t)
SELECT count(*) AS n_rows,
       count(DISTINCT h) AS n_distinct_norm,
       md5(string_agg(doc_id || ':' || h, ',' ORDER BY doc_id || ':' || h)) AS all_md5
FROM normed
"""


# ---------------------------------------------------------------------------
# pack_sequences_bpe — the packing pipeline on REAL token counts: the
# whitespace-token packing gate (pack_sequences_stats) budgets context
# windows in the wrong unit; a production tape is cut in model tokens.
# train_bpe -> apply_bpe(n_tokens) -> pack_sequences composition.
# FULL oracle: the bpe_oracle_ctes perdoc counts feed the same
# hash-order window-cumsum packing SQL as pack_sequences_stats.
# ---------------------------------------------------------------------------
@_q("pack_sequences_bpe")
def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators import sampling as SP2
    from disq_spark.operators.bpe import (
        apply_bpe,
        assert_merges_oracle_consistent,
        train_bpe,
    )

    d = load(spark, sf_dir, "documents")
    merges = train_bpe(d, n_merges=BPE_GATE_MERGES)
    assert_merges_oracle_consistent(merges)  # oracle soundness precondition
    seg = apply_bpe(d, merges).select("doc_id", "n_tokens")
    p = SP2.pack_sequences(seg, 512, "n_tokens", "doc_id", n_shards=8)
    return (
        p.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_bpe_tokens"),
            (F.max("pack_id") + 1).alias("n_packs"),
            F.round(
                F.sum("n_tokens") / ((F.max("pack_id") + 1) * 512.0), 4
            ).alias("fill"),
        )
        .orderBy("shard")
    )


def _pack_bpe_oracle() -> str:
    from disq_spark.operators.sampling import shard_sql

    return f"""{_bpe_oracle_prefix()},
base AS (
  SELECT doc_id, n_tokens,
         CAST({shard_sql("doc_id", 8)} AS INT) AS shard,
         substring(md5('' || doc_id), 1, 16) AS __ord
  FROM perdoc
),
packed AS (
  SELECT shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY __ord, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS tape_offset
  FROM base
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST(max(CAST(floor(tape_offset / 512) AS BIGINT)) + 1 AS BIGINT) AS n_packs,
       round(sum(n_tokens) / ((max(CAST(floor(tape_offset / 512) AS BIGINT)) + 1) * 512.0), 4) AS fill
FROM packed GROUP BY shard ORDER BY shard
"""


ORACLE["pack_sequences_bpe"] = _pack_bpe_oracle()


_BPE = f"regexp_extract_all({_NORM}, '[a-z]+|[0-9]+|[^a-z0-9 ]')"

ORACLE["text_bpe_stats"] = f"""
SELECT source,
       CAST(sum(len({_BPE})) AS BIGINT) AS total_bpe,
       round(avg(len({_BPE})), 4) AS avg_bpe,
       round(avg(len({_BPE}) * 1.0 / greatest(len({_TOKS}), 1)), 4) AS bpe_per_word
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_quality — composite quality score per doc (top 25 by score)
# ---------------------------------------------------------------------------
@_q("text_quality")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.round(TX.quality_score(F.col("text")), 4).alias("quality"),
            TX.token_count(F.col("text")).alias("n_tokens"),
        )
        .orderBy(F.desc("quality"), "doc_id")
        .limit(25)
    )


_SW_EN = "('the','a','of','and','to','in','is')"
_QUALITY_SQL = f"""
  0.4 * least(len({_TOKS}) / 100.0, 1.0)
+ 0.4 * least((len(list_filter({_TOKS}, t -> t IN {_SW_EN}))
               / greatest(len({_TOKS}), 1)) / 0.4, 1.0)
+ 0.2 * (1 - CASE WHEN length({_NORM}) = 0 THEN 0.0
               ELSE length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g')) * 1.0 / length({_NORM}) END)
"""

ORACLE["text_quality"] = f"""
SELECT doc_id, round({_QUALITY_SQL}, 4) AS quality, len({_TOKS}) AS n_tokens
FROM documents ORDER BY quality DESC, doc_id LIMIT 25
"""


# ---------------------------------------------------------------------------
# lang_id_breakdown — heuristic language ID vs the labeled lang column
# ---------------------------------------------------------------------------
@_q("lang_id_breakdown")
def lang_id_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("labeled"), TX.lang_id(F.col("text")).alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("labeled", "predicted")
    )


def _lang_id_sql() -> str:
    score = {
        lang: f"len(list_filter({_TOKS}, t -> t IN ({', '.join(repr(w) for w in TX.STOPWORDS[lang])})))"
        for lang in TX.LANG_ORDER
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = __best AND __best > 0 THEN '{lang}'" for lang in TX.LANG_ORDER
    )
    return f"(SELECT CASE {cases} ELSE 'und' END FROM (SELECT {best} AS __best) __b)"


ORACLE["lang_id_breakdown"] = f"""
SELECT lang AS labeled, {_lang_id_sql()} AS predicted, count(*) AS n
FROM documents GROUP BY 1, 2 ORDER BY labeled, predicted
"""


# ---------------------------------------------------------------------------
# doc_fingerprint_summary — md5 fingerprints, corpus-level dedup stats
# ---------------------------------------------------------------------------
@_q("doc_fingerprint_summary")
def doc_fingerprint_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(TX.fingerprint(F.col("text"))).alias("n_unique"),
        F.min(TX.fingerprint(F.col("text"))).alias("min_fp"),
        F.max(TX.fingerprint(F.col("text"))).alias("max_fp"),
    )


ORACLE["doc_fingerprint_summary"] = f"""
SELECT count(*) AS n_docs,
       count(DISTINCT md5({_NORM})) AS n_unique,
       min(md5({_NORM})) AS min_fp,
       max(md5({_NORM})) AS max_fp
FROM documents
"""


# ---------------------------------------------------------------------------
# dedup_exact — sha256 exact dedup, kept-representative rows
# ---------------------------------------------------------------------------
@_q("dedup_exact")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = DD.exact_dedup(d, "text", "doc_id")
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("n_copies").alias("n_total"),
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)).alias("n_removed"),
    )


ORACLE["dedup_exact"] = f"""
WITH g AS (
  SELECT sha256({_NORM}) AS h, min(doc_id) AS doc_id, count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT count(*) AS n_kept, CAST(sum(n_copies) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM g
"""


# ---------------------------------------------------------------------------
# dedup_exact_keep_rows — the "give me the surviving documents" call as
# one operator: min_by(struct) carries the representative's full row
# through the single hash shuffle (no groupBy-then-rejoin second pass)
# ---------------------------------------------------------------------------
@_q("dedup_exact_keep_rows")
def dedup_exact_keep_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = DD.exact_dedup(d, "text", "doc_id", keep_rows=True)
    return (
        kept.filter(F.col("doc_id") < 40)
        .select("doc_id", "source", "n_copies")
        .orderBy("doc_id")
    )


ORACLE["dedup_exact_keep_rows"] = f"""
WITH h AS (SELECT doc_id, source, sha256({_NORM}) AS h FROM documents),
g AS (SELECT doc_id, source,
             min(doc_id) OVER (PARTITION BY h) AS mn,
             count(*) OVER (PARTITION BY h) AS n_copies
      FROM h)
SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies
FROM g WHERE doc_id = mn AND doc_id < 40 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# dedup_minhash_lsh — MinHash+LSH near-dup pairs
# ---------------------------------------------------------------------------
@_q("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
    ).orderBy("id_a", "id_b")


def _minhash_pair_ctes(src: str = "documents", max_df_sql: str | None = None) -> str:
    """CTE chain ``sh0, rare, sh, sig, buckets, cand, pairs`` computing
    the thresholded minhash near-dup pairs of ``src`` — composable into
    larger pipelines (corpus_prep) or wrapped standalone below."""
    rows_per_band = NUM_HASHES // BANDS
    P = DD.MINHASH_PRIME
    mh_cols = ", ".join(
        f"min(({a} * h + {b}) % {P}) AS mh_{i}"
        for i, (a, b) in enumerate(DD.minhash_params(NUM_HASHES))
    )
    band_selects = []
    for b in range(BANDS):
        parts = " || '|' || ".join(
            f"CAST(mh_{i} AS VARCHAR)"
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS band_key FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    eq_sum = " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
    )
    return f"""{_oracle_sh_cte(src, max_df_sql)},
shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {P} AS h FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id, {mh_cols} FROM shh GROUP BY doc_id
),
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
pairs AS MATERIALIZED (
  SELECT c.id_a, c.id_b, round(({eq_sum}) / {float(NUM_HASHES)}, 4) AS est_jaccard
  FROM cand c JOIN sig a ON c.id_a = a.doc_id JOIN sig b ON c.id_b = b.doc_id
  WHERE round(({eq_sum}) / {float(NUM_HASHES)}, 4) >= {MINHASH_THRESHOLD}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_pair_ctes()}
SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b
"""


ORACLE["dedup_minhash_lsh"] = _minhash_oracle()


# ---------------------------------------------------------------------------
# dedup_clusters — transitive closure of the minhash near-dup pairs:
# connected components (min-id label propagation) so each duplicate
# CLUSTER keeps exactly one representative. Spark side iterates
# DataFrame joins (operators/dedup.duplicate_components); the oracle is
# a recursive CTE computing min reachable id — the declarative statement
# of the same fixpoint.
# ---------------------------------------------------------------------------
@_q("dedup_clusters")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
    )
    return DD.duplicate_components(pairs).orderBy("node")


def _label_prop_stmts(edges_table: str, prefix: str, rounds: int = 48) -> tuple[list[str], str, str]:
    """Min-label propagation with pointer jumping over ``edges_table``
    (undirected: both (a,b) and (b,a) present), unrolled as temp-table
    rounds. Returns (statements, final_label_table, unconverged_predicate).

    A recursive-CTE reachability closure materializes every
    (node, reaching-label) pair — O(cluster_size^2) rows with a global
    UNION dedup per iteration — which ground for 45+ minutes at sf1.
    Each round here is linear in |edges|: a node takes the min of its
    own label, its neighbors' labels, and its LABEL'S label (pointer
    jump), so convergence needs only O(log diameter)-ish rounds; the sf5
    pair graph (136k nodes) needed 28, so 48 gives two decades of slack
    at 0.1 s/round. Callers use the unconverged
    predicate to emit a poison row if the rounds were ever insufficient,
    failing the gate loudly instead of passing on a stale labeling."""
    stmts = [
        f"""CREATE OR REPLACE TEMP TABLE {prefix}_lbl_0 AS
SELECT DISTINCT a AS node, a AS comp FROM {edges_table};"""
    ]
    for r in range(rounds):
        prev, cur = f"{prefix}_lbl_{r % 2}", f"{prefix}_lbl_{(r + 1) % 2}"
        stmts.append(
            f"""CREATE OR REPLACE TEMP TABLE {cur} AS
SELECT node, min(comp) AS comp FROM (
  SELECT node, comp FROM {prev}
  UNION ALL
  SELECT e.a AS node, l.comp FROM {edges_table} e JOIN {prev} l ON l.node = e.b
  UNION ALL
  SELECT l.node, p.comp FROM {prev} l JOIN {prev} p ON p.node = l.comp
) GROUP BY node;"""
        )
    last = f"{prefix}_lbl_{rounds % 2}"
    # Fixpoint needs BOTH terms: pointer stability (no node whose label's
    # label is smaller) AND edge agreement (no edge whose endpoints hold
    # different root labels — both sides can individually satisfy
    # comp(comp)=comp while still disagreeing, which pointer stability
    # alone would miss and silently emit a wrong labeling).
    #
    # The edge-agreement term is materialized FIRST through pure
    # equality joins: written inline, `la.comp <> lb.comp` is an
    # inequality predicate between the two label tables, and DuckDB's
    # join-order search may pick la-lb as the first pair — a 250k x 250k
    # inequality join that spilled 76 GB and OOM-killed the sf5 replica
    # before ever touching the (tiny) edge table. With the comp pairs
    # materialized per edge (|edges| rows), the inequality degrades to a
    # scan filter and the probe is O(|edges|).
    stmts.append(
        f"""CREATE OR REPLACE TEMP TABLE {prefix}_edgecomp AS
SELECT la.comp AS ca, lb.comp AS cb FROM {edges_table} e
JOIN {last} la ON la.node = e.a
JOIN {last} lb ON lb.node = e.b;"""
    )
    unconverged = (
        f"(EXISTS (SELECT 1 FROM {last} l JOIN {last} p "
        f"ON p.node = l.comp AND p.comp < l.comp) "
        f"OR EXISTS (SELECT 1 FROM {prefix}_edgecomp WHERE ca <> cb))"
    )
    return stmts, last, unconverged


def _clusters_oracle() -> str:
    """Connected components as iterative label propagation (DuckDB
    executes the statement list and returns the last SELECT)."""
    edges = f"""CREATE OR REPLACE TEMP TABLE __dc_edges AS
WITH {_minhash_pair_ctes()}
SELECT id_a AS a, id_b AS b FROM pairs
UNION
SELECT id_b AS a, id_a AS b FROM pairs;"""
    prop, last, unconverged = _label_prop_stmts("__dc_edges", "__dc")
    final = f"""SELECT node, CAST(comp AS BIGINT) AS comp FROM {last}
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) WHERE {unconverged}
ORDER BY node;"""
    return "\n".join([edges] + prop + [final])


ORACLE["dedup_clusters"] = _clusters_oracle()


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard — exact shingle-set Jaccard on candidate pairs
# ---------------------------------------------------------------------------
@_q("dedup_ngram_jaccard")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        d,
        "text",
        "doc_id",
        threshold=JACCARD_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
    ).orderBy("id_a", "id_b")


@_q("dedup_ngram_jaccard_prefix")
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-family prefix-filtered variant — same output rows as
    dedup_ngram_jaccard (it shares that gate's oracle verbatim):
    candidates come only from rarest-token prefixes and verification is
    an array intersect per pair. A second independently-shaped
    implementation hash-gated against the same oracle. Operator default
    is prefix_filter="auto" since r9: prefix on exactly when max_df is
    None (measured ~2x faster on uncapped-df Zipfian text, SCALE.md
    §r9 probe; pure overhead under a cap, §r8 probe) — this gate pins
    True, the base gate's capped call resolves to the baseline path."""
    d = load(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        d,
        "text",
        "doc_id",
        threshold=JACCARD_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
        prefix_filter=True,
    ).orderBy("id_a", "id_b")


ORACLE["dedup_ngram_jaccard"] = f"""
WITH {_oracle_sh_cte()},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) >= {JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""

# the prefix-filtered variant produces the SAME rows — one oracle, two
# independently-shaped Spark plans both hash-gated against it
ORACLE["dedup_ngram_jaccard_prefix"] = ORACLE["dedup_ngram_jaccard"]


# ---------------------------------------------------------------------------
# forced-kernel gates: every size-dispatched operator has an Arrow/numpy
# path that 'auto' NEVER picks at the driver's sf0.01 check scale — so a
# numpy-path divergence (exactly the r8-advice np.round half-to-even
# finding) is invisible to the default gates. Each *_blas gate forces
# method="blas" and shares its base gate's oracle verbatim: the kernel
# must be bit-identical to the SQL path or the hash gate fails at ANY
# scale the driver runs.
# ---------------------------------------------------------------------------
@_q("dedup_minhash_lsh_blas")
def dedup_minhash_lsh_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(
        d, "text", "doc_id",
        num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K, stride=SHINGLE_STRIDE, max_df=_max_df(spark, sf_dir),
        method="blas",
    ).orderBy("id_a", "id_b")


@_q("ann_cosine_topk_blas")
def ann_cosine_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return SIM.cosine_topk(e, q, k=5, method="blas").orderBy("query_id", "rank")


@_q("dedup_embedding_cosine_blas")
def dedup_embedding_cosine_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    bits = SIM.scale_n_bits(table_count(spark, sf_dir, "embeddings"), target_bucket_size=EMB_DEDUP_TARGET)
    return SIM.embedding_neardup_pairs(
        e, threshold=EMB_DEDUP_THRESHOLD, n_bits=bits, method="blas"
    ).orderBy("id_a", "id_b")


@_q("text_classifier_score_blas")
def text_classifier_score_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.classifier import (
        deterministic_weights,
        score_hashed_linear,
    )

    w = deterministic_weights(_CLF_BUCKETS)
    d = load(spark, sf_dir, "documents")
    scored = score_hashed_linear(
        d.select("source", "text"), w, bias=_CLF_BIAS, method="blas"
    ).select("source", "score")
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("n_pass"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("source")
    )


@_q("dedup_semantic_blas")
def dedup_semantic_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators import similarity as SIM2
    from disq_spark.operators.sampling import uniform_sql

    e = load(spark, sf_dir, "embeddings")
    rate = min(1.0, float(SEMDEDUP_GATE_CAP) / table_count(spark, sf_dir, "embeddings"))
    e = e.filter(F.expr(uniform_sql("vec_id", SEMDEDUP_SEED)) < rate)
    return SIM2.semantic_dedup_pairs(
        e,
        threshold=SEMDEDUP_THRESHOLD,
        k=SEMDEDUP_K,
        iters=KMEANS_ITERS,
        round_centroids=KMEANS_ROUND,
        method="blas",
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# dedup_simhash — 64-bit simhash per doc (first 50 docs for output size).
# Bit 63 rides the sign bit via two's complement (+(-2^63)), so every
# intermediate stays inside int64 in both engines.
# ---------------------------------------------------------------------------
@_q("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return DD.simhash(d, "text", "doc_id", bits=64).orderBy("doc_id")


def _simhash_total_sql(bits: int) -> str:
    parts = []
    for j in range(bits):
        w = DD._simhash_weight(j)
        lit = "(-9223372036854775807 - 1)" if w < 0 else str(w)
        parts.append(f"(CASE WHEN s_{j} > 0 THEN {lit} ELSE 0 END)")
    return " + ".join(parts)


def _simhash_oracle(bits: int = 64) -> str:
    hex_chars = (bits + 3) // 4
    terms = DD._simhash_bit_terms(bits)
    sums = ", ".join(f"sum({t}) AS s_{j}" for j, t in enumerate(terms))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
  FROM documents WHERE doc_id < 50
),
th AS (SELECT doc_id, substring(md5(tok), 1, {hex_chars}) AS th FROM toks),
s AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
SELECT doc_id, cast({_simhash_total_sql(bits)} AS bigint) AS simhash
FROM s ORDER BY doc_id
"""


ORACLE["dedup_simhash"] = _simhash_oracle()


# ---------------------------------------------------------------------------
# ann_cosine_topk — brute-force cosine top-5 for query vectors (vec_id < 5)
# ---------------------------------------------------------------------------
@_q("ann_cosine_topk")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return SIM.cosine_topk(e, q, k=5).orderBy("query_id", "rank")


_DOT = (
    "list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]))"
)
_NORM_Q = "sqrt(list_sum(list_transform(qv, x -> x * x)))"
_NORM_C = "sqrt(list_sum(list_transform(cv, x -> x * x)))"

ORACLE["ann_cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_DOT} / ({_NORM_Q} * {_NORM_C}) AS score
  FROM q, c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cast(rank AS int) AS rank, round(score, 4) AS score
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# ann_signlsh_topk — sign-bucket LSH approximate neighbors
# ---------------------------------------------------------------------------
@_q("ann_signlsh_topk")
def ann_signlsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return SIM.signlsh_topk(e, q, k=5, n_bits=6).orderBy("query_id", "rank")


def _bucket_sql(vec: str, n_bits: int = 6) -> str:
    return (
        "("
        + " + ".join(f"(CASE WHEN {vec}[{i + 1}] >= 0.0 THEN {2 ** i} ELSE 0 END)" for i in range(n_bits))
        + ")"
    )


ORACLE["ann_signlsh_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         {_bucket_sql('embedding')} AS bucket
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
         {_bucket_sql('embedding')} AS bucket
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, {_DOT} / ({_NORM_Q} * {_NORM_C}) AS score
  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cast(rank AS int) AS rank, round(score, 4) AS score
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# dedup_embedding_cosine — embedding-cosine near-dup pairs, LSH-bucketed
# (the embedding analog of dedup_minhash_lsh; same bucket family as
# ann_signlsh_topk so the oracle replicates the bucketing exactly)
# ---------------------------------------------------------------------------
EMB_DEDUP_THRESHOLD = 0.3
# bits auto-scale with corpus size so expected bucket population stays
# ~EMB_DEDUP_TARGET (pairs per vector bounded -> LINEAR total candidate
# count at any corpus size; the previous pinned n_bits=6 made the
# within-bucket self-join quadratic across SFs — measured 58x wall at
# 10x data). The oracle computes the SAME formula in SQL from count(*).
EMB_DEDUP_TARGET = 32


@_q("dedup_embedding_cosine")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    bits = SIM.scale_n_bits(table_count(spark, sf_dir, "embeddings"), target_bucket_size=EMB_DEDUP_TARGET)
    return SIM.embedding_neardup_pairs(
        e, threshold=EMB_DEDUP_THRESHOLD, n_bits=bits
    ).orderBy("id_a", "id_b")


_DOT_AB = "list_sum(list_transform(generate_series(1, len(av)), i -> av[i] * bv[i]))"
_NORM_A = "sqrt(list_sum(list_transform(av, x -> x * x)))"
_NORM_B = "sqrt(list_sum(list_transform(bv, x -> x * x)))"

# variable-width sign bucket: same bit order as _bucket_sql / sign_bucket
# (bit i-1 = sign of dim i), width read from the bits CTE.
_VBUCKET = (
    "CAST(list_sum([CASE WHEN {vec}[i] >= 0.0 THEN CAST(pow(2, i - 1) AS BIGINT) "
    "ELSE 0 END for i in generate_series(1, (SELECT b FROM bits))]) AS BIGINT)"
)

ORACLE["dedup_embedding_cosine"] = f"""
WITH bits AS (
  SELECT greatest(4, least(24, CAST(ceil(log2(greatest(count(*) / {EMB_DEDUP_TARGET}.0, 1.0))) AS INT))) AS b
  FROM embeddings
),
a AS (
  SELECT vec_id AS id_a, embedding::DOUBLE[] AS av,
         {_VBUCKET.format(vec='embedding')} AS bucket
  FROM embeddings
),
b AS (
  SELECT vec_id AS id_b, embedding::DOUBLE[] AS bv,
         {_VBUCKET.format(vec='embedding')} AS bucket
  FROM embeddings
),
scored AS (
  SELECT id_a, id_b, round({_DOT_AB} / ({_NORM_A} * {_NORM_B}), 4) AS score
  FROM a JOIN b USING (bucket) WHERE id_a < id_b
)
SELECT id_a, id_b, score FROM scored
WHERE score >= {EMB_DEDUP_THRESHOLD} ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# embedding_label_stats — per-label vector stats (norms in double)
# ---------------------------------------------------------------------------
@_q("embedding_label_stats")
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    norm = SIM._norm(F.col("embedding"))
    return (
        e.groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg(norm), 4).alias("avg_norm"))
        .orderBy("label")
    )


ORACLE["embedding_label_stats"] = """
SELECT label, count(*) AS n,
       round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


# ---------------------------------------------------------------------------
# text_entropy — character-level Shannon entropy per document: the
# low-entropy detector for repetitive/degenerate text (compression-ratio
# proxy that stays in pure SQL). One explode + one (doc, char) partial
# aggregation; empty documents drop out.
# ---------------------------------------------------------------------------
@_q("text_entropy")
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.length("text").alias("len"), F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "len", "ch").agg(F.count("*").alias("c"))
    p = F.col("c") * 1.0 / F.col("len")
    return (
        counts.groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.count("*").alias("n_distinct_chars"),
        )
        .orderBy("doc_id")
    )


ORACLE["text_entropy"] = """
WITH chars AS (
  SELECT doc_id, length(text) AS len, unnest(string_split(text, '')) AS ch
  FROM documents
),
counts AS (
  SELECT doc_id, len, ch, count(*) AS c
  FROM chars WHERE ch <> '' GROUP BY doc_id, len, ch
)
SELECT doc_id,
       round(-sum((c * 1.0 / len) * ln(c * 1.0 / len)), 4) AS entropy,
       count(*) AS n_distinct_chars
FROM counts GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# doc_chunking_stats — fixed-size overlapping chunking (embedding / RAG
# preprocessing): per-corpus chunk counts and sizes. Exact integer
# window arithmetic; oracle replays it.
# ---------------------------------------------------------------------------
CHUNK_SIZE = 200
CHUNK_OVERLAP = 40


@_q("doc_chunking_stats")
def doc_chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.chunking import chunk_documents

    d = load(spark, sf_dir, "documents")
    c = chunk_documents(d, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
    return c.agg(
        F.count("*").alias("total_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg(F.length("chunk_text")), 4).alias("avg_chunk_len"),
        F.max("chunk_index").alias("max_chunk_index"),
    )


_CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP
ORACLE["doc_chunking_stats"] = f"""
WITH c AS (
  SELECT doc_id,
         unnest(generate_series(0,
           greatest(0, (length(text) - {CHUNK_SIZE} + {_CHUNK_STRIDE} - 1) // {_CHUNK_STRIDE}))) AS chunk_index,
         text
  FROM documents
)
SELECT count(*) AS total_chunks, count(DISTINCT doc_id) AS n_docs,
       round(avg(length(substring(text, chunk_index * {_CHUNK_STRIDE} + 1, {CHUNK_SIZE}))), 4) AS avg_chunk_len,
       cast(max(chunk_index) AS BIGINT) AS max_chunk_index
FROM c
"""


# ---------------------------------------------------------------------------
# text_unigram_nll — perplexity-style quality scoring with a corpus-fit
# unigram LM: pass 1 aggregates token frequencies (one partial-agg
# shuffle on token), pass 2 joins log-probs back onto doc tokens and
# averages per doc. The canonical cheap stand-in for model-based
# perplexity filtering; at 100 TB the vocab table is ~millions of rows
# (broadcastable) and everything else is scan + one (doc, token) agg.
# ---------------------------------------------------------------------------
@_q("text_unigram_nll")
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log(F.col("c") * F.lit(1.0) / F.col("total"))).alias("nll")
    )
    # no broadcast hint on the vocab join: at corpus scale the distinct
    # vocabulary can exceed the broadcast threshold, and AQE already
    # broadcasts it when it is small (as at gate SF)
    per_tok = toks.join(lp, "tok")
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


ORACLE["text_unigram_nll"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT cast(sum(c) AS BIGINT) AS total FROM vocab),
lp AS (SELECT tok, -ln(c * 1.0 / total) AS nll FROM vocab, tot)
SELECT doc_id, count(*) AS n_tokens, round(avg(nll), 4) AS avg_nll
FROM toks JOIN lp USING (tok)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_bigram_perplexity — the CCNet-style perplexity filter upgraded
# to a CONDITIONAL bigram LM with add-k smoothing (operators/lm.py):
# P(w2|w1) = (c12 + k) / (c1 + k*V), doc score = exp(mean NLL). Two
# corpus count aggregations + join-based scoring; single-token docs
# surface with null scores, not fabricated ones.
# ---------------------------------------------------------------------------
_LM_K = 0.5


@_q("text_bigram_perplexity")
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.lm import bigram_perplexity

    d = load(spark, sf_dir, "documents")
    return bigram_perplexity(d, add_k=_LM_K).orderBy("doc_id")


_BIGRAM_CTES = f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg0 AS (
  SELECT doc_id, [{{'w1': t[i], 'w2': t[i+1]}} for i in generate_series(1, len(t)-1)] AS pairs
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2
       FROM (SELECT doc_id, unnest(pairs) AS p FROM bg0)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
voc AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(t) AS tok FROM toks)),
nlls AS (
  SELECT bg.doc_id, -ln((c12.c12 + {_LM_K}) / (c1.c1 + {_LM_K} * voc.v)) AS nll
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), voc
),
per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 4) AS avg_nll,
         round(exp(avg(nll)), 3) AS perplexity
  FROM nlls GROUP BY doc_id
)"""

ORACLE["text_bigram_perplexity"] = f"""
WITH {_BIGRAM_CTES}
SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams, p.avg_nll, p.perplexity
FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# text_classifier_train — TRAINING the hashed linear quality head
# (functions/classifier.py train_hashed_logreg): full-batch logistic
# gradient descent, label = (lang = 'en'), per-iteration rounded so the
# unrolled-CTE DuckDB oracle runs the identical recurrence (k-means /
# PageRank pattern). Inference (text_classifier_score) + this close the
# classifier loop: train on a labeled slice, score the corpus.
# ---------------------------------------------------------------------------
CLF_TRAIN_BUCKETS = 64
CLF_TRAIN_ITERS = 3
CLF_TRAIN_LR = 1.0


@_q("text_classifier_train")
def text_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.classifier import train_hashed_logreg

    d = load(spark, sf_dir, "documents").withColumn(
        "y", (F.col("lang") == "en").cast("double")
    )
    w, b = train_hashed_logreg(
        d, "y", n_buckets=CLF_TRAIN_BUCKETS, iters=CLF_TRAIN_ITERS, lr=CLF_TRAIN_LR
    )
    rows = [(j, float(x)) for j, x in enumerate(w)] + [(-1, float(b))]
    return spark.createDataFrame(rows, "bucket long, weight double").orderBy("bucket")


def _clf_train_oracle() -> str:
    from disq_spark.functions.classifier import train_hashed_logreg_sql

    return train_hashed_logreg_sql(
        "(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)",
        _TOKS,
        n_buckets=CLF_TRAIN_BUCKETS,
        iters=CLF_TRAIN_ITERS,
        lr=CLF_TRAIN_LR,
    )


ORACLE["text_classifier_train"] = _clf_train_oracle()


# ---------------------------------------------------------------------------
# text_classifier_train_score — the composed loop: TRAIN the head on the
# corpus labels, then SCORE the corpus with the trained weights (what a
# filtering pipeline actually ships). The oracle re-runs the training
# recurrence AND the scoring join in one statement, so weights are never
# copied between engines — each derives its own.
# ---------------------------------------------------------------------------


@_q("text_classifier_train_score")
def text_classifier_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.classifier import (
        score_hashed_linear,
        train_hashed_logreg,
    )

    d = load(spark, sf_dir, "documents").withColumn(
        "y", (F.col("lang") == "en").cast("double")
    )
    w, b = train_hashed_logreg(
        d, "y", n_buckets=CLF_TRAIN_BUCKETS, iters=CLF_TRAIN_ITERS, lr=CLF_TRAIN_LR
    )
    scored = score_hashed_linear(d, w, bias=b)
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("n_positive"),
            F.round(
                F.avg(
                    F.when(F.col("y") == (F.col("score") >= 0.5).cast("double"), 1.0)
                    .otherwise(0.0)
                ),
                4,
            ).alias("train_accuracy"),
        )
        .orderBy("source")
    )


def _clf_train_score_oracle() -> str:
    train = _clf_train_oracle()
    # reuse the training CTE chain: strip the final SELECT, keep WITH ...
    ctes = train[: train.rindex("\nSELECT")]
    last_w = f"w{CLF_TRAIN_ITERS}"
    last_b = f"b{CLF_TRAIN_ITERS}"
    return f"""{ctes},
tok2 AS (
  SELECT base.d, len(base.toks) AS nd, unnest(base.toks) AS t FROM base
),
docw AS (
  SELECT tok2.d, sum({last_w}.w) / CAST(min(tok2.nd) AS DOUBLE) AS mw
  FROM tok2 JOIN {last_w}
    ON CAST(('0x' || substr(md5(tok2.t), 1, 15)) AS BIGINT) % {CLF_TRAIN_BUCKETS}
       = {last_w}.bucket
  GROUP BY tok2.d
),
scored AS (
  SELECT base.d, base.y,
         round(1.0 / (1.0 + exp(-((SELECT b FROM {last_b}) + coalesce(docw.mw, 0.0)))), 6) AS score
  FROM base LEFT JOIN docw USING (d)
)
SELECT doc.source, count(*) AS n_docs,
       round(avg(scored.score), 4) AS avg_score,
       CAST(sum(CASE WHEN scored.score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
       round(avg(CASE WHEN scored.y = (CASE WHEN scored.score >= 0.5 THEN 1.0 ELSE 0.0 END)
                      THEN 1.0 ELSE 0.0 END), 4) AS train_accuracy
FROM scored JOIN documents doc ON scored.d = doc.doc_id
GROUP BY doc.source ORDER BY doc.source
"""


ORACLE["text_classifier_train_score"] = _clf_train_score_oracle()


# ---------------------------------------------------------------------------
# crawl_url_canonicalize — URL canonicalization as the URL-dedup pre-pass
# (functions/url.py canonicalize_url): two deliberately different
# spellings of every page (mixed-case scheme/host, default port, utm
# params, fragment vs the clean form) must collapse to ONE canonical URL;
# the gate counts the collapse and pins every canonical string.
# ---------------------------------------------------------------------------


@_q("crawl_url_canonicalize")
def crawl_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.url import canonicalize_url

    d = load(spark, sf_dir, "documents").select("doc_id")
    site = F.concat(F.lit("site"), (F.col("doc_id") % 10).cast("string"))
    path = F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
    q = (F.col("doc_id") % 5).cast("string")
    messy = F.concat(
        F.lit("HTTPS://"), F.upper(site), F.lit(".Example.COM:443"),
        path, F.lit("?utm_source=tw&q="), q, F.lit("&utm_medium=x#frag"),
    )
    clean = F.concat(
        F.lit("https://"), site, F.lit(".example.com"), path, F.lit("?q="), q
    )
    urls = d.select(messy.alias("url")).unionAll(d.select(clean.alias("url")))
    canon = urls.select(canonicalize_url(F.col("url")).alias("c"))
    return canon.agg(
        F.count("*").alias("n_raw"),
        F.countDistinct("c").alias("n_canonical"),
        F.md5(
            F.concat_ws("\n", F.array_sort(F.collect_set("c")))
        ).alias("canon_hash"),
    )


def _url_canon_oracle() -> str:
    from disq_spark.functions.url import canonicalize_url_sql

    gen = """
urls AS (
  SELECT 'HTTPS://' || upper('site' || CAST(doc_id % 10 AS VARCHAR)) ||
         '.Example.COM:443/p/' || CAST(doc_id AS VARCHAR) ||
         '?utm_source=tw&q=' || CAST(doc_id % 5 AS VARCHAR) ||
         '&utm_medium=x#frag' AS url
  FROM documents
  UNION ALL
  SELECT 'https://site' || CAST(doc_id % 10 AS VARCHAR) ||
         '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
         '?q=' || CAST(doc_id % 5 AS VARCHAR)
  FROM documents
)"""
    c = canonicalize_url_sql("url")
    return f"""
WITH {gen},
canon AS (SELECT {c} AS c FROM urls)
SELECT count(*) AS n_raw, count(DISTINCT c) AS n_canonical,
       md5(string_agg(DISTINCT c, chr(10) ORDER BY c)) AS canon_hash
FROM canon
"""


ORACLE["crawl_url_canonicalize"] = _url_canon_oracle()


# ---------------------------------------------------------------------------
# sql_api_text_stats — the SQL-only surface (functions/sqlapi.py): the
# ds_* SQL scalar functions (Spark 4 CREATE FUNCTION ... RETURN macros,
# JVM-side, zero Python) must produce the same numbers the Column API
# produces — here driven entirely through spark.sql, no DataFrame ops.
# ---------------------------------------------------------------------------


@_q("sql_api_text_stats")
def sql_api_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions.sqlapi import register_sql_functions

    register_sql_functions(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("sqlapi_documents")
    return spark.sql(
        """
        SELECT source,
               CAST(sum(ds_token_count(text)) AS BIGINT) AS total_tokens,
               CAST(sum(ds_bpe_token_count(text)) AS BIGINT) AS total_bpe,
               CAST(count(DISTINCT ds_fingerprint(text)) AS BIGINT) AS n_unique,
               CAST(sum(CASE WHEN ds_uniform(CAST(doc_id AS STRING), 's7') < 0.25
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM sqlapi_documents GROUP BY source ORDER BY source
        """
    )


def _sql_api_oracle() -> str:
    from disq_spark.operators.sampling import uniform_sql

    u = uniform_sql("CAST(doc_id AS VARCHAR)", "s7")
    return f"""
SELECT source,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
       CAST(sum(len({_BPE})) AS BIGINT) AS total_bpe,
       CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN {u} < 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents GROUP BY source ORDER BY source
"""


ORACLE["sql_api_text_stats"] = _sql_api_oracle()


# ---------------------------------------------------------------------------
# text_winnowing_fingerprints — MOSS winnowing (Schleimer et al. 2003):
# per-window rightmost-min selection over char k-gram hashes, the whole
# selection encoded as one int64 window MIN (operators/dedup.py
# winnowing_fingerprints) so the oracle is pure integer arithmetic.
# shared_fps counts each doc's fingerprints that also occur in ANOTHER
# doc — the locate-the-match signal winnowing exists for.
# ---------------------------------------------------------------------------
WINNOW_K = 8
WINNOW_W = 4


@_q("text_winnowing_fingerprints")
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fp = DD.winnowing_fingerprints(d, k=WINNOW_K, w=WINNOW_W)
    flag = fp.groupBy("fp").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_shared")
    )
    per_doc = (
        fp.join(flag, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fps"),
            F.sum(F.col("is_shared").cast("long")).alias("n_shared"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_fps").alias("total_fps"),
            F.sum("n_shared").alias("shared_fps"),
        )
        .orderBy("source")
    )


_WINNOW_FP_CTES = f"""t AS (
  SELECT doc_id, {_NORM} AS nt, length({_NORM}) - {WINNOW_K - 1} AS ng
  FROM documents
),
g AS (
  SELECT doc_id, ng, i AS pos,
         CAST(('0x' || substr(md5(substr(nt, i, {WINNOW_K})), 1, 10)) AS BIGINT)
           * {1 << 21} + ({(1 << 21) - 1} - i) AS key
  FROM t, unnest(generate_series(1, ng)) AS u(i)
  WHERE ng >= 1
),
sel AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, ng, pos,
           min(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS s
    FROM g
  ) WHERE pos <= ng - {WINNOW_W - 1}
),
fp AS (SELECT doc_id, s >> 21 AS fp FROM sel)"""

ORACLE["text_winnowing_fingerprints"] = f"""
WITH {_WINNOW_FP_CTES},
flag AS (SELECT fp, (min(doc_id) <> max(doc_id)) AS is_shared FROM fp GROUP BY fp),
per_doc AS (
  SELECT fp.doc_id, count(*) AS n_fps,
         CAST(sum(CASE WHEN flag.is_shared THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM fp JOIN flag USING (fp) GROUP BY fp.doc_id
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(per_doc.n_fps) AS BIGINT) AS total_fps,
       CAST(sum(per_doc.n_shared) AS BIGINT) AS shared_fps
FROM per_doc JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# dedup_winnowing_pairs — the MATCHING step of MOSS (operators/dedup.py
# winnowing_pairs): inverted-index self-join on fingerprint hashes with a
# document-frequency cap on boilerplate fps; each pair's n_shared counts
# distinct shared fingerprints (each a located shared substring).
# ---------------------------------------------------------------------------
WINNOW_MIN_SHARED = 2
WINNOW_MAX_DF = 20


@_q("dedup_winnowing_pairs")
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.winnowing_pairs(
        d, k=WINNOW_K, w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED, max_df=WINNOW_MAX_DF,
    ).orderBy("id_a", "id_b")


ORACLE["dedup_winnowing_pairs"] = f"""
WITH {_WINNOW_FP_CTES},
fpd AS (SELECT DISTINCT doc_id, fp FROM fp),
keep AS (SELECT fp FROM fpd GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}),
fpk AS (SELECT fpd.doc_id, fpd.fp FROM fpd JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# corpus_drift_kl — per-source distribution drift: KL(source || corpus)
# over add-1-smoothed unigram distributions on the corpus vocabulary
# (operators/lm.py corpus_kl_divergence). The drift monitor a curation
# pipeline runs when a new dump lands.
# ---------------------------------------------------------------------------


@_q("corpus_drift_kl")
def corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.lm import corpus_kl_divergence

    d = load(spark, sf_dir, "documents")
    return (
        corpus_kl_divergence(d, group_col="source")
        .select("source", "n_tokens", "vocab_used", F.round("kl", 4).alias("kl"))
        .orderBy("source")
    )


ORACLE["corpus_drift_kl"] = f"""
WITH tokrows AS (
  SELECT g, unnest(toks) AS tok
  FROM (SELECT source AS g, {_TOKS} AS toks FROM documents)
),
cw AS (SELECT tok, count(*) AS cw FROM tokrows GROUP BY tok),
cgw AS (SELECT g, tok, count(*) AS cgw FROM tokrows GROUP BY g, tok),
ng AS (SELECT g, count(*) AS ng FROM tokrows GROUP BY g),
sc AS (SELECT CAST(sum(cw) AS BIGINT) AS nc, count(*) AS v FROM cw),
grid AS (
  SELECT ng.g, ng.ng, cw.cw, coalesce(cgw.cgw, 0) AS cgw, sc.nc, sc.v
  FROM cw CROSS JOIN ng LEFT JOIN cgw ON cgw.g = ng.g AND cgw.tok = cw.tok, sc
),
per AS (
  SELECT g, sum(((cgw + 1.0) / (ng + 1.0 * v))
                * ln(((cgw + 1.0) / (ng + 1.0 * v))
                     / ((cw + 1.0) / (nc + 1.0 * v)))) AS kl
  FROM grid GROUP BY g
),
used AS (SELECT g, count(*) AS vocab_used FROM cgw GROUP BY g)
SELECT ng.g AS source, ng.ng AS n_tokens, used.vocab_used, round(per.kl, 4) AS kl
FROM ng JOIN used USING (g) JOIN per USING (g)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_collocations_pmi — phrase detection by pointwise mutual information
# over the corpus bigram distribution (operators/lm.py collocations_pmi).
# The ordering key is the INTEGER-product lift ratio, identical as a double
# in any engine, so the top-k cut is deterministic cross-engine.
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


@_q("text_collocations_pmi")
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.lm import collocations_pmi

    d = load(spark, sf_dir, "documents")
    return collocations_pmi(d, min_count=PMI_MIN_COUNT, top_k=PMI_TOP_K)


ORACLE["text_collocations_pmi"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg0 AS (
  SELECT doc_id, [{{'w1': t[i], 'w2': t[i+1]}} for i in generate_series(1, len(t)-1)] AS pairs
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT p.w1 AS w1, p.w2 AS w2
       FROM (SELECT unnest(pairs) AS p FROM bg0)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
h1 AS (SELECT w1, count(*) AS h1 FROM bg GROUP BY 1),
t2 AS (SELECT w2, count(*) AS t2 FROM bg GROUP BY 1),
n AS (SELECT count(*) AS n FROM bg),
scored AS (
  SELECT c12.w1, c12.w2, c12.c12,
         CAST(c12.c12 * n.n AS DOUBLE) / CAST(h1.h1 * t2.t2 AS DOUBLE) AS lift
  FROM c12 JOIN h1 USING (w1) JOIN t2 USING (w2), n
  WHERE c12.c12 >= {PMI_MIN_COUNT}
)
SELECT w1, w2, c12, round(lift, 6) AS lift_r, round(ln(lift), 6) AS pmi
FROM scored ORDER BY lift DESC, w1, w2 LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# text_perplexity_filter — the CCNet cut composed end-to-end: score the
# corpus with the bigram LM, estimate the keep-threshold from a
# deterministic hash-sample (no global sort), keep the LOW-perplexity
# side. The classic "drop the weird tail" pretraining filter as one
# declarative pipeline.
# ---------------------------------------------------------------------------
PPLF_PCT = 0.7
PPLF_RATE = 0.25


@_q("text_perplexity_filter")
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.lm import bigram_perplexity
    from disq_spark.operators.sampling import sampled_rank_threshold

    d = load(spark, sf_dir, "documents")
    scored = bigram_perplexity(d, add_k=_LM_K).filter(F.col("n_bigrams") > 0)
    thr = sampled_rank_threshold(
        scored, "perplexity", PPLF_PCT, "doc_id", PPLF_RATE
    )
    kept = scored.crossJoin(
        F.broadcast(thr.select(F.col("threshold").alias("__thr")))
    ).filter(F.col("perplexity") <= F.col("__thr"))
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.round(F.avg("perplexity"), 4).alias("avg_ppl"),
        F.round(F.max("__thr"), 3).alias("threshold"),
    )


def _pplf_oracle() -> str:
    from disq_spark.operators.sampling import uniform_sql

    return f"""
WITH {_BIGRAM_CTES},
sc AS (SELECT doc_id, perplexity FROM per_doc WHERE n_bigrams > 0),
s AS (SELECT perplexity, doc_id FROM sc WHERE {uniform_sql("doc_id")} < {PPLF_RATE}),
r AS (SELECT perplexity, row_number() OVER (ORDER BY perplexity, doc_id) AS rn,
             count(*) OVER () AS n FROM s),
t AS (SELECT max(thr) AS thr FROM (
      SELECT perplexity AS thr FROM r
      WHERE rn = greatest(1, cast(ceil({PPLF_PCT} * n) AS bigint))
      UNION ALL SELECT CAST('-infinity' AS DOUBLE)))
SELECT count(*) AS n_kept, round(avg(perplexity), 4) AS avg_ppl,
       round(max(thr), 3) AS threshold
FROM sc, t WHERE perplexity <= thr
"""


ORACLE["text_perplexity_filter"] = _pplf_oracle()


# ---------------------------------------------------------------------------
# text_repetition_stats — Gopher-style repetition signals: distinct-token
# ratio and the share of the most frequent bigram. High top-bigram share /
# low distinct ratio marks boilerplate and degenerate generations.
# One explode + one (doc_id, bigram) partial-agg groupBy — scan-bound.
# ---------------------------------------------------------------------------
@_q("text_repetition_stats")
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    bg = base.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    )
    bgc = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot"))
    )
    return (
        base.join(bgc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.round(
                F.when(F.size("toks") == 0, F.lit(1.0)).otherwise(
                    F.size(F.array_distinct("toks")) * F.lit(1.0) / F.size("toks")
                ),
                4,
            ).alias("distinct_ratio"),
            F.round(
                F.coalesce(F.col("top_c") * F.lit(1.0) / F.col("tot"), F.lit(0.0)), 4
            ).alias("top_bigram_share"),
        )
        .orderBy("doc_id")
    )


ORACLE["text_repetition_stats"] = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM base WHERE len(toks) >= 2
),
bgc AS (
  SELECT doc_id, max(c) AS top_c, cast(sum(c) AS BIGINT) AS tot
  FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram)
  GROUP BY doc_id
)
SELECT b.doc_id, len(toks) AS n_tokens,
       round(CASE WHEN len(toks) = 0 THEN 1.0
             ELSE len(list_distinct(toks)) * 1.0 / len(toks) END, 4) AS distinct_ratio,
       round(coalesce(top_c * 1.0 / tot, 0.0), 4) AS top_bigram_share
FROM base b LEFT JOIN bgc USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality_percentile_filter — keep the top quality quintile, threshold
# estimated from a deterministic hash-sample (scan-time filter; no
# global sort of the corpus). Rank-based threshold = an actual sample
# value, so both engines cut at the identical double.
# ---------------------------------------------------------------------------
QPF_PCT = 0.8
QPF_RATE = 0.2


@_q("quality_percentile_filter")
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.sampling import percentile_filter

    d = load(spark, sf_dir, "documents").select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    kept = percentile_filter(
        d, "quality", QPF_PCT, "doc_id", QPF_RATE, threshold_col="threshold"
    )
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.max("threshold"), 4).alias("threshold"),
    )


def _qpf_oracle(pct: float, rate: float) -> str:
    from disq_spark.operators.sampling import uniform_sql

    return f"""
WITH q AS (SELECT doc_id, ({_QUALITY_SQL}) AS quality FROM documents),
s AS (SELECT quality, doc_id FROM q WHERE {uniform_sql("doc_id")} < {rate}),
r AS (SELECT quality, row_number() OVER (ORDER BY quality, doc_id) AS rn,
             count(*) OVER () AS n FROM s),
t AS (SELECT max(thr) AS thr FROM (
      SELECT quality AS thr FROM r
      WHERE rn = greatest(1, cast(ceil({pct} * n) AS bigint))
      UNION ALL SELECT CAST('-infinity' AS DOUBLE)))
SELECT count(*) AS n_kept, round(avg(quality), 4) AS avg_quality,
       round(max(thr), 4) AS threshold
FROM q, t WHERE quality >= thr
"""


ORACLE["quality_percentile_filter"] = _qpf_oracle(QPF_PCT, QPF_RATE)


# ---------------------------------------------------------------------------
# corpus_mixing_weights — per-source token shares and the uniform-target
# mixing weight (weight > 1 = upsample, < 1 = downsample): the data-mixing
# step before stratified_sample draws the final blend.
# ---------------------------------------------------------------------------
@_q("corpus_mixing_weights")
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per = (
        d.select("source", TX.token_count(F.col("text")).alias("tk"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("tk").alias("tokens"))
    )
    tot = per.agg(
        F.sum("tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(F.col("tokens") / F.col("total_tokens"), 6).alias("share"),
            F.round(
                (F.lit(1.0) / F.col("n_sources"))
                / (F.col("tokens") / F.col("total_tokens")),
                4,
            ).alias("weight"),
        )
        .orderBy("source")
    )


ORACLE["corpus_mixing_weights"] = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs, cast(sum(len({_TOKS})) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (SELECT cast(sum(tokens) AS BIGINT) AS total_tokens, count(*) AS n_sources FROM per)
SELECT source, n_docs, tokens,
       round(tokens / total_tokens, 6) AS share,
       round((1.0 / n_sources) / (tokens / total_tokens), 4) AS weight
FROM per, tot ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_bm25_search — full-corpus BM25 (Okapi, Lucene idf) for a fixed
# query-term set; relevance filtering / quality-targeted selection
# primitive. Oracle generated from the same (terms, k1, b) parameters.
# ---------------------------------------------------------------------------
BM25_TERMS = ("join", "spark", "window")
BM25_K1 = 1.2
BM25_B = 0.75


@_q("text_bm25_search")
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.ranking import bm25

    d = load(spark, sf_dir, "documents")
    return bm25(d, BM25_TERMS, k1=BM25_K1, b=BM25_B)


def _bm25_oracle(terms, k1: float, b: float) -> str:
    in_list = ", ".join(repr(t) for t in sorted(set(terms)))
    return f"""
WITH base AS (
  SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS toks FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, dl, tok, cast(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
  WHERE tok IN ({in_list})
  GROUP BY doc_id, dl, tok
),
dft AS (SELECT tok, cast(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * ({k1} + 1)) / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))
           AS term_score
  FROM tf JOIN dft USING (tok), stats
)
SELECT doc_id, count(*) AS n_matched_terms, round(sum(term_score), 4) AS score
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


ORACLE["text_bm25_search"] = _bm25_oracle(BM25_TERMS, BM25_K1, BM25_B)


# ---------------------------------------------------------------------------
# embedding_kmeans — distributed Lloyd's k-means over the embedding column
# (cluster-based curation / data-mixing primitive). Oracle is the same
# iteration unrolled as DuckDB CTEs from the same (k, iters, rounding)
# parameters, so the two formulations cannot drift.
# ---------------------------------------------------------------------------
KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_ROUND = 6


@_q("embedding_kmeans")
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.clustering import kmeans_summary

    e = load(spark, sf_dir, "embeddings")
    return kmeans_summary(
        e, k=KMEANS_K, iters=KMEANS_ITERS, round_centroids=KMEANS_ROUND
    )


def _kmeans_cte_parts(k: int, iters: int, r: int, source: str = "embeddings") -> list:
    def dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    parts = [
        f"vecs AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM {source})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS c\n"
        f"  FROM (SELECT id, v FROM vecs ORDER BY id LIMIT {k}))",
    ]
    for t in range(iters):
        parts.append(
            f"a{t} AS (\n"
            f"  SELECT id, cid, v FROM (\n"
            f"    SELECT vecs.id, c{t}.cid, vecs.v,\n"
            f"           row_number() OVER (PARTITION BY vecs.id\n"
            f"             ORDER BY {dist('vecs.v', f'c{t}.c')}, c{t}.cid) AS rn\n"
            f"    FROM vecs, c{t}) WHERE rn = 1)"
        )
        parts.append(
            f"u{t} AS (SELECT cid, unnest(generate_series(1, len(v))) AS pos,\n"
            f"  unnest(v) AS x FROM a{t})"
        )
        parts.append(
            f"c{t + 1} AS (\n"
            f"  SELECT cid, list(x ORDER BY pos) AS c FROM (\n"
            f"    SELECT cid, pos, round(avg(x), {r}) AS x\n"
            f"    FROM u{t} GROUP BY cid, pos) GROUP BY cid)"
        )
    parts.append(
        f"afin AS (\n"
        f"  SELECT id, cid, dist FROM (\n"
        f"    SELECT vecs.id, c{iters}.cid,\n"
        f"           {dist('vecs.v', f'c{iters}.c')} AS dist,\n"
        f"           row_number() OVER (PARTITION BY vecs.id\n"
        f"             ORDER BY {dist('vecs.v', f'c{iters}.c')}, c{iters}.cid) AS rn\n"
        f"    FROM vecs, c{iters}) WHERE rn = 1)"
    )
    return parts


def _kmeans_oracle(k: int, iters: int, r: int) -> str:
    parts = _kmeans_cte_parts(k, iters, r)
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT cast(cid AS int) AS cid, count(*) AS n_members,\n"
        "       round(avg(dist), 4) AS inertia\n"
        "FROM afin GROUP BY cid ORDER BY cid"
    )


ORACLE["embedding_kmeans"] = _kmeans_oracle(KMEANS_K, KMEANS_ITERS, KMEANS_ROUND)


# ---------------------------------------------------------------------------
# ann_pq_topk — product-quantization ANN (operators/pq.py): per-subspace
# Lloyd's codebooks -> code assignment -> ADC top-k. Oracle unrolls the
# joint per-block k-means exactly like the embedding_kmeans CTEs (same
# seed/round discipline), then mirrors the in-plan ADC lookup table and
# the block-ORDERED distance fold (unordered SUM would be engine-order-
# sensitive on doubles).
# ---------------------------------------------------------------------------
PQ_M = 4
PQ_K = 8
PQ_ITERS = 2
PQ_ROUND = 6
PQ_TOPK = 5
PQ_NQ = 3


@_q("ann_pq_topk")
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.pq import pq_topk, train_pq

    e = load(spark, sf_dir, "embeddings")
    cb = train_pq(e, m=PQ_M, k=PQ_K, iters=PQ_ITERS, round_centroids=PQ_ROUND)
    qrows = e.orderBy("vec_id").limit(PQ_NQ).collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    res = pq_topk(e, cb, queries, topk=PQ_TOPK, m=PQ_M)
    return res.select(
        "q_id", "vec_id", F.round("adist", 4).alias("adist")
    ).orderBy("q_id", "adist", "vec_id")


def _sqdist_sql(a: str, b: str) -> str:
    """The same left-fold squared distance the k-means oracle uses."""
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_cte_parts(p: str, m: int, k: int, iters: int, r: int) -> list:
    """Unrolled per-block Lloyd's + final code assignment, all CTE names
    prefixed with ``p`` so a coarse (m=1) and a fine quantizer can
    coexist in one oracle (the IVF-PQ gate). Expects a CTE ``vecs(id,
    v)``. Produces ``{p}enc(id, block, cid)`` and ``{p}c{iters}(block,
    cid, c)``."""
    dist = _sqdist_sql
    parts = [
        # one row per (vector, subspace): sv = the block's slice
        f"""{p}bl AS (
  SELECT id, g.block,
         v[g.block * (len(v) // {m}) + 1 : (g.block + 1) * (len(v) // {m})] AS sv
  FROM vecs, LATERAL (SELECT unnest(generate_series(0, {m - 1})) AS block) g)""",
        f"{p}seed AS (SELECT id FROM vecs ORDER BY id LIMIT {k})",
        # cid = rank of the seed id within the block (same enumeration
        # as train_pq's k lowest-id vectors)
        f"""{p}c0 AS (
  SELECT {p}bl.block,
         row_number() OVER (PARTITION BY {p}bl.block ORDER BY {p}bl.id) - 1 AS cid,
         {p}bl.sv AS c
  FROM {p}bl JOIN {p}seed USING (id))""",
    ]
    for t in range(iters):
        parts.append(
            f"""{p}a{t} AS (
  SELECT id, block, sv, cid FROM (
    SELECT {p}bl.id, {p}bl.block, {p}bl.sv, {p}c{t}.cid,
           row_number() OVER (PARTITION BY {p}bl.id, {p}bl.block
             ORDER BY {dist(f'{p}bl.sv', f'{p}c{t}.c')}, {p}c{t}.cid) AS rn
    FROM {p}bl JOIN {p}c{t} ON {p}bl.block = {p}c{t}.block) WHERE rn = 1)"""
        )
        parts.append(
            f"""{p}u{t} AS (SELECT block, cid, unnest(generate_series(1, len(sv))) AS pos,
  unnest(sv) AS x FROM {p}a{t})"""
        )
        # a centroid that lost every member keeps its previous value
        # (train_pq's dict update has the same convention)
        parts.append(
            f"""{p}c{t + 1} AS (
  SELECT {p}c{t}.block, {p}c{t}.cid, coalesce(n.c, {p}c{t}.c) AS c
  FROM {p}c{t} LEFT JOIN (
    SELECT block, cid, list(x ORDER BY pos) AS c FROM (
      SELECT block, cid, pos, round(avg(x), {r}) AS x
      FROM {p}u{t} GROUP BY block, cid, pos) GROUP BY block, cid) n
  ON {p}c{t}.block = n.block AND {p}c{t}.cid = n.cid)"""
        )
    parts.append(
        f"""{p}enc AS (
  SELECT id, block, cid FROM (
    SELECT {p}bl.id, {p}bl.block, {p}c{iters}.cid,
           row_number() OVER (PARTITION BY {p}bl.id, {p}bl.block
             ORDER BY {dist(f'{p}bl.sv', f'{p}c{iters}.c')}, {p}c{iters}.cid) AS rn
    FROM {p}bl JOIN {p}c{iters} ON {p}bl.block = {p}c{iters}.block) WHERE rn = 1)"""
    )
    return parts


def _pq_oracle(m: int, k: int, iters: int, r: int, nq: int, topk: int) -> str:
    dist = _sqdist_sql
    parts = [
        "vecs AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
    ] + _pq_cte_parts("", m, k, iters, r)
    parts.append(
        f"""q AS (SELECT id AS q_id, block, sv AS qsv FROM bl
  WHERE id IN (SELECT id FROM vecs ORDER BY id LIMIT {nq}))"""
    )
    # the ADC lookup table, then the block-ORDERED fold per (q, id)
    parts.append(
        f"""lut AS (
  SELECT q.q_id, c.block, c.cid, {dist('q.qsv', 'c.c')} AS bd
  FROM q JOIN c{iters} c ON q.block = c.block)"""
    )
    parts.append(
        """sc AS (
  SELECT q_id, id, list_sum(list(bd ORDER BY enc.block)) AS adist
  FROM enc JOIN lut ON enc.block = lut.block AND enc.cid = lut.cid
  GROUP BY q_id, id)"""
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT q_id, id AS vec_id, round(adist, 4) AS adist FROM (
  SELECT q_id, id, adist,
         row_number() OVER (PARTITION BY q_id ORDER BY adist, id) AS rn
  FROM sc) WHERE rn <= {topk}
ORDER BY q_id, adist, vec_id"""
    )


ORACLE["ann_pq_topk"] = _pq_oracle(PQ_M, PQ_K, PQ_ITERS, PQ_ROUND, PQ_NQ, PQ_TOPK)


# ---------------------------------------------------------------------------
# ann_ivf_pq_topk — IVF-PQ search (operators/pq.py::ivf_pq_topk): probe
# nprobe nearest coarse cells per query, ADC only within them. The coarse
# quantizer is single-block PQ (train_pq m=1), so the oracle reuses the
# same unrolled-k-means CTE generator twice (prefixes g/<none>). With
# nprobe == coarse K the result equals ann_pq_topk (unit-tested).
# ---------------------------------------------------------------------------
IVFPQ_COARSE_K = 4
IVFPQ_COARSE_ITERS = 2
IVFPQ_NPROBE = 2


@_q("ann_ivf_pq_topk")
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.pq import ivf_pq_topk, train_pq

    e = load(spark, sf_dir, "embeddings")
    coarse = train_pq(
        e, m=1, k=IVFPQ_COARSE_K, iters=IVFPQ_COARSE_ITERS, round_centroids=PQ_ROUND
    )
    cb = train_pq(e, m=PQ_M, k=PQ_K, iters=PQ_ITERS, round_centroids=PQ_ROUND)
    qrows = e.orderBy("vec_id").limit(PQ_NQ).collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    res = ivf_pq_topk(
        e, cb, coarse, queries, nprobe=IVFPQ_NPROBE, topk=PQ_TOPK, m=PQ_M
    )
    return res.select(
        "q_id", "vec_id", F.round("adist", 4).alias("adist")
    ).orderBy("q_id", "adist", "vec_id")


def _ivf_pq_oracle(
    m: int, k: int, iters: int, r: int,
    ck: int, citers: int, nprobe: int, nq: int, topk: int,
) -> str:
    dist = _sqdist_sql
    parts = [
        "vecs AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
    ]
    parts += _pq_cte_parts("g", 1, ck, citers, r)   # coarse (single block)
    parts += _pq_cte_parts("", m, k, iters, r)       # fine codebooks
    parts.append(
        f"""qfull AS (SELECT id AS q_id, v FROM vecs
  WHERE id IN (SELECT id FROM vecs ORDER BY id LIMIT {nq}))"""
    )
    parts.append(
        f"""q AS (SELECT id AS q_id, block, sv AS qsv FROM bl
  WHERE id IN (SELECT id FROM vecs ORDER BY id LIMIT {nq}))"""
    )
    parts.append(
        f"""probe AS (
  SELECT q_id, cid AS cell FROM (
    SELECT qfull.q_id, g.cid,
           row_number() OVER (PARTITION BY qfull.q_id
             ORDER BY {dist('qfull.v', 'g.c')}, g.cid) AS rn
    FROM qfull JOIN gc{citers} g ON g.block = 0) WHERE rn <= {nprobe})"""
    )
    parts.append(
        """cand AS (SELECT p.q_id, e.id FROM probe p
  JOIN genc e ON e.cid = p.cell)"""
    )
    parts.append(
        f"""lut AS (
  SELECT q.q_id, c.block, c.cid, {dist('q.qsv', 'c.c')} AS bd
  FROM q JOIN c{iters} c ON q.block = c.block)"""
    )
    parts.append(
        """sc AS (
  SELECT cand.q_id, cand.id, list_sum(list(bd ORDER BY enc.block)) AS adist
  FROM cand JOIN enc ON enc.id = cand.id
  JOIN lut ON lut.q_id = cand.q_id AND lut.block = enc.block AND lut.cid = enc.cid
  GROUP BY cand.q_id, cand.id)"""
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT q_id, id AS vec_id, round(adist, 4) AS adist FROM (
  SELECT q_id, id, adist,
         row_number() OVER (PARTITION BY q_id ORDER BY adist, id) AS rn
  FROM sc) WHERE rn <= {topk}
ORDER BY q_id, adist, vec_id"""
    )


ORACLE["ann_ivf_pq_topk"] = _ivf_pq_oracle(
    PQ_M, PQ_K, PQ_ITERS, PQ_ROUND,
    IVFPQ_COARSE_K, IVFPQ_COARSE_ITERS, IVFPQ_NPROBE, PQ_NQ, PQ_TOPK,
)


# ---------------------------------------------------------------------------
# ann_pq_stored_topk / ann_ivf_pq_stored_topk — the SERVING shape of the
# PQ tier (r9 verdict #3): encode ONCE (pq_encode / ivf_pq_encode, both
# zero-shuffle ingest projections), MATERIALIZE the codes, then search
# the stored codes — pq_topk(codes_df=...) / ivf_pq_topk(encoded_df=...).
# This is the path users should actually run at scale (measured 2.45 s
# stored vs 31.6 s in-plan at 100k vectors, SCALE.md §r9: encoding is
# the dominant cost and belongs at ingest, not per query). Same oracle
# SQL as the in-plan gates — stored-vs-in-plan must be bit-identical,
# and hash-matching both against ONE oracle is exactly that statement.
# The persisted codes register in the dedup module's tracked-cache
# registry so the replica/bench release them per gate like every other
# materialized dedup intermediate.
# ---------------------------------------------------------------------------
def _pq_stored(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    from disq_spark.operators.dedup import _persist_tracked
    from disq_spark.operators.pq import pq_encode, pq_topk, train_pq

    e = load(spark, sf_dir, "embeddings")
    cb = train_pq(e, m=PQ_M, k=PQ_K, iters=PQ_ITERS, round_centroids=PQ_ROUND)
    codes = _persist_tracked(pq_encode(e, cb, m=PQ_M, method=method))
    codes.count()  # materialize: the search below reads STORED codes
    qrows = e.orderBy("vec_id").limit(PQ_NQ).collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    res = pq_topk(e, cb, queries, topk=PQ_TOPK, m=PQ_M, codes_df=codes)
    return res.select(
        "q_id", "vec_id", F.round("adist", 4).alias("adist")
    ).orderBy("q_id", "adist", "vec_id")


@_q("ann_pq_stored_topk")
def ann_pq_stored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_stored(spark, sf_dir, "auto")


ORACLE["ann_pq_stored_topk"] = _pq_oracle(
    PQ_M, PQ_K, PQ_ITERS, PQ_ROUND, PQ_NQ, PQ_TOPK
)


@_q("ann_pq_stored_topk_blas")
def ann_pq_stored_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # forced-kernel twin (see the *_blas block above): the r10 Arrow
    # encode kernel hash-checked against the SAME oracle as the sql path
    return _pq_stored(spark, sf_dir, "blas")


ORACLE["ann_pq_stored_topk_blas"] = ORACLE["ann_pq_stored_topk"]


def _ivf_pq_stored(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    from disq_spark.operators.dedup import _persist_tracked
    from disq_spark.operators.pq import ivf_pq_encode, ivf_pq_topk, train_pq

    e = load(spark, sf_dir, "embeddings")
    coarse = train_pq(
        e, m=1, k=IVFPQ_COARSE_K, iters=IVFPQ_COARSE_ITERS, round_centroids=PQ_ROUND
    )
    cb = train_pq(e, m=PQ_M, k=PQ_K, iters=PQ_ITERS, round_centroids=PQ_ROUND)
    enc = _persist_tracked(ivf_pq_encode(e, cb, coarse, m=PQ_M, method=method))
    enc.count()  # materialize: search reads stored (cell, codes) only
    qrows = e.orderBy("vec_id").limit(PQ_NQ).collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    res = ivf_pq_topk(
        e, cb, coarse, queries, nprobe=IVFPQ_NPROBE, topk=PQ_TOPK, m=PQ_M,
        encoded_df=enc,
    )
    return res.select(
        "q_id", "vec_id", F.round("adist", 4).alias("adist")
    ).orderBy("q_id", "adist", "vec_id")


@_q("ann_ivf_pq_stored_topk")
def ann_ivf_pq_stored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_pq_stored(spark, sf_dir, "auto")


ORACLE["ann_ivf_pq_stored_topk"] = _ivf_pq_oracle(
    PQ_M, PQ_K, PQ_ITERS, PQ_ROUND,
    IVFPQ_COARSE_K, IVFPQ_COARSE_ITERS, IVFPQ_NPROBE, PQ_NQ, PQ_TOPK,
)


@_q("ann_ivf_pq_stored_topk_blas")
def ann_ivf_pq_stored_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_pq_stored(spark, sf_dir, "blas")


ORACLE["ann_ivf_pq_stored_topk_blas"] = ORACLE["ann_ivf_pq_stored_topk"]


# ---------------------------------------------------------------------------
# dedup_semantic — SemDeDup (Abbas et al. 2023): k-means cluster the
# embeddings, exact pairwise cosine ONLY within each cluster. The oracle
# extends the unrolled-kmeans CTE (same k/iters/rounding, so assignments
# cannot drift) with the within-cluster self-join.
# ---------------------------------------------------------------------------
SEMDEDUP_THRESHOLD = 0.35


#: Gate-side input cap. SemDeDup's cost is sum(cluster_size^2); with the
#: gate's FIXED k the clusters grow with the corpus and the pair count is
#: quadratic in sf (the sf5 decade run surfaced this: 100k vectors / 8
#: clusters = ~625M interpreted pair-cosines). Production callers scale k
#: with n (see semantic_dedup_pairs docstring); the GATE instead bounds
#: its input with the deterministic md5-uniform sample below — the rate
#: is a scalar both engines compute identically, so the oracle stays
#: hash-exact at every sf while pair work stays ~cap^2/k.
SEMDEDUP_GATE_CAP = 4000
SEMDEDUP_SEED = "semdedup_gate"

#: k under the production auto-k rule (clustering.scale_k: k grows with
#: n / target_cell_size so SemDeDup cell granularity — and therefore
#: recall — holds as the corpus scales; SCALE.md §r11). Applied to the
#: gate's CAPPED input size it clamps to min_k=8, so the gate exercises
#: the same rule production uses while the unrolled-kmeans oracle CTE
#: stays a fixed, matching width.
from disq_spark.operators.clustering import scale_k as _scale_k  # noqa: E402

SEMDEDUP_K = _scale_k(SEMDEDUP_GATE_CAP)


@_q("dedup_semantic")
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators import similarity as SIM2
    from disq_spark.operators.sampling import uniform_sql

    e = load(spark, sf_dir, "embeddings")
    rate = min(1.0, float(SEMDEDUP_GATE_CAP) / table_count(spark, sf_dir, "embeddings"))
    e = e.filter(F.expr(uniform_sql("vec_id", SEMDEDUP_SEED)) < rate)
    return SIM2.semantic_dedup_pairs(
        e,
        threshold=SEMDEDUP_THRESHOLD,
        k=SEMDEDUP_K,
        iters=KMEANS_ITERS,
        round_centroids=KMEANS_ROUND,
    ).orderBy("id_a", "id_b")


def _semantic_oracle() -> str:
    from disq_spark.operators.sampling import uniform_sql

    sampled = (
        "(SELECT vec_id, embedding FROM embeddings "
        f"WHERE {uniform_sql('vec_id', SEMDEDUP_SEED)} < "
        f"least(1.0, {float(SEMDEDUP_GATE_CAP)} / "
        "(SELECT count(*) FROM embeddings)))"
    )
    parts = _kmeans_cte_parts(
        SEMDEDUP_K, KMEANS_ITERS, KMEANS_ROUND, source=sampled
    )
    parts.append(
        "t AS (SELECT afin.id, afin.cid, vecs.v,\n"
        "  sqrt(list_sum(list_transform(vecs.v, x -> x * x))) AS nrm\n"
        "  FROM afin JOIN vecs ON afin.id = vecs.id)"
    )
    cos = (
        "list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))"
        " / (a.nrm * b.nrm)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT a.id AS id_a, b.id AS id_b, CAST(a.cid AS INT) AS cid,\n"
        f"       round({cos}, 4) AS score\n"
        "FROM t a JOIN t b ON a.cid = b.cid AND a.id < b.id\n"
        f"WHERE round({cos}, 4) >= {SEMDEDUP_THRESHOLD}\n"
        "ORDER BY id_a, id_b"
    )


ORACLE["dedup_semantic"] = _semantic_oracle()


# ---------------------------------------------------------------------------
# multimodal_meta — opaque binary payload metadata (decode is stubbed; the
# Spark-side plumbing — schema, batching — is real, see operators/multimodal)
# ---------------------------------------------------------------------------
@_q("multimodal_meta")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return (
        d.select(
            "doc_id",
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("payload_md5"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


ORACLE["multimodal_meta"] = """
SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS payload_md5
FROM documents ORDER BY doc_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# multimodal_decode — the mapInPandas fake-decode kernel end-to-end; the
# oracle recomputes the md5-seeded dims/features in pure SQL, so this
# differentially verifies the distributed plumbing (batching, Arrow
# transfer, float storage) against an independent scalar formulation.
# ---------------------------------------------------------------------------
@_q("multimodal_decode")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import attach_payload, decode_image

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = decode_image(attach_payload(d), fake=True)
    cols = [F.round(F.element_at("features", i + 1).cast("double"), 6).alias(f"f{i}") for i in range(8)]
    return feats.select("doc_id", "width", "height", *cols).orderBy("doc_id")


def _multimodal_oracle() -> str:
    def hv(i: int) -> str:  # value of i-th (1-based) hex char of md5(text)
        return f"(instr('0123456789abcdef', substring(md5(text), {i}, 1)) - 1)"

    def byte(j: int) -> str:  # j-th byte (0-based) of the md5 digest
        return f"({hv(2 * j + 1)} * 16 + {hv(2 * j + 2)})"

    feats = ", ".join(f"round({byte(k + 2)} / 255.0, 6) AS f{k}" for k in range(8))
    return f"""
SELECT doc_id,
       CAST(64 + {byte(0)} % 192 AS INT) AS width,
       CAST(64 + {byte(1)} % 192 AS INT) AS height,
       {feats}
FROM documents WHERE doc_id < 100 ORDER BY doc_id
"""


ORACLE["multimodal_decode"] = _multimodal_oracle()


# ---------------------------------------------------------------------------
# ann_ivf_topk — IVF coarse-quantizer ANN (the index-structure scale path
# next to sign-LSH); oracle replicates the same deterministic centroids,
# assignment, probing, and scoring in SQL
# ---------------------------------------------------------------------------
IVF_K = 5
IVF_NPROBE = 2
IVF_PREFILTER_BITS = 3


@_q("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    # n_centroids=None -> ceil(sqrt(n)) hash-sampled centroids: the gate
    # exercises the scale configuration, not a fixed-8 toy quantizer.
    # prefilter_bits: centroid assignment probes only same-sign-bucket
    # centroids (O(n*k/2^b) instead of O(n*k)), with full-scan fallback
    # for uncovered buckets — the oracle replicates the restriction.
    return SIM.ivf_topk(
        e,
        q,
        k=IVF_K,
        n_centroids=None,
        nprobe=IVF_NPROBE,
        prefilter_bits=IVF_PREFILTER_BITS,
    ).orderBy("query_id", "rank")


def _ivf_oracle() -> str:
    cos = (
        "list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * cv[i]))"
        " / (sqrt(list_sum(list_transform(v, x -> x * x)))"
        " * sqrt(list_sum(list_transform(cv, x -> x * x))))"
    )
    qcos = (
        "list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i]))"
        " / (sqrt(list_sum(list_transform(qv, x -> x * x)))"
        " * sqrt(list_sum(list_transform(nv, x -> x * x))))"
    )
    b = IVF_PREFILTER_BITS
    vbucket = _bucket_sql("embedding", b)
    cbucket = (
        "("
        + " + ".join(
            f"(CASE WHEN cvec[{i + 1}] >= 0.0 THEN {2 ** i} ELSE 0 END)"
            for i in range(b)
        )
        + ")"
    )
    # sign-bucket prefilter: probe same-bucket centroids; a vector whose
    # bucket holds no centroid scores every centroid (fallback)
    probe_cond = "(e.vb = c.cb OR e.vb NOT IN (SELECT cb FROM cents))"
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec, {cbucket} AS cb
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)
),
corpus_assign AS (
  SELECT id, cid AS bucket FROM (
    SELECT e.vec_id AS id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cid) AS rn
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v, {vbucket} AS vb FROM embeddings) e,
         (SELECT cid, cvec AS cv, cb FROM cents) c
    WHERE {probe_cond}
  ) WHERE rn = 1
),
query_assign AS (
  SELECT id AS query_id, cid AS bucket FROM (
    SELECT e.vec_id AS id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cid) AS rn
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v, {vbucket} AS vb
          FROM embeddings WHERE vec_id < 5) e,
         (SELECT cid, cvec AS cv, cb FROM cents) c
    WHERE {probe_cond}
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT DISTINCT query_id, ca.id AS neighbor_id
  FROM query_assign qa JOIN corpus_assign ca USING (bucket)
  WHERE query_id <> ca.id
),
scored AS (
  SELECT query_id, neighbor_id, {qcos} AS score
  FROM cand
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS qv FROM embeddings) q ON q.vec_id = query_id
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS nv FROM embeddings) n ON n.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cast(rank AS int) AS rank, round(score, 4) AS score
FROM ranked WHERE rank <= {IVF_K} ORDER BY query_id, rank
"""


ORACLE["ann_ivf_topk"] = _ivf_oracle()


# ---------------------------------------------------------------------------
# multimodal_resize — the binary-in/binary-out resize stub end-to-end; the
# oracle reproduces the md5-seeded dims, the fit arithmetic, and the hex
# of the 16-byte stand-in payload in pure SQL
# ---------------------------------------------------------------------------
@_q("multimodal_resize")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import attach_payload, resize_image

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    r = resize_image(attach_payload(d), target_w=224, target_h=224, fake=True)
    return r.select(
        "doc_id",
        "width",
        "height",
        "resized_w",
        "resized_h",
        F.hex("resized_payload").alias("payload_hex"),
    ).orderBy("doc_id")


def _resize_oracle() -> str:
    def hv(i: int) -> str:
        return f"(instr('0123456789abcdef', substring(md5(text), {i}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({hv(2 * j + 1)} * 16 + {hv(2 * j + 2)})"

    return f"""
WITH dims AS (
  SELECT doc_id,
         CAST(64 + {byte(0)} % 192 AS INT) AS width,
         CAST(64 + {byte(1)} % 192 AS INT) AS height,
         upper(md5(text)) AS payload_hex
  FROM documents WHERE doc_id < 100
), scaled AS (
  SELECT *, least(224.0 / width, 224.0 / height) AS s FROM dims
)
SELECT doc_id, width, height,
       CAST(floor(width * s + 0.5) AS INT)  AS resized_w,
       CAST(floor(height * s + 0.5) AS INT) AS resized_h,
       payload_hex
FROM scaled ORDER BY doc_id
"""


ORACLE["multimodal_resize"] = _resize_oracle()


# ---------------------------------------------------------------------------
# multimodal_features — byte-histogram featurizer (a REAL Arrow-batched
# kernel, not a stub: payload bytes are ASCII text here, so the oracle
# can recompute the histogram by unnesting code points in SQL)
# ---------------------------------------------------------------------------
N_FEATURE_BINS = 16


@_q("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import attach_payload, extract_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = extract_features(attach_payload(d), bins=N_FEATURE_BINS)
    # kernel already half-up-rounds to 1e-6; no re-rounding here
    cols = [
        F.element_at("features", i + 1).alias(f"f{i}") for i in range(N_FEATURE_BINS)
    ]
    return feats.select("doc_id", *cols).orderBy("doc_id")


def _features_oracle() -> str:
    cols = ", ".join(
        f"floor(sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END) * 1e6 / any_value(n) + 0.5) / 1e6 AS f{b}"
        for b in range(N_FEATURE_BINS)
    )
    return f"""
WITH pos AS (
  SELECT doc_id, text, octet_length(text::BLOB) AS n,
         unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE doc_id < 100
), chars AS (
  SELECT doc_id, n, ord(substring(text, i, 1)) // 16 AS bin FROM pos
)
SELECT doc_id, {cols}
FROM chars GROUP BY doc_id ORDER BY doc_id
"""


ORACLE["multimodal_features"] = _features_oracle()


# ---------------------------------------------------------------------------
# multimodal_audio_stats — the audio leg of the multimodal surface: the
# deterministic stub kernel (payload bytes as centered 8-bit PCM,
# md5-seeded sample rate) through the real mapInPandas plumbing; the
# oracle recomputes rms/peak/rate from code points + md5 hex in SQL.
# ---------------------------------------------------------------------------
@_q("multimodal_audio_stats")
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import attach_payload, decode_audio

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & (F.length("text") > 0)
    )
    return decode_audio(attach_payload(d), fake=True).orderBy("doc_id")


ORACLE["multimodal_audio_stats"] = """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE doc_id < 100 AND length(text) > 0
), s AS (
  SELECT doc_id, (ord(substring(text, i, 1)) - 128) / 128.0 AS v FROM pos
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         floor(sqrt(avg(v * v)) * 1e6 + 0.5) / 1e6 AS rms,
         floor(max(abs(v)) * 1e6 + 0.5) / 1e6 AS peak
  FROM s GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(CASE (CAST(concat('0x', substring(md5(d.text), 1, 2)) AS INTEGER) % 4)
            WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            ELSE 44100 END AS INT) AS sample_rate,
       a.n_samples, a.rms, a.peak
FROM agg a JOIN documents d USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_frame_sample — the explode shape of video frame extraction:
# one row per sampled frame index, purely relational on both sides
# ---------------------------------------------------------------------------
FRAME_STRIDE_BYTES = 500


@_q("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import attach_payload, frame_sample

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return frame_sample(attach_payload(d), every_n_bytes=FRAME_STRIDE_BYTES).orderBy(
        "doc_id", "frame_idx"
    )


ORACLE["multimodal_frame_sample"] = f"""
SELECT doc_id,
       unnest(generate_series(0, greatest(CAST(octet_length(text::BLOB) / {FRAME_STRIDE_BYTES} AS INT) - 1, 0))) AS frame_idx,
       octet_length(text::BLOB) AS n_bytes
FROM documents WHERE doc_id < 100
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# corpus_prep — the end-to-end training-corpus preparation pipeline:
#   1. filter: predicted-English, quality >= 0.45, >= 10 tokens
#   2. exact dedup: min-id representative per content fingerprint
#   3. near-dup removal: minhash+LSH pairs -> connected components ->
#      keep the min-id representative per cluster
#   4. per-source corpus stats of what survives
# The composite proves the operators compose: every stage is the library
# call a real pipeline would make (functions/text.py, operators/dedup.py)
# and the oracle is the same pipeline as one recursive-CTE SQL statement.
# Scale shape: two corpus passes (filter+fingerprint, shingle), sketch-
# sized shuffles elsewhere; the filtered corpus is checkpointed once and
# reused by the minhash, the anti-join, and the final aggregate.
# ---------------------------------------------------------------------------
_CP_QUALITY = 0.45
_CP_MIN_TOKENS = 10


@_q("corpus_prep")
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept1 = d.filter(
        (TX.lang_id(F.col("text")) == "en")
        & (TX.quality_score(F.col("text")) >= _CP_QUALITY)
        & (TX.token_count(F.col("text")) >= _CP_MIN_TOKENS)
    )
    reps = kept1.groupBy(TX.fingerprint(F.col("text")).alias("__fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept2 = kept1.join(reps.select("doc_id"), "doc_id", "semi").localCheckpoint(
        eager=True
    )
    n2 = kept2.count()
    max_df = min(max(MAX_DF_FLOOR, MAX_DF_FRACTION * n2), MAX_DF_CAP)
    pairs = DD.minhash_lsh_pairs(
        kept2,
        "text",
        "doc_id",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=max_df,
    )
    final = DD.keep_representatives(kept2, pairs)
    # deterministic avg quality: per-doc round to 1e-4 -> exact BIGINT sum
    q_e4 = F.round(TX.quality_score(F.col("text")) * 10000, 0).cast("long")
    return (
        final.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(TX.token_count(F.col("text"))).alias("total_tokens"),
            F.round(F.sum(q_e4) / (10000.0 * F.count("*")), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


def _corpus_prep_oracle() -> str:
    max_df = (
        f"least(greatest({MAX_DF_FLOOR}, {MAX_DF_FRACTION} * (SELECT count(*) FROM __cp_kept2)), "
        f"{MAX_DF_CAP})"
    )
    kept2 = f"""CREATE OR REPLACE TEMP TABLE __cp_kept2 AS
WITH kept1 AS MATERIALIZED (
  SELECT * FROM documents
  WHERE {_lang_id_sql()} = 'en'
    AND ({_QUALITY_SQL}) >= {_CP_QUALITY}
    AND len({_TOKS}) >= {_CP_MIN_TOKENS}
),
reps AS (
  SELECT min(doc_id) AS doc_id FROM kept1 GROUP BY md5({_NORM})
)
SELECT kept1.* FROM kept1 WHERE doc_id IN (SELECT doc_id FROM reps);"""
    edges = f"""CREATE OR REPLACE TEMP TABLE __cp_edges AS
WITH {_minhash_pair_ctes("__cp_kept2", max_df)}
SELECT id_a AS a, id_b AS b FROM pairs
UNION
SELECT id_b AS a, id_a AS b FROM pairs;"""
    prop, last, unconverged = _label_prop_stmts("__cp_edges", "__cp")
    final = f"""WITH losers AS (
  SELECT node FROM {last} WHERE node <> comp
),
final AS (
  SELECT * FROM __cp_kept2 WHERE doc_id NOT IN (SELECT node FROM losers)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
       round(sum(CAST(round(({_QUALITY_SQL}) * 10000, 0) AS BIGINT)) / (10000.0 * count(*)), 4) AS avg_quality
FROM final GROUP BY source
UNION ALL
SELECT '__UNCONVERGED__', -1, -1, -1 WHERE {unconverged}
ORDER BY source;"""
    return "\n".join([kept2, edges] + prop + [final])


ORACLE["corpus_prep"] = _corpus_prep_oracle()


# ---------------------------------------------------------------------------
# embedding_quantize_stats — int8 max-abs quantization of the embedding
# store: per label, mean scale and mean L1 reconstruction error (both
# carried as per-vector e7-rounded integer sums so no float summation
# order is exposed). floor(x+0.5) quantization keeps both engines on the
# same rounding convention.
# ---------------------------------------------------------------------------
@_q("embedding_quantize_stats")
def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.similarity import dequantize, quantize_embeddings

    e = load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e)
    l1 = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            dequantize(),
            lambda a, b: F.abs(a - b),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.size("embedding")
    scale_e7 = F.round(F.col("scale") * 1e7, 0).cast("long")
    l1_e7 = F.round(l1 * 1e7, 0).cast("long")
    return (
        q.select("label", scale_e7.alias("s7"), l1_e7.alias("e7"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.sum("s7") / (1e7 * F.count("*")), 6).alias("mean_scale"),
            F.round(F.sum("e7") / (1e7 * F.count("*")), 6).alias("mean_l1_err"),
        )
        .orderBy("label")
    )


ORACLE["embedding_quantize_stats"] = """
WITH base AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
),
scaled AS (
  SELECT label, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
),
quant AS (
  SELECT label, v, scale,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
              ELSE list_transform(v, x -> floor(x / scale + 0.5) * scale) END AS dq
  FROM scaled
),
per_vec AS (
  SELECT label,
         CAST(round(scale * 1e7, 0) AS BIGINT) AS s7,
         CAST(round((list_sum(list_transform(list_zip(v, dq), p -> abs(p[1] - p[2]))) / len(v)) * 1e7, 0) AS BIGINT) AS e7
  FROM quant
)
SELECT label, count(*) AS n_vecs,
       round(sum(s7) / (1e7 * count(*)), 6) AS mean_scale,
       round(sum(e7) / (1e7 * count(*)), 6) AS mean_l1_err
FROM per_vec GROUP BY label ORDER BY label
"""


# ---------------------------------------------------------------------------
# text_pii_scan — regex PII surface scan per source: email / URL / long
# digit runs (phone/ID-shaped). Patterns restricted to a dialect Java
# and RE2-ish engines agree on (no backrefs, no lookaround). Pure
# regexp_count expressions — scan-speed at any corpus size.
# ---------------------------------------------------------------------------
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_DIGITS = "[0-9]{7,}"


@_q("text_pii_scan")
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = TX.normalize(F.col("text"))
    email = F.regexp_count(t, F.lit(_PII_EMAIL))
    url = F.regexp_count(t, F.lit(_PII_URL))
    digits = F.regexp_count(t, F.lit(_PII_DIGITS))
    return (
        d.select("source", email.alias("e"), url.alias("u"), digits.alias("g"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("u").alias("n_urls"),
            F.sum("g").alias("n_digit_runs"),
            F.sum(((F.col("e") + F.col("u") + F.col("g")) > 0).cast("long")).alias(
                "n_docs_flagged"
            ),
        )
        .orderBy("source")
    )


ORACLE["text_pii_scan"] = f"""
WITH t AS (
  SELECT source,
         len(regexp_extract_all({_NORM}, '{_PII_EMAIL}')) AS e,
         len(regexp_extract_all({_NORM}, 'https?://[^ ]+')) AS u,
         len(regexp_extract_all({_NORM}, '[0-9]{{7,}}')) AS g
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(u) AS BIGINT) AS n_urls,
       CAST(sum(g) AS BIGINT) AS n_digit_runs,
       CAST(sum(CASE WHEN e + u + g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged
FROM t GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_pii_redact — the SHIPPING op behind the scan: raw text rewritten
# with typed placeholders (functions/text.py redact_pii; URL before
# email so addresses inside URLs vanish with the URL). content_hash pins
# every redacted byte, placeholder counts quantify the rewrite.
# ---------------------------------------------------------------------------


@_q("text_pii_redact")
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    red = d.select(
        "doc_id", "source", TX.redact_pii(F.col("text")).alias("red")
    )
    n_ph = sum(
        [F.regexp_count(F.col("red"), F.lit(p)) for p in ("<URL>", "<EMAIL>", "<IP>", "<ID>")],
        F.lit(0),
    )
    return (
        red.select("doc_id", "source", "red", n_ph.alias("n_ph"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ph").alias("n_placeholders"),
            F.sum((F.col("n_ph") > 0).cast("long")).alias("n_docs_redacted"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("doc_id"), F.md5("red").alias("h"))
                            )
                        ),
                        lambda s: s["h"],
                    ),
                )
            ).alias("content_hash"),
        )
        .orderBy("source")
    )


def _pii_redact_oracle() -> str:
    from disq_spark.functions.text import redact_pii_sql

    red = redact_pii_sql("text")
    n_ph = " + ".join(
        f"len(regexp_extract_all(red, '{p}'))" for p in ("<URL>", "<EMAIL>", "<IP>", "<ID>")
    )
    return f"""
WITH r AS (SELECT doc_id, source, {red} AS red FROM documents),
t AS (SELECT doc_id, source, red, {n_ph} AS n_ph FROM r)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_ph) AS BIGINT) AS n_placeholders,
       CAST(sum(CASE WHEN n_ph > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
       md5(string_agg(md5(red), '' ORDER BY doc_id)) AS content_hash
FROM t GROUP BY source ORDER BY source
"""


ORACLE["text_pii_redact"] = _pii_redact_oracle()


# ---------------------------------------------------------------------------
# text_decontamination — benchmark-probe containment: which documents
# contain any of a probe set of eval-set phrases (substring on
# normalized text; the production version uses the n-gram tables above —
# this is the exact-phrase first pass every decontamination run starts
# with). One scan, probe set as plan literals.
# ---------------------------------------------------------------------------
_PROBES = ("the quick brown", "lorem ipsum dolor", "paris is the capital")


@_q("text_decontamination")
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = TX.normalize(F.col("text"))
    hit = None
    for p in _PROBES:
        c = F.contains(t, F.lit(p))
        hit = c if hit is None else (hit | c)
    return (
        d.select("source", hit.cast("long").alias("hit"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("hit").alias("n_contaminated"),
            F.round(F.sum("hit") * 100.0 / F.count("*"), 2).alias("pct"),
        )
        .orderBy("source")
    )


_PROBE_SQL = " OR ".join(f"contains({_NORM}, '{p}')" for p in _PROBES)

ORACLE["text_decontamination"] = f"""
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN {_PROBE_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       round(sum(CASE WHEN {_PROBE_SQL} THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS pct
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# text_decontamination_ngram — the industry-standard 13-gram overlap
# test (GPT-3 appendix C): a document is contaminated when it shares at
# least one word 13-gram with any benchmark text. The benchmark set is
# derived deterministically from the corpus itself (tokens 5..44 of
# every 29th document — modelling eval questions quoted from web text
# that is also in the training corpus), so the gate exercises the real
# shape: the excerpted source doc AND its near-duplicates must flag.
# Candidate generation is bucketed by gram — never all-pairs.
# ---------------------------------------------------------------------------
DECON_N = 13
_DECON_MOD = 29
_DECON_SKIP = 4   # excerpt starts at token 5 (1-based)
_DECON_LEN = 40   # excerpt length in tokens


@_q("text_decontamination_ngram")
def text_decontamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    bench = d.filter(
        (F.col("doc_id") % _DECON_MOD == 0)
        & (F.size(toks) >= _DECON_SKIP + _DECON_LEN)
    ).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(toks, _DECON_SKIP + 1, _DECON_LEN), " ").alias("text"),
    )
    hits = DD.ngram_contamination(d, bench, n=DECON_N)
    # left join leaves n_hits NULL for clean docs; an all-NULL sum is
    # NULL in Spark, so flag through coalesce
    flagged = F.coalesce((F.col("n_hits") > 0).cast("long"), F.lit(0))
    return (
        d.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(flagged).alias("n_contaminated"),
            F.sum(F.coalesce(F.col("n_hits"), F.lit(0))).alias("n_gram_hits"),
            F.round(F.sum(flagged) * 100.0 / F.count("*"), 2).alias("pct"),
        )
        .orderBy("source")
    )


ORACLE["text_decontamination_ngram"] = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
bench AS (
  SELECT doc_id AS bench_id, list_slice(toks, {_DECON_SKIP + 1}, {_DECON_SKIP + _DECON_LEN}) AS btoks
  FROM t WHERE doc_id % {_DECON_MOD} = 0 AND len(toks) >= {_DECON_SKIP + _DECON_LEN}
),
bgrams AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(array_to_string(list_slice(btoks, i, i + {DECON_N - 1}), ' ')), 1, 15)) AS BIGINT) AS gh
  FROM bench, unnest(generate_series(1, len(btoks) - {DECON_N - 1})) AS u(i)
),
g AS (
  SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {DECON_N - 1}), ' ')), 1, 15)) AS BIGINT) AS gh
  FROM t, unnest(generate_series(1, len(toks) - {DECON_N - 1})) AS u(i)
  WHERE len(toks) >= {DECON_N}
),
hits AS (SELECT doc_id, count(*) AS n_hits FROM g JOIN bgrams USING (gh) GROUP BY doc_id)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN h.n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(coalesce(sum(h.n_hits), 0) AS BIGINT) AS n_gram_hits,
       round(sum(CASE WHEN h.n_hits > 0 THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS pct
FROM documents d LEFT JOIN hits h USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# dedup_simhash_pairs — hamming-banded near-dup pairs over the 64-bit
# SimHash codes (bands=8 -> 8-bit slices, complete for hamming < 8).
# The Spark side generates candidates via pigeonhole band equi-joins;
# the oracle states the result as the all-pairs popcount — equality IS
# the completeness proof run at every gate.
# ---------------------------------------------------------------------------
_SHP_MAX_HAMMING = 3


@_q("dedup_simhash_pairs")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.simhash_pairs(
        d, bits=64, bands=8, max_hamming=_SHP_MAX_HAMMING
    ).orderBy("id_a", "id_b")


def _simhash_all_docs_cte(bits: int = 64) -> str:
    hex_chars = (bits + 3) // 4
    terms = DD._simhash_bit_terms(bits)
    sums = ", ".join(f"sum({t}) AS s_{j}" for j, t in enumerate(terms))
    return f"""
toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
th AS (SELECT doc_id, substring(md5(tok), 1, {hex_chars}) AS th FROM toks),
s AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
codes AS (SELECT doc_id, cast({_simhash_total_sql(bits)} AS bigint) AS simhash FROM s)"""


ORACLE["dedup_simhash_pairs"] = f"""
WITH {_simhash_all_docs_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SHP_MAX_HAMMING}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# multimodal_real_decode — the REAL image decoder in the gate: each
# ASCII-only document's first 768 bytes become a valid 16x16 P6 PPM
# (bytes ARE the pixels), decode_image parses actual pixels, and the
# oracle recomputes the channel means from the same bytes with ascii().
# ASCII-only filter keeps byte positions == character positions in both
# engines.
# ---------------------------------------------------------------------------
_PPM_HEADER = "P6\n16 16\n255\n"
_PPM_BYTES = 768  # 16 * 16 * 3


@_q("multimodal_real_decode")
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _PPM_BYTES), _PPM_BYTES, " ")
    media = d.select(
        "doc_id",
        F.lit("image/x-ppm").alias("media_type"),
        F.concat(F.lit(_PPM_HEADER).cast("binary"), padded.cast("binary")).alias(
            "payload"
        ),
        F.lit(len(_PPM_HEADER) + _PPM_BYTES).cast("long").alias("n_bytes"),
        F.lit("").alias("content_md5"),
    )
    feats = decode_image(media)  # REAL path: parses the P6 pixels
    return feats.select(
        "doc_id",
        "width",
        "height",
        # features are float32; round the double cast back onto the 1e-6
        # grid the kernel quantized to (float32 keeps ~7 sig digits)
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


def _chan_mean_sql(offset: int) -> str:
    # mean of bytes at positions offset, offset+3, ... (1-based), /255,
    # half-up 1e-6 — exactly _image_features' arithmetic
    vals = f"[ascii(substring(p, {offset} + 3 * i, 1)) for i in generate_series(0, 255)]"
    return f"floor((list_sum({vals}) / 256.0 / 255.0) * 1e6 + 0.5) / 1e6"


ORACLE["multimodal_real_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_PPM_BYTES}), {_PPM_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 16 AS width, 16 AS height,
       {_chan_mean_sql(1)} AS r_mean,
       {_chan_mean_sql(2)} AS g_mean,
       {_chan_mean_sql(3)} AS b_mean
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_png_decode — the REAL PNG decoder (zlib + row filters, no
# PIL) in the gate: each ASCII-only document's first 768 bytes become
# the pixels of a 16x16 RGB PNG encoded task-side with the filter type
# CYCLING 0,1,2,3,4 across rows — so every unfilter path (None/Sub/Up/
# Average/Paeth) executes on every payload — and decode_image recovers
# the original pixels. The oracle recomputes the channel means straight
# from the text with ascii(): the zlib+filter round-trip must be
# pixel-exact for the hash to match.
# ---------------------------------------------------------------------------
@_q("multimodal_png_decode")
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image, encode_png

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _PPM_BYTES), _PPM_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_png(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                img = np.frombuffer(bytes(px), np.uint8).reshape(16, 16, 3)
                payload = encode_png(img, filters=[0, 1, 2, 3, 4])
                rows.append(
                    (doc_id, "image/png", payload, len(payload), "")
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_png, MEDIA_SCHEMA)
    feats = decode_image(media)  # REAL path: zlib inflate + unfilter
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


ORACLE["multimodal_png_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_PPM_BYTES}), {_PPM_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 16 AS width, 16 AS height,
       {_chan_mean_sql(1)} AS r_mean,
       {_chan_mean_sql(2)} AS g_mean,
       {_chan_mean_sql(3)} AS b_mean
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_jpeg_decode — the REAL baseline JPEG codec (formats/jpeg.py:
# Huffman entropy coding + DCT + quantization, no PIL) in the gate, on
# its exactly-representable subspace: each ASCII document's first 16
# bytes become a 32x32 GRAYSCALE image of 8x8-constant blocks (block
# (i,j) = byte 4i+j). Constant blocks have all-zero AC coefficients and
# an integer DC path, so at quality=100 (all-ones quant table) the
# lossy pipeline round-trips bit-exactly and the oracle can recompute
# the channel means straight from the text with ascii(). Restart
# markers every 2 MCUs keep the DRI/RSTn path inside the gate. Lossy
# behaviour on photographic content is property-tested with error
# bounds in tests/test_multimodal.py.
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# multimodal_image_dhash / multimodal_image_neardup — perceptual image
# near-dup: each printable doc becomes a REAL 18x16 binary P6 whose
# pixel bytes are its text; image_dhash decodes, integer-grayscales,
# nearest-resamples to 9x8 and emits the 64-bit difference hash; pairs
# come from pigeonhole hamming banding (never all-pairs). The oracle
# recomputes the hash in pure SQL from the text bytes (ascii/substring
# + // arithmetic + signed bit-63 term) and, for the pair gate,
# brute-forces bit_count(xor()) over all pairs — banded MUST equal
# brute force (max_hamming < bands completeness).
# ---------------------------------------------------------------------------
_DH_W, _DH_H = 18, 16
_DH_BYTES = _DH_W * _DH_H * 3
_DH_CAP = 200
_DH_MAXHAM = 3


def _dhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < _DH_CAP) & F.col("text").rlike("^[ -~]+$")
    )
    body = F.rpad(F.substring("text", 1, _DH_BYTES), _DH_BYTES, " ")
    header = F.lit(f"P6\n{_DH_W} {_DH_H}\n255\n")
    return d.select(
        "doc_id",
        F.concat(header.cast("binary"), body.cast("binary")).alias("payload"),
    )


@_q("multimodal_image_dhash")
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import image_dhash

    return image_dhash(_dhash_docs(spark, sf_dir)).orderBy("doc_id")


@_q("multimodal_image_neardup")
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.dedup import hamming_banded_pairs
    from disq_spark.operators.multimodal import image_dhash

    codes = image_dhash(_dhash_docs(spark, sf_dir)).select("doc_id", "dhash")
    return hamming_banded_pairs(
        codes, "dhash", "doc_id", bits=64, bands=4, max_hamming=_DH_MAXHAM
    ).orderBy("id_a", "id_b")


def _dhash_sql_expr(pad: str) -> str:
    """BIGINT dHash of an 18x16 image whose raw P6 body bytes are the
    864-char expression ``pad`` (1-based substring indexing)."""
    def gray(r, c):
        pos = 3 * ((2 * r) * _DH_W + 2 * c)
        return (
            f"((ascii(substring({pad}, {pos + 1}, 1))"
            f" + ascii(substring({pad}, {pos + 2}, 1))"
            f" + ascii(substring({pad}, {pos + 3}, 1))) // 3)"
        )

    terms = []
    for r in range(8):
        for c in range(8):
            i = r * 8 + c
            coef = "-9223372036854775808" if i == 63 else str(1 << i)
            terms.append(
                f"CASE WHEN {gray(r, c)} < {gray(r, c + 1)} THEN CAST({coef} AS BIGINT) ELSE 0 END"
            )
    return "(" + " + ".join(terms) + ")"


def _dhash_codes_cte() -> str:
    pad = f"rpad(substring(text, 1, {_DH_BYTES}), {_DH_BYTES}, ' ')"
    return f"""
codes AS (
  SELECT doc_id, {_dhash_sql_expr(pad)} AS dhash
  FROM documents
  WHERE doc_id < {_DH_CAP} AND regexp_matches(text, '^[ -~]+$')
)"""


ORACLE["multimodal_image_dhash"] = f"""
WITH {_dhash_codes_cte()}
SELECT doc_id, dhash, {_DH_W} AS width, {_DH_H} AS height
FROM codes ORDER BY doc_id
"""

ORACLE["multimodal_image_neardup"] = f"""
WITH {_dhash_codes_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {_DH_MAXHAM}
ORDER BY id_a, id_b
"""


_JPEG_BYTES = 16  # 4x4 blocks of 8x8 px


@_q("multimodal_jpeg_decode")
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_jpeg(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                vals = np.frombuffer(bytes(px), np.uint8).reshape(4, 4)
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                payload = encode_jpeg(img, quality=100, restart_interval=2)
                rows.append(
                    (doc_id, "image/jpeg", payload, len(payload), "")
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_jpeg, MEDIA_SCHEMA)
    feats = decode_image(media)  # REAL path: Huffman decode + IDCT
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


def _gray_mean_sql() -> str:
    # mean over the 16 block bytes (each fills 64 px, so the pixel mean
    # equals the byte mean), /255, half-up 1e-6 — _image_features' math
    vals = f"[ascii(substring(p, i, 1)) for i in generate_series(1, {_JPEG_BYTES})]"
    return f"floor((list_sum({vals}) / {_JPEG_BYTES}.0 / 255.0) * 1e6 + 0.5) / 1e6"


ORACLE["multimodal_jpeg_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 32 AS width, 32 AS height,
       {_gray_mean_sql()} AS r_mean,
       {_gray_mean_sql()} AS g_mean,
       {_gray_mean_sql()} AS b_mean
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_jpeg_progressive — the SAME blockwise-constant subspace
# through the PROGRESSIVE (SOF2) pipeline: spectral-selection +
# successive-approximation scans carry the identical quantized
# coefficients as baseline, so the quality=100 bit-exactness argument
# holds unchanged and the oracle is the same ascii() recomputation.
# Exercises multi-scan parse, DC refine, EOB runs, and per-scan
# restarts inside the oracle-gated path (not just pytest).
# ---------------------------------------------------------------------------
@_q("multimodal_jpeg_progressive")
def multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_jpeg(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                vals = np.frombuffer(bytes(px), np.uint8).reshape(4, 4)
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                payload = encode_jpeg(
                    img, quality=100, restart_interval=2, progressive=True
                )
                rows.append((doc_id, "image/jpeg", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_jpeg, MEDIA_SCHEMA)
    feats = decode_image(media)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


ORACLE["multimodal_jpeg_progressive"] = ORACLE["multimodal_jpeg_decode"]


# ---------------------------------------------------------------------------
# multimodal_gif_decode — the REAL GIF codec (formats/gif.py: LZW +
# palette + interlace) in the gate: each ASCII document's first 16
# bytes become a 4x4 GRAYSCALE image (palette = the distinct byte
# values). GIF is lossless on paletted content, so the decoded channel
# means equal the byte means exactly and the oracle recomputes them
# from the text with ascii(). LZW boundary/interlace behaviour is
# property-tested in tests/test_properties.py.
# ---------------------------------------------------------------------------
@_q("multimodal_gif_decode")
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_gif(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.gif import encode_gif

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                img = np.frombuffer(bytes(px), np.uint8).reshape(4, 4)
                payload = encode_gif(img)
                rows.append((doc_id, "image/gif", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_gif, MEDIA_SCHEMA)
    feats = decode_image(media)  # REAL path: LZW decode + palette
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal_webp_decode — the REAL VP8L codec (formats/webp.py: prefix
# codes, LZ77 + color cache, subtract-green transform) in the gate on
# the same lossless 4x4-grayscale subspace as the GIF gate; channel
# means recomputed from ascii() in DuckDB.
# ---------------------------------------------------------------------------
@_q("multimodal_webp_decode")
def multimodal_webp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_webp(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.webp import encode_webp

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                img = np.frombuffer(bytes(px), np.uint8).reshape(4, 4)
                payload = encode_webp(img, subtract_green=True, cache_bits=4)
                rows.append((doc_id, "image/webp", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_webp, MEDIA_SCHEMA)
    feats = decode_image(media)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# html_extract_text — the crawl-to-text step (functions/html.py): each
# document is wrapped into a synthetic page (escaped body + title +
# script/comment traps + links), the Spark side runs the real
# strip/decode/collapse chain on the PAGE, and the oracle derives the
# expected result directly from the RAW text — extraction must invert
# generation exactly, so a regex that eats content or leaks markup
# hash-mismatches.
# ---------------------------------------------------------------------------
@_q("html_extract_text")
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.functions import html as H

    d = load(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>if (1 < 2) { x = \"<p>\"; }</script>"),
        F.lit("<style>a > b { color: red; }</style></head>"),
        F.lit("<body><!-- hidden < comment --><p id=\"main\">"),
        H.escape_text(F.col("text")),
        # numeric character references (decimal, hex, astral) and an
        # amp-protected one that must STAY literal after decoding
        F.lit("</p><span>caf&#233;-r&#xE9;sum&#xe9;-&#x1F600; amp:&amp;#65;</span>"),
        F.lit("<a href=\"https://x/1\">l</a><a href='https://x/2'>m</a>"),
        F.lit("</body></html>"),
    )
    p = d.select("doc_id", page.alias("page"))
    return p.select(
        "doc_id",
        H.extract_title(F.col("page")).alias("title"),
        F.md5(H.html_to_text(F.col("page")).cast("binary")).alias("text_md5"),
        F.size(H.extract_links(F.col("page"))).alias("n_links"),
    ).orderBy("doc_id")


ORACLE["html_extract_text"] = """
SELECT doc_id,
       'Doc ' || doc_id AS title,
       md5(trim(regexp_replace(
           'Doc ' || doc_id || ' ' || text ||
           ' café-résumé-😀 amp:&#65; l m',
           '\\s+', ' ', 'g'))) AS text_md5,
       2 AS n_links
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# warc_crawl_ingest — the Common Crawl ingestion path end-to-end: the
# corpus is materialized ONCE (cached, mtime-keyed) as a .warc.gz with
# one gzip member per record, then read back DISTRIBUTED at a 4 KB
# split size — dozens of byte-range tasks each snapping to a gzip
# member boundary — and every record must come back exactly once with
# its exact bytes (md5 vs the raw table).
# ---------------------------------------------------------------------------
@_q("warc_crawl_ingest")
def warc_crawl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.sources.warc import read_warc

    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warc_{key}")
    warc_path = os.path.join(cache, "corpus.warc.gz")

    def _build(tmp: str) -> None:
        import zlib

        from disq_spark.formats.warc import build_warc

        with open(os.path.join(tmp, "corpus.warc.gz"), "wb") as f:
            it = (
                load(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
                .toLocalIterator()
            )
            for r in it:  # bounded memory: one record at a time
                rec = (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:doc:{r.doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"https://corpus.local/doc/{r.doc_id}",
                        "Content-Type": "text/plain",
                    },
                    r.text.encode("utf-8"),
                )
                f.write(build_warc([rec], gzip_members=True))

    ensure_cached_dir(cache, _build)
    df = read_warc(spark, warc_path, split_size=4096)
    return df.select(
        F.col("url"),
        F.col("warc_type"),
        F.col("content_length"),
        F.md5(F.col("payload")).alias("payload_md5"),
    ).orderBy("url")


ORACLE["warc_crawl_ingest"] = """
SELECT 'https://corpus.local/doc/' || doc_id AS url,
       'response' AS warc_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       md5(text) AS payload_md5
FROM documents ORDER BY url
"""


# ---------------------------------------------------------------------------
# warc_sharded_ingest — the DEPLOYMENT shape of the crawl source: the
# corpus is sharded across multiple .warc.gz segment files in a
# directory (Common Crawl is ~100k segments per dump), read with ONE
# read_warc(dir) call at a 4 KB split size — multi-file resolution
# (resolve_paths: sorted, hidden-skipped) x member-boundary snapping in
# one gate. Every record from every shard must come back exactly once.
# ---------------------------------------------------------------------------
_WARC_SHARDS = 5


@_q("warc_sharded_ingest")
def warc_sharded_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.sources.warc import read_warc

    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-sharded-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warcsh_{key}")

    def _build(tmp: str) -> None:
        from disq_spark.formats.warc import build_warc

        writers = [
            open(os.path.join(tmp, f"part-{i:04d}.warc.gz"), "wb")
            for i in range(_WARC_SHARDS)
        ]
        # decoy files the reader must skip (hidden + wrong extension)
        with open(os.path.join(tmp, "_manifest.txt"), "w") as f:
            f.write("shards\n")
        try:
            it = (
                load(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
                .toLocalIterator()
            )
            for r in it:
                rec = (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:doc:{r.doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"https://corpus.local/doc/{r.doc_id}",
                        "Content-Type": "text/plain",
                    },
                    r.text.encode("utf-8"),
                )
                writers[r.doc_id % _WARC_SHARDS].write(
                    build_warc([rec], gzip_members=True)
                )
        finally:
            for w in writers:
                w.close()

    ensure_cached_dir(cache, _build)
    df = read_warc(spark, cache, split_size=4096)
    return df.select(
        F.col("url"),
        F.col("content_length"),
        F.md5(F.col("payload")).alias("payload_md5"),
    ).orderBy("url")


ORACLE["warc_sharded_ingest"] = """
SELECT 'https://corpus.local/doc/' || doc_id AS url,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       md5(text) AS payload_md5
FROM documents ORDER BY url
"""


# ---------------------------------------------------------------------------
# streaming_warc_ingest_gate — spark.readStream.format("warc") under
# the full hash gate: the sharded segment directory (same cached corpus
# as warc_sharded_ingest) is drained with availableNow into a memory
# sink; the drained stream must equal the batch read — i.e. the exact
# oracle that checks the batch source checks the streaming one. At
# scale the same query tails a live Common Crawl dump directory with a
# checkpoint (restart exactly-once covered in tests/test_streaming.py).
# ---------------------------------------------------------------------------
@_q("streaming_warc_ingest_gate")
def streaming_warc_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.queries._stream_util import run_to_completion
    from disq_spark.sources.datasource import register_datasources

    # same cached sharded corpus as warc_sharded_ingest
    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-sharded-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warcsh_{key}")
    if not os.path.exists(cache):
        warc_sharded_ingest(spark, sf_dir).count()  # builds the cache

    register_datasources(spark)
    if spark.catalog.tableExists("stream_gate_warc"):
        spark.catalog.dropTempView("stream_gate_warc")
    q = (
        spark.readStream.format("warc")
        .option("split_size", 8192)
        .load(cache)
        .selectExpr("url", "content_length", "md5(payload) AS payload_md5")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_gate_warc")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, "streaming_warc_ingest_gate")
    return spark.table("stream_gate_warc").orderBy("url")


ORACLE["streaming_warc_ingest_gate"] = """
SELECT 'https://corpus.local/doc/' || doc_id AS url,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       md5(text) AS payload_md5
FROM documents ORDER BY url
"""


# ---------------------------------------------------------------------------
# crawl_prep — the crawl pipeline end-to-end: DISTRIBUTED .warc.gz read
# (member-boundary splits) -> payload to text -> quality filter ->
# exact dedup (min-record representative). The ingestion analog of
# corpus_prep: proves the WARC source composes with the text tier, not
# just that it round-trips.
# ---------------------------------------------------------------------------
CRAWL_QUALITY_MIN = 0.5


@_q("crawl_prep")
def crawl_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.operators.dedup import exact_dedup
    from disq_spark.sources.warc import read_warc

    # same cached corpus.warc.gz as warc_crawl_ingest
    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warc_{key}")
    warc_path = os.path.join(cache, "corpus.warc.gz")
    if not os.path.exists(warc_path):
        # build via the sibling gate's builder (cache-shared)
        warc_crawl_ingest(spark, sf_dir).count()

    from disq_spark.functions.charset import decode_payload

    # honor the Content-Type charset (this corpus is charset-less
    # text/plain -> UTF-8 default; crawl_charset_decode exercises the
    # latin-1/utf-16 legs end-to-end)
    docs = read_warc(spark, warc_path, split_size=8192).select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        decode_payload(F.col("payload"), F.col("mime")).alias("text"),
    )
    good = docs.filter(TX.quality_score(F.col("text")) >= CRAWL_QUALITY_MIN)
    kept = exact_dedup(good, "text", "doc_id")
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("n_copies").alias("n_good"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string"))))
        ).alias("kept_ids_md5"),
    )


# ---------------------------------------------------------------------------
# crawl_charset_decode — non-UTF-8 pages end-to-end: the corpus carries
# latin-1, explicit utf-8, charset-less (utf-8 default), and UTF-16LE
# records with non-ASCII markers; the Spark side must sniff charset=
# from the Content-Type header and decode accordingly (a plain UTF-8
# cast mangles the latin-1 and UTF-16 legs into different md5s). The
# oracle recomputes the decoded text from the raw documents table.
# ---------------------------------------------------------------------------
_CS_MARKS = {0: " café-é", 1: " café-😀", 2: "", 3: " café-é"}


@_q("crawl_charset_decode")
def crawl_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.functions.charset import decode_payload
    from disq_spark.sources.warc import read_warc

    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-charset-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warccs_{key}")

    def _build(tmp: str) -> None:
        from disq_spark.formats.warc import build_warc

        variants = {
            0: ("iso-8859-1", 'text/html; charset=ISO-8859-1'),
            1: ("utf-8", 'text/html; charset="utf-8"'),
            2: ("utf-8", "text/html"),  # charset-less: UTF-8 default
            3: ("utf-16-le", "text/html; charset=UTF-16LE"),
        }
        with open(os.path.join(tmp, "corpus.warc.gz"), "wb") as f:
            it = (
                load(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
                .toLocalIterator()
            )
            for r in it:
                v = r.doc_id % 4
                codec, ctype = variants[v]
                payload = (r.text + _CS_MARKS[v]).encode(codec)
                rec = (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:doc:{r.doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"https://corpus.local/doc/{r.doc_id}",
                        "Content-Type": ctype,
                    },
                    payload,
                )
                f.write(build_warc([rec], gzip_members=True))

    ensure_cached_dir(cache, _build)
    df = read_warc(spark, os.path.join(cache, "corpus.warc.gz"), split_size=8192)
    return df.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.md5(
            F.encode(decode_payload(F.col("payload"), F.col("mime")), "UTF-8")
        ).alias("text_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# crawl_http_extract — the real Common Crawl payload shape: WARC
# response records carry the FULL HTTP message (status line + headers +
# body), and the authoritative charset lives in the HTTP Content-Type
# INSIDE the payload. Distributed WARC read -> http_status /
# http_content_type / http_body split -> declared-charset body decode;
# non-HTTP resource records pass through whole. The oracle recomputes
# status/mime/decoded-text from the raw documents table.
# ---------------------------------------------------------------------------
@_q("crawl_http_extract")
def crawl_http_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from disq_spark.cacheutil import cache_key, ensure_cached_dir
    from disq_spark.functions import http as HT
    from disq_spark.functions.charset import decode_payload
    from disq_spark.sources.warc import read_warc

    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, "warc-http-v1")
    cache = os.path.join(tempfile.gettempdir(), f"disq_warchttp_{key}")

    def _build(tmp: str) -> None:
        from disq_spark.formats.warc import build_warc

        charsets = {
            0: ("iso-8859-1", "text/html; charset=ISO-8859-1", " café-é"),
            1: ("utf-8", 'text/html; charset="utf-8"', " café-😀"),
            2: ("utf-8", "text/html", " café-😀"),  # no charset: UTF-8 default
        }
        with open(os.path.join(tmp, "corpus.warc.gz"), "wb") as f:
            it = (
                load(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
                .toLocalIterator()
            )
            for r in it:
                if r.doc_id % 11 == 7:
                    # plain resource record: no HTTP framing
                    payload = r.text.encode("utf-8")
                    ctype = "text/plain"
                else:
                    codec, ct, mark = charsets[r.doc_id % 3]
                    body = (r.text + mark).encode(codec)
                    status = 404 if r.doc_id % 5 == 0 else 200
                    reason = "Not Found" if status == 404 else "OK"
                    payload = (
                        f"HTTP/1.1 {status} {reason}\r\n"
                        f"Server: corpus-local\r\n"
                        f"Content-Type: {ct}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode("ascii") + body
                    ctype = "application/http; msgtype=response"
                rec = (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:doc:{r.doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"https://corpus.local/doc/{r.doc_id}",
                        "Content-Type": ctype,
                    },
                    payload,
                )
                f.write(build_warc([rec], gzip_members=True))

    ensure_cached_dir(cache, _build)
    df = read_warc(spark, os.path.join(cache, "corpus.warc.gz"), split_size=8192)
    body = HT.http_body(F.col("payload"))
    ctype = HT.http_content_type(F.col("payload"))
    return df.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        HT.http_status(F.col("payload")).alias("status"),
        ctype.alias("http_mime"),
        F.md5(F.encode(decode_payload(body, ctype), "UTF-8")).alias("body_md5"),
    ).orderBy("doc_id")


ORACLE["crawl_http_extract"] = """
SELECT doc_id,
       CASE WHEN doc_id % 11 = 7 THEN NULL
            WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS status,
       CASE WHEN doc_id % 11 = 7 THEN ''
            WHEN doc_id % 3 = 0 THEN 'text/html; charset=ISO-8859-1'
            WHEN doc_id % 3 = 1 THEN 'text/html; charset="utf-8"'
            ELSE 'text/html' END AS http_mime,
       md5(text || CASE WHEN doc_id % 11 = 7 THEN ''
                        WHEN doc_id % 3 = 0 THEN ' café-é'
                        ELSE ' café-😀' END) AS body_md5
FROM documents ORDER BY doc_id
"""


ORACLE["crawl_charset_decode"] = """
SELECT doc_id,
       md5(text || CASE doc_id % 4
                     WHEN 0 THEN ' café-é'
                     WHEN 1 THEN ' café-😀'
                     WHEN 2 THEN ''
                     ELSE ' café-é' END) AS text_md5
FROM documents ORDER BY doc_id
"""


ORACLE["crawl_prep"] = f"""
WITH good AS (
  SELECT doc_id, text FROM documents WHERE ({_QUALITY_SQL}) >= {CRAWL_QUALITY_MIN}
),
kept AS (
  SELECT min(doc_id) AS doc_id, count(*) AS n_copies
  FROM good GROUP BY sha256({_NORM})
)
SELECT cast(count(*) AS BIGINT) AS n_kept,
       cast(sum(n_copies) AS BIGINT) AS n_good,
       md5(string_agg(cast(doc_id AS VARCHAR), ',' ORDER BY cast(doc_id AS VARCHAR))) AS kept_ids_md5
FROM kept
"""


# ---------------------------------------------------------------------------
# multimodal_mp4_demux — REAL video frame extraction: each document
# becomes a valid single-track MP4 whose 16 frame sizes are its ascii
# bytes (chunked 5 samples per stco entry), and the Spark side resolves
# every frame's absolute byte range by walking the moov sample tables
# (stsz/stsc/stco/stss/stts). The oracle recomputes offsets as plain
# prefix sums over ascii() — an independent derivation that only agrees
# if the stsc/stco chunk-table arithmetic is right.
# ---------------------------------------------------------------------------
_MP4_KEYS = (1, 6, 11)
_MP4_DELTA = 40
_MP4_DATA_BASE = 36  # len(ftyp box) + mdat header


@_q("multimodal_mp4_demux")
def multimodal_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, demux_frames

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_mp4(batches):
        import pandas as pd

        from disq_spark.formats.mp4 import encode_mp4

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                sizes = list(bytes(px))
                payload = encode_mp4(
                    sizes, list(_MP4_KEYS), frame_delta=_MP4_DELTA,
                    samples_per_chunk=5,
                )
                rows.append((doc_id, "video/mp4", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_mp4, MEDIA_SCHEMA)
    return demux_frames(media).orderBy("doc_id", "frame_idx")


ORACLE["multimodal_mp4_demux"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, CAST(i - 1 AS INT) AS frame_idx,
       CAST({_MP4_DATA_BASE} + coalesce(list_sum(
           [ascii(substring(p, j, 1)) for j in generate_series(1, i - 1)]), 0)
         AS BIGINT) AS offset,
       CAST(ascii(substring(p, i, 1)) AS BIGINT) AS size,
       i IN {_MP4_KEYS} AS is_keyframe,
       CAST((i - 1) * {_MP4_DELTA} AS BIGINT) AS dts
FROM base, generate_series(1, {_JPEG_BYTES}) g(i)
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# multimodal_tiff_decode — the REAL baseline-TIFF codec (formats/
# tiff.py: LZW with the early width change + horizontal predictor) on
# the lossless 4x4-grayscale subspace; ascii() oracle like GIF/WebP.
# ---------------------------------------------------------------------------
@_q("multimodal_tiff_decode")
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_image

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_tiff(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.tiff import encode_tiff

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                img = np.frombuffer(bytes(px), np.uint8).reshape(4, 4)
                payload = encode_tiff(img, compression=5, predictor=2, rows_per_strip=2)
                rows.append((doc_id, "image/tiff", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_tiff, MEDIA_SCHEMA)
    feats = decode_image(media)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("r_mean"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("g_mean"),
        F.round(F.element_at("features", 3).cast("double"), 6).alias("b_mean"),
    ).orderBy("doc_id")


ORACLE["multimodal_tiff_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 4 AS width, 4 AS height,
       {_gray_mean_sql()} AS r_mean,
       {_gray_mean_sql()} AS g_mean,
       {_gray_mean_sql()} AS b_mean
FROM base ORDER BY doc_id
"""


ORACLE["multimodal_webp_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 4 AS width, 4 AS height,
       {_gray_mean_sql()} AS r_mean,
       {_gray_mean_sql()} AS g_mean,
       {_gray_mean_sql()} AS b_mean
FROM base ORDER BY doc_id
"""


ORACLE["multimodal_gif_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 4 AS width, 4 AS height,
       {_gray_mean_sql()} AS r_mean,
       {_gray_mean_sql()} AS g_mean,
       {_gray_mean_sql()} AS b_mean
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_flac_decode — the REAL FLAC codec (formats/flac.py: FIXED/
# LPC prediction, Rice residuals, CRCs, STREAMINFO MD5) in the gate:
# each ASCII document's first 16 bytes become 16-bit PCM samples
# ((ascii-96)*256, exact in int16), FLAC-encoded in the query and
# decoded through decode_audio's real path. Samples are multiples of
# 2^-7 after normalization, so sum-of-squares over 16 terms is exact in
# double and the oracle recomputes rms/peak from ascii() bit-identically.
# ---------------------------------------------------------------------------
@_q("multimodal_flac_decode")
def multimodal_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.multimodal import MEDIA_SCHEMA, decode_audio

    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").rlike("^[ -~]+$")
    )
    padded = F.rpad(F.substring("text", 1, _JPEG_BYTES), _JPEG_BYTES, " ")
    base = d.select("doc_id", padded.cast("binary").alias("px"))

    def to_flac(batches):
        import numpy as np
        import pandas as pd

        from disq_spark.formats.flac import encode_flac

        for pdf in batches:
            rows = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                pcm = (np.frombuffer(bytes(px), np.uint8).astype(np.int64) - 96) * 256
                payload = encode_flac(pcm, 16000, bps=16)
                rows.append((doc_id, "audio/flac", payload, len(payload), ""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "n_bytes", "content_md5"],
            )

    media = base.mapInPandas(to_flac, MEDIA_SCHEMA)
    return decode_audio(media).select(
        "doc_id", "sample_rate", "n_samples", "rms", "peak"
    ).orderBy("doc_id")


_FLAC_V = "((ascii(substring(p, i, 1)) - 96) / 128.0)"

ORACLE["multimodal_flac_decode"] = f"""
WITH base AS (
  SELECT doc_id, rpad(substring(text, 1, {_JPEG_BYTES}), {_JPEG_BYTES}, ' ') AS p
  FROM documents
  WHERE doc_id < 100 AND regexp_full_match(text, '[ -~]+')
)
SELECT doc_id, 16000 AS sample_rate, CAST({_JPEG_BYTES} AS BIGINT) AS n_samples,
       floor(sqrt(list_sum([{_FLAC_V} * {_FLAC_V} for i in generate_series(1, {_JPEG_BYTES})]) / {_JPEG_BYTES}.0) * 1e6 + 0.5) / 1e6 AS rms,
       floor(list_max([abs({_FLAC_V}) for i in generate_series(1, {_JPEG_BYTES})]) * 1e6 + 0.5) / 1e6 AS peak
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# streaming_dedup_gate — the applyInPandasWithState exact-dedup operator
# under the full hash gate: a bounded document stream deduplicated with
# keyed state must emit exactly one row per distinct fingerprint, so the
# emitted fingerprint set (order-insensitive) equals the batch DISTINCT
# — oracle-checkable even though "which copy arrived first" is not
# deterministic under parallel file reads.
# ---------------------------------------------------------------------------
@_q("streaming_dedup_gate")
def streaming_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.queries._stream_util import bounded_stream, run_to_completion
    from disq_spark.streaming.dedup import streaming_exact_dedup

    stream = bounded_stream(spark, sf_dir, "documents", ["doc_id", "text"])
    if spark.catalog.tableExists("stream_gate_dedup"):
        spark.catalog.dropTempView("stream_gate_dedup")  # re-run safety
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_gate_dedup")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, "streaming_dedup_gate")
    out = spark.table("stream_gate_dedup")
    return out.agg(
        F.count("*").alias("n_emitted"),
        F.countDistinct("fingerprint").alias("n_fingerprints"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("fingerprint")))).alias(
            "fingerprint_set_md5"
        ),
    )


ORACLE["streaming_dedup_gate"] = f"""
WITH fp AS (SELECT DISTINCT md5({_NORM}) AS f FROM documents)
SELECT cast(count(*) AS BIGINT) AS n_emitted,
       cast(count(*) AS BIGINT) AS n_fingerprints,
       md5(string_agg(f, '' ORDER BY f)) AS fingerprint_set_md5
FROM fp
"""


# ---------------------------------------------------------------------------
# streaming_neardup_gate — stateful streaming MinHash+LSH near-dup under
# the full hash gate. The operator's contract is the PAIR SET (min,max
# normalized), which is micro-batch- and order-independent, so the gate
# aggregates the distinct pairs into an order-insensitive fingerprint;
# the oracle recomputes the identical pair set with the batch minhash
# CTE chain, uncapped (streaming has no corpus-global df statistic —
# see streaming/neardup.py).
# ---------------------------------------------------------------------------
@_q("streaming_neardup_gate")
def streaming_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.queries._stream_util import bounded_stream, run_to_completion
    from disq_spark.streaming.neardup import streaming_minhash_pairs

    stream = bounded_stream(spark, sf_dir, "documents", ["doc_id", "text"])
    if spark.catalog.tableExists("stream_gate_neardup"):
        spark.catalog.dropTempView("stream_gate_neardup")
    q = (
        streaming_minhash_pairs(stream, threshold=MINHASH_THRESHOLD)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_gate_neardup")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, "streaming_neardup_gate")
    pairs = spark.table("stream_gate_neardup").dropDuplicates(["id_a", "id_b"])
    tag = F.concat_ws(
        ":",
        F.col("id_a").cast("string"),
        F.col("id_b").cast("string"),
        F.format_string("%.4f", F.col("est_jaccard")),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list(tag)))).alias(
            "pair_set_md5"
        ),
    )


ORACLE["streaming_neardup_gate"] = f"""
WITH {_minhash_pair_ctes(max_df_sql="1e18")},
tags AS (
  SELECT cast(id_a AS VARCHAR) || ':' || cast(id_b AS VARCHAR) || ':'
         || printf('%.4f', est_jaccard) AS tag
  FROM pairs
)
SELECT cast(count(*) AS BIGINT) AS n_pairs,
       md5(string_agg(tag, '|' ORDER BY tag)) AS pair_set_md5
FROM tags
"""


# ---------------------------------------------------------------------------
# streaming_embdup_gate — stateful streaming embedding near-dup (sign-
# LSH buckets, per-bucket vector state) under the full hash gate. Fixed
# n_bits (streaming cannot count the corpus first); the oracle is the
# batch bucket join at the same width, aggregated order-insensitively.
# ---------------------------------------------------------------------------
_STREAM_EMB_BITS = 8


@_q("streaming_embdup_gate")
def streaming_embdup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.queries._stream_util import bounded_stream, run_to_completion
    from disq_spark.streaming.neardup import streaming_embedding_neardup_pairs

    stream = bounded_stream(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    if spark.catalog.tableExists("stream_gate_embdup"):
        spark.catalog.dropTempView("stream_gate_embdup")
    q = (
        streaming_embedding_neardup_pairs(
            stream, threshold=EMB_DEDUP_THRESHOLD, n_bits=_STREAM_EMB_BITS
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_gate_embdup")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, "streaming_embdup_gate")
    pairs = spark.table("stream_gate_embdup").dropDuplicates(["id_a", "id_b"])
    tag = F.concat_ws(
        ":",
        F.col("id_a").cast("string"),
        F.col("id_b").cast("string"),
        F.format_string("%.4f", F.col("score")),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list(tag)))).alias(
            "pair_set_md5"
        ),
    )


_FIXED_VBUCKET = (
    "CAST(list_sum([CASE WHEN {vec}[i] >= 0.0 THEN CAST(pow(2, i - 1) AS BIGINT) "
    f"ELSE 0 END for i in generate_series(1, {_STREAM_EMB_BITS})]) AS BIGINT)"
)

ORACLE["streaming_embdup_gate"] = f"""
WITH a AS (
  SELECT vec_id AS id_a, embedding::DOUBLE[] AS av,
         {_FIXED_VBUCKET.format(vec='embedding')} AS bucket
  FROM embeddings
),
b AS (
  SELECT vec_id AS id_b, embedding::DOUBLE[] AS bv,
         {_FIXED_VBUCKET.format(vec='embedding')} AS bucket
  FROM embeddings
),
scored AS (
  SELECT id_a, id_b, round({_DOT_AB} / ({_NORM_A} * {_NORM_B}), 4) AS score
  FROM a JOIN b USING (bucket) WHERE id_a < id_b
),
tags AS (
  SELECT cast(id_a AS VARCHAR) || ':' || cast(id_b AS VARCHAR) || ':'
         || printf('%.4f', score) AS tag
  FROM scored WHERE score >= {EMB_DEDUP_THRESHOLD}
)
SELECT cast(count(*) AS BIGINT) AS n_pairs,
       md5(string_agg(tag, '|' ORDER BY tag)) AS pair_set_md5
FROM tags
"""


# ---------------------------------------------------------------------------
# dedup_incremental_gate — incremental exact dedup under the hash gate:
# a NEW batch deduped against the running hash index of everything seen
# (one anti-join; the corpus is never rescanned). The oracle replays the
# split: hashes of the old half exclude, min-id wins within the new half.
# ---------------------------------------------------------------------------
INCR_SPLIT = 250  # docs with doc_id < INCR_SPLIT are "already ingested"


@_q("dedup_incremental_gate")
def dedup_incremental_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") < INCR_SPLIT)
    new = d.filter(F.col("doc_id") >= INCR_SPLIT)
    seen = old.select(DD.content_hash(F.col("text")).alias("h")).distinct()
    kept, updated = DD.incremental_exact_dedup(new, seen)
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").alias("min_kept_id"),
        F.max("doc_id").alias("max_kept_id"),
    ).crossJoin(
        F.broadcast(updated.agg(F.count("*").alias("n_index_hashes")))
    )


ORACLE["dedup_incremental_gate"] = f"""
WITH oldh AS (SELECT DISTINCT sha256({_NORM}) AS h FROM documents WHERE doc_id < {INCR_SPLIT}),
newd AS (SELECT doc_id, sha256({_NORM}) AS h FROM documents WHERE doc_id >= {INCR_SPLIT}),
fresh AS (SELECT * FROM newd WHERE h NOT IN (SELECT h FROM oldh)),
reps AS (SELECT h, min(doc_id) AS doc_id FROM fresh GROUP BY h)
SELECT (SELECT count(*) FROM reps) AS n_kept,
       (SELECT min(doc_id) FROM reps) AS min_kept_id,
       (SELECT max(doc_id) FROM reps) AS max_kept_id,
       (SELECT count(*) FROM oldh) + (SELECT count(DISTINCT h) FROM fresh) AS n_index_hashes
"""


# ---------------------------------------------------------------------------
# dedup_incremental_store_gate — the PERSISTED-STORE shape of daily
# near-dup ingest (VERDICT r6 #5): the already-ingested corpus's
# signatures live as bucketed parquet assets (build_minhash_store,
# written once from the old half); the new batch joins the store's band
# table — the corpus text is never rescanned (plan-asserted in
# tests/test_operators.py::test_minhash_store_no_corpus_rescan). The
# oracle recomputes minhash over the FULL slice in SQL and restricts to
# pairs touching the batch: store-based pairs must equal full recompute
# exactly. No max_df on either side — stored signatures must depend
# only on document text, never corpus-wide stats, or batch-vs-store
# would drift from full recompute.
# ---------------------------------------------------------------------------
INCR_STORE_CAP = 2000  # gate slice bound: keeps the capless minhash tractable at sf>=5


@_q("dedup_incremental_store_gate")
def dedup_incremental_store_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < INCR_STORE_CAP)
    old = d.filter(F.col("doc_id") < INCR_SPLIT)
    new = d.filter(F.col("doc_id") >= INCR_SPLIT)
    store = "disq_incr_minhash_store"
    DD.build_minhash_store(
        old, store, num_hashes=NUM_HASHES, bands=BANDS, k=SHINGLE_K, stride=SHINGLE_STRIDE
    )
    pairs = DD.incremental_minhash_pairs_stored(
        new,
        store,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
    )
    return pairs.orderBy("id_a", "id_b")


ORACLE["dedup_incremental_store_gate"] = f"""
WITH {_minhash_pair_ctes(f"(SELECT * FROM documents WHERE doc_id < {INCR_STORE_CAP}) AS d", max_df_sql="1000000000")}
SELECT id_a, id_b, est_jaccard FROM pairs
WHERE id_b >= {INCR_SPLIT}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# text_substring_dup_rate — cross-document duplicated-substring share
# (distributed approximation of Lee et al. suffix-array substring dedup;
# positional word n-grams, cross-doc test = min(doc)!=max(doc) per gram)
# ---------------------------------------------------------------------------
SUBDUP_N = 5


@_q("text_substring_dup_rate")
def text_substring_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_doc = DD.substring_dup_rate(d, n=SUBDUP_N)
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dup_rate"), 4).alias("avg_dup_rate"),
            F.sum((F.col("dup_rate") >= 0.5).cast("long")).alias("n_heavy_dup"),
            F.sum("n_grams").alias("total_grams"),
        )
        .orderBy("source")
    )


ORACLE["text_substring_dup_rate"] = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {SUBDUP_N - 1}), ' ')), 1, 15)) AS BIGINT) AS gh
  FROM t, unnest(generate_series(1, len(toks) - {SUBDUP_N - 1})) AS u(i)
  WHERE len(toks) >= {SUBDUP_N}
),
gf AS (SELECT gh, (min(doc_id) <> max(doc_id)) AS is_dup FROM g GROUP BY gh),
per AS (
  SELECT g.doc_id, count(*) AS n_grams,
         avg(CASE WHEN gf.is_dup THEN 1.0 ELSE 0.0 END) AS dup_rate
  FROM g JOIN gf USING (gh) GROUP BY g.doc_id
)
SELECT d.source, count(*) AS n_docs, round(avg(per.dup_rate), 4) AS avg_dup_rate,
       CAST(sum(CASE WHEN per.dup_rate >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy_dup,
       CAST(sum(per.n_grams) AS BIGINT) AS total_grams
FROM per JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# text_substring_span_removal — the CLEANING step of Lee et al. ExactSubstr
# dedup (text_substring_dup_rate measures, this rewrites): maximal runs of
# token positions covered by cross-document duplicated n-grams are deleted
# when the run reaches min_span tokens. content_hash pins every cleaned
# text byte-exactly (md5 of per-doc md5s in doc_id order), so the oracle
# verifies the rewritten corpus, not just the counters.
# ---------------------------------------------------------------------------
SPANRM_N = 5
SPANRM_MIN = 20  # sf-synthetic run lengths span 5..93 — 20 exercises both branches


@_q("text_substring_span_removal")
def text_substring_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per = DD.remove_duplicate_spans(d, n=SPANRM_N, min_span=SPANRM_MIN)
    return (
        per.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_removed").alias("total_removed"),
            F.sum((F.col("n_removed") > 0).cast("long")).alias("n_docs_touched"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("doc_id"),
                                    F.md5("clean_text").alias("h"),
                                )
                            )
                        ),
                        lambda s: s["h"],
                    ),
                )
            ).alias("content_hash"),
        )
        .orderBy("source")
    )


ORACLE["text_substring_span_removal"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {SPANRM_N - 1}), ' ')), 1, 15)) AS BIGINT) AS gh
  FROM t, unnest(generate_series(1, len(toks) - {SPANRM_N - 1})) AS u(i)
  WHERE len(toks) >= {SPANRM_N}
),
gf AS (SELECT gh, (min(doc_id) <> max(doc_id)) AS is_dup FROM g GROUP BY gh),
cov AS (
  SELECT DISTINCT g.doc_id, g.pos + j AS ti
  FROM g JOIN gf USING (gh), unnest(generate_series(0, {SPANRM_N - 1})) AS v(j)
  WHERE gf.is_dup
),
runs AS (
  SELECT doc_id, ti, ti - row_number() OVER (PARTITION BY doc_id ORDER BY ti) AS grp
  FROM cov
),
rem AS (
  SELECT doc_id, ti FROM (
    SELECT doc_id, ti, count(*) OVER (PARTITION BY doc_id, grp) AS run_len FROM runs
  ) WHERE run_len >= {SPANRM_MIN}
),
tok AS (
  SELECT doc_id, u.i AS ti, toks[u.i] AS tok
  FROM t, unnest(generate_series(1, len(toks))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, count(*) AS n_kept,
         coalesce(string_agg(tok.tok, ' ' ORDER BY tok.ti), '') AS clean_text
  FROM tok
  WHERE NOT EXISTS (SELECT 1 FROM rem WHERE rem.doc_id = tok.doc_id AND rem.ti = tok.ti)
  GROUP BY tok.doc_id
),
per AS (
  SELECT t.doc_id, len(t.toks) AS n_tokens,
         len(t.toks) - coalesce(k.n_kept, 0) AS n_removed,
         coalesce(k.clean_text, '') AS clean_text
  FROM t LEFT JOIN kept k USING (doc_id)
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(per.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(per.n_removed) AS BIGINT) AS total_removed,
       CAST(sum(CASE WHEN per.n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched,
       md5(string_agg(md5(per.clean_text), '' ORDER BY per.doc_id)) AS content_hash
FROM per JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# dedup_edit_distance — the fuzzy VERIFICATION tier: Levenshtein over
# normalized text, computed only on shingle-candidate pairs (sketches
# propose, exact string metric disposes). Both engines implement the
# same classic DP metric, so lev/ratio are hash-exact.
# ---------------------------------------------------------------------------
EDIT_MAX_RATIO = 0.6
EDIT_CAND_THRESHOLD = 0.1


@_q("dedup_edit_distance")
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.edit_distance_pairs(
        d,
        max_ratio=EDIT_MAX_RATIO,
        candidate_threshold=EDIT_CAND_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
    ).orderBy("id_a", "id_b")


ORACLE["dedup_edit_distance"] = f"""
WITH {_oracle_sh_cte()},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cand AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
  WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) >= {EDIT_CAND_THRESHOLD}
),
norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
-- lev computed ONCE per pair (DuckDB does not CSE the O(len^2) DP;
-- inlining it in ratio doubled the oracle's dominant cost — r11)
lv AS (
  SELECT id_a, id_b, levenshtein(na.nt, nb.nt) AS lev,
         greatest(length(na.nt), length(nb.nt)) AS ml
  FROM cand JOIN norm na ON id_a = na.doc_id JOIN norm nb ON id_b = nb.doc_id
),
scored AS (
  SELECT id_a, id_b, lev, round(lev * 1.0 / ml, 4) AS ratio FROM lv
)
SELECT id_a, id_b, lev, ratio FROM scored
WHERE ratio <= {EDIT_MAX_RATIO} ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# dedup_verified — propose -> dispose as a first-class gated operator
# (operators/dedup.py verified_pairs, r11): winnowing PROPOSES (substring
# witnesses; P 0.078 standalone — a footgun unverified, SCALE.md §r10),
# Levenshtein DISPOSES (measured P 1.000 after verification). The oracle
# replays the winnowing candidate CTE and verifies with DuckDB's
# levenshtein — the same DP metric, hash-exact.
# ---------------------------------------------------------------------------
VERIFY_MAX_RATIO = 0.6


@_q("dedup_verified")
def dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cand = DD.winnowing_pairs(
        d, k=WINNOW_K, w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED, max_df=WINNOW_MAX_DF,
    )
    return DD.verified_pairs(d, cand, max_ratio=VERIFY_MAX_RATIO).orderBy(
        "id_a", "id_b"
    )


ORACLE["dedup_verified"] = f"""
WITH {_WINNOW_FP_CTES},
fpd AS (SELECT DISTINCT doc_id, fp FROM fp),
keep AS (SELECT fp FROM fpd GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}),
fpk AS (SELECT fpd.doc_id, fpd.fp FROM fpd JOIN keep USING (fp)),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
),
nrm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
-- lev computed ONCE per pair (DuckDB does not CSE the O(len^2) DP;
-- inlining it in ratio doubled the oracle's dominant cost — r11)
lv AS (
  SELECT id_a, id_b, levenshtein(na.nt, nb.nt) AS lev,
         greatest(length(na.nt), length(nb.nt)) AS ml
  FROM cand JOIN nrm na ON id_a = na.doc_id JOIN nrm nb ON id_b = nb.doc_id
),
scored AS (
  SELECT id_a, id_b, lev,
         CASE WHEN ml = 0 THEN 0.0 ELSE round(lev * 1.0 / ml, 4) END AS ratio
  FROM lv
)
SELECT id_a, id_b, lev, ratio FROM scored
WHERE ratio <= {VERIFY_MAX_RATIO} ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# text_gopher_repetition — Gopher repetition-rule signals (Rae et al. 2021
# Table A1): top n-gram char fraction (n=2..4) and duplicate n-gram char
# fraction (n=5,10). Character mass counts token characters (no spaces),
# per occurrence, over the doc's total token char mass.
# ---------------------------------------------------------------------------
@_q("text_gopher_repetition")
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = DD.gopher_repetition(d, "text", "doc_id", top_ns=(2, 3, 4), dup_ns=(5, 10))
    return out.orderBy("doc_id")


def _gopher_gram_cte(n: int) -> str:
    return f"""
g{n} AS (
  SELECT doc_id,
         array_to_string(t[i:i+{n - 1}], ' ') AS g,
         length(array_to_string(t[i:i+{n - 1}], ' ')) - {n - 1} AS chars
  FROM toks, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
gc{n} AS (
  SELECT doc_id, g, count(*) AS c, min(chars) AS chars
  FROM g{n} GROUP BY doc_id, g
)"""


ORACLE["text_gopher_repetition"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 200
),
base AS (
  SELECT doc_id, len(t) AS n_tokens,
         coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS chars
  FROM toks
),
{",".join(_gopher_gram_cte(n).lstrip() for n in (2, 3, 4, 5, 10))},
top2 AS (SELECT doc_id, max_by(c * chars, c * 1000000 + chars) AS v FROM gc2 GROUP BY doc_id),
top3 AS (SELECT doc_id, max_by(c * chars, c * 1000000 + chars) AS v FROM gc3 GROUP BY doc_id),
top4 AS (SELECT doc_id, max_by(c * chars, c * 1000000 + chars) AS v FROM gc4 GROUP BY doc_id),
dup5 AS (SELECT doc_id, sum(c * chars) AS v FROM gc5 WHERE c > 1 GROUP BY doc_id),
dup10 AS (SELECT doc_id, sum(c * chars) AS v FROM gc10 WHERE c > 1 GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       round(coalesce(top2.v, 0) * 1.0 / nullif(b.chars, 0), 4) AS top_2gram_char_frac,
       round(coalesce(top3.v, 0) * 1.0 / nullif(b.chars, 0), 4) AS top_3gram_char_frac,
       round(coalesce(top4.v, 0) * 1.0 / nullif(b.chars, 0), 4) AS top_4gram_char_frac,
       round(coalesce(dup5.v, 0) * 1.0 / nullif(b.chars, 0), 4) AS dup_5gram_char_frac,
       round(coalesce(dup10.v, 0) * 1.0 / nullif(b.chars, 0), 4) AS dup_10gram_char_frac
FROM base b
LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
LEFT JOIN top4 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
LEFT JOIN dup10 USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text_dsir_weights — DSIR importance resampling weights (Xie et al. 2023):
# hashed unigram+bigram bucket models, add-1 smoothed, fit on a target
# slice (source = 'src0') vs the full raw corpus; per-doc logweight =
# sum of bucket log-ratios. The quality-targeted data-selection
# primitive. Oracle rebuilds the identical pipeline in DuckDB from the
# same (buckets, smoothing, rounding) constants.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 1024


@_q("text_dsir_weights")
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.sampling import dsir_weights

    d = load(spark, sf_dir, "documents")
    target = d.filter(F.col("source") == "src0")
    return dsir_weights(d, target, buckets=DSIR_BUCKETS).orderBy("doc_id")


def _dsir_oracle(buckets: int) -> str:
    feats = f"""
    SELECT doc_id,
           CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % {buckets} AS bucket
    FROM (
      SELECT doc_id, unnest(list_concat(
        toks,
        CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END)) AS f
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents{{WHERE}})
    )"""
    rawf = feats.replace("{WHERE}", "")
    tgtf = feats.replace("{WHERE}", " WHERE source = 'src0'")
    return f"""
WITH rawf AS ({rawf}),
tgtf AS ({tgtf}),
rcnt AS (SELECT bucket, count(*) AS rc FROM rawf GROUP BY bucket),
tcnt AS (SELECT bucket, count(*) AS tc FROM tgtf GROUP BY bucket),
tot AS (SELECT (SELECT count(*) FROM rawf) AS rt, (SELECT count(*) FROM tgtf) AS tt),
w AS (
  SELECT b.range AS bucket,
         ln(CAST(coalesce(tc, 0) + 1 AS DOUBLE) / (tt + {buckets}))
           - ln(CAST(coalesce(rc, 0) + 1 AS DOUBLE) / (rt + {buckets})) AS logratio
  FROM range({buckets}) b
  LEFT JOIN rcnt ON rcnt.bucket = b.range
  LEFT JOIN tcnt ON tcnt.bucket = b.range, tot
)
SELECT doc_id, count(*) AS n_features, round(sum(logratio), 6) AS logweight
FROM rawf JOIN w USING (bucket)
GROUP BY doc_id ORDER BY doc_id
"""


ORACLE["text_dsir_weights"] = _dsir_oracle(DSIR_BUCKETS)


# ---------------------------------------------------------------------------
# text_importance_resample — the sampling half of DSIR: draw k docs
# without replacement with probability proportional to exp(logweight)
# via the deterministic Gumbel-top-k trick (md5-uniform noise, so the
# selected set is engine- and partitioning-invariant and the oracle
# replays it exactly).
# ---------------------------------------------------------------------------
RESAMPLE_K = 50
RESAMPLE_SEED = "dsir_v1"


@_q("text_importance_resample")
def text_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.sampling import dsir_weights, importance_resample

    d = load(spark, sf_dir, "documents")
    target = d.filter(F.col("source") == "src0")
    scored = dsir_weights(d, target, buckets=DSIR_BUCKETS)
    return importance_resample(
        scored, RESAMPLE_K, seed=RESAMPLE_SEED
    ).orderBy(F.col("gumbel_key").desc(), "doc_id")


def _resample_oracle() -> str:
    from disq_spark.operators.sampling import importance_resample_sql

    return importance_resample_sql(
        _dsir_oracle(DSIR_BUCKETS), RESAMPLE_K, seed=RESAMPLE_SEED
    )


ORACLE["text_importance_resample"] = _resample_oracle()


# ---------------------------------------------------------------------------
# dedup_keep_best — quality-aware cluster representative selection: per
# near-dup component, keep the longest member (ties -> min id). The
# oracle reuses the label-propagation closure and picks winners with a
# window over (n_chars DESC, node ASC).
# ---------------------------------------------------------------------------
@_q("dedup_keep_best")
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        k=SHINGLE_K,
        stride=SHINGLE_STRIDE,
        max_df=_max_df(spark, sf_dir),
    )
    return DD.component_best(d, pairs, "n_chars").orderBy("comp")


def _keep_best_oracle() -> str:
    edges = f"""CREATE OR REPLACE TEMP TABLE __kb_edges AS
WITH {_minhash_pair_ctes()}
SELECT id_a AS a, id_b AS b FROM pairs
UNION
SELECT id_b AS a, id_a AS b FROM pairs;"""
    prop, last, unconverged = _label_prop_stmts("__kb_edges", "__kb")
    final = f"""SELECT comp, winner, best_score, size FROM (
  SELECT l.comp AS comp,
         first(l.node ORDER BY d.n_chars DESC, l.node ASC) AS winner,
         max(d.n_chars) AS best_score,
         CAST(count(*) AS BIGINT) AS size
  FROM {last} l JOIN documents d ON d.doc_id = l.node
  GROUP BY l.comp
)
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
WHERE {unconverged}
ORDER BY comp;"""
    return "\n".join([edges] + prop + [final])


ORACLE["dedup_keep_best"] = _keep_best_oracle()


# deferred: these oracle builders reference helpers (_QUALITY_SQL,
# _minhash_pair_ctes) defined between the gates and here
ORACLE["crawl_pipeline_full"] = _full_pipeline_oracle()
ORACLE["dedup_lsh_recall"] = _lsh_recall_oracle()


# forced-kernel gates share their base oracles verbatim (see the
# *_blas block above): one oracle, two kernels, both hash-gated
for _b in (
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "text_classifier_score",
    "dedup_semantic",
):
    ORACLE[f"{_b}_blas"] = ORACLE[_b]
del _b


# ---------------------------------------------------------------------------
# text_chunk_windows — fixed-token training windows with overlap
# (operators/sampling.chunk_token_windows): the long-document counterpart of
# pack_sequences. Oracle: the same window arithmetic in DuckDB
# (chunk_token_windows_sql), bucket-aggregated with an order-pinned string
# fingerprint (zero-padded keys so string order == numeric order).
# ---------------------------------------------------------------------------
TOKWIN_MAX = 48
TOKWIN_OVERLAP = 8


@_q("text_chunk_windows")
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from disq_spark.operators.sampling import chunk_token_windows

    d = load(spark, sf_dir, "documents")
    ch = chunk_token_windows(d, max_tokens=TOKWIN_MAX, overlap=TOKWIN_OVERLAP)
    s = F.concat_ws(
        ":",
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        F.lpad(F.col("chunk_id").cast("string"), 6, "0"),
        F.md5("chunk_text"),
    )
    return (
        ch.groupBy((F.col("doc_id") % 16).alias("bucket"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list(s)))).alias("h"),
        )
        .orderBy("bucket")
    )


def _chunk_oracle() -> str:
    from disq_spark.operators.sampling import chunk_token_windows_sql

    return f"""WITH {chunk_token_windows_sql(TOKWIN_MAX, TOKWIN_OVERLAP)}
SELECT doc_id % 16 AS bucket, count(*) AS n_chunks, sum(n_tokens) AS sum_tokens,
       md5(string_agg(lpad(doc_id::VARCHAR, 12, '0') || ':' ||
                      lpad(chunk_id::VARCHAR, 6, '0') || ':' || md5(chunk_text),
                      ',' ORDER BY lpad(doc_id::VARCHAR, 12, '0') || ':' ||
                                   lpad(chunk_id::VARCHAR, 6, '0') || ':' || md5(chunk_text))) AS h
FROM chunks GROUP BY bucket ORDER BY bucket"""


ORACLE["text_chunk_windows"] = _chunk_oracle()
