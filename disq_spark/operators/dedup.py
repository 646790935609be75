"""Deduplication operators for LLM training-data pipelines.

Six tiers, all pure DataFrame transforms (no Python UDFs — everything
stays in whole-stage codegen):

- exact_dedup:        sha256 content hash -> groupBy. One shuffle on the
                      hash; at 100 TB this is the canonical first pass.
- minhash_lsh_pairs:  char-shingle MinHash signatures + LSH banding.
                      Candidate generation joins on band keys only —
                      never all-pairs — so cost is O(sum of bucket^2)
                      instead of O(n^2). Shingles/signatures are one
                      explode + one groupBy (single shuffle).
- ngram_jaccard_pairs: exact Jaccard on shared-shingle candidate pairs
                      (inverted-index join; pairs sharing >=1 shingle).
- simhash:            64-bit SimHash via md5-derived bit planes; near-dup
                      candidates = equal simhash (or hamming-banded
                      slices, pigeonhole-complete — simhash_pairs).
- substring_dup_rate: positional word n-grams; per-doc share of
                      positions whose gram occurs in another document
                      (suffix-array substring-dedup approximation).
- edit_distance_pairs: Levenshtein verification tier computed only on
                      shingle-candidate pairs (sketches propose, the
                      exact string metric disposes).
- verified_pairs:     the same propose->dispose verifier over ANY
                      external candidate frame (winnowing, minhash,
                      streaming sinks) — measured P 1.000 compositions
                      in SCALE.md §r10 promoted to a first-class op.

Determinism contract: all hashing is md5-of-string (identical in any
engine), so every operator here has an exact ANSI-SQL oracle. MinHash
uses ONE md5 per shingle (its first 15 hex chars as a 60-bit int) fed
through a fixed universal-hash family ((a_i*h + b_i) mod 2^31-1) — the
classic Carter-Wegman construction — so the per-shingle cost is one
digest + num_hashes integer multiply-adds instead of num_hashes
digests, and signature state is 8 B/component instead of a 32-char
string. Any SQL engine reproduces the base hash via
CAST('0x' || substr(md5(s),1,15) AS BIGINT).

Scale notes: the only O(n^2) danger is hot shingles/buckets (boilerplate
text). ``max_df`` caps shingle document frequency — the standard
production mitigation; AQE skew-join handles moderate residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from disq_spark.functions.text import normalize, tokens

DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # rows per band = num_hashes // bands

# -- persisted-intermediate lifecycle ----------------------------------------
# The LSH / inverted-index operators persist corpus-derived intermediates
# (signature and shingle-hash tables) that feed self-joins. The returned
# DataFrames are lazy, so the operator can never know when its caller has
# materialized the result — unpersisting before the action would defeat
# the compute-once marker. Session contract (r8 verdict/advice):
#   * every persist in this module is registered here;
#   * a long-lived session running many dedup jobs calls
#     ``release_caches()`` after consuming each result (the gate replica
#     and bench.py do) — otherwise MEMORY_AND_DISK entries accumulate
#     until LRU eviction, and disk blocks are NOT evicted by memory
#     pressure;
#   * after rewriting input files at the same path mid-session, call
#     ``release_caches()`` (or ``spark.catalog.clearCache()``) BEFORE
#     re-running: CacheManager matches canonical plans across calls, so
#     a stale cache entry would silently serve the old bytes.
_TRACKED: list[DataFrame] = []


def _persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def release_caches(blocking: bool = True) -> int:
    """Unpersist every intermediate persisted by this module's operators;
    returns how many were released. Safe at any time: Spark recomputes
    lazily if a released plan is re-used. ``blocking=True`` so a caller
    asserting on cache state (tests) sees the release immediately."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            # the owning SparkSession may already be stopped (multi-
            # session process): the entry is unrecoverable either way,
            # so drop it and keep draining — a raise here would strand
            # every remaining tracked entry
            pass
    return n

# Universal-hash modulus for minhash components: 2^31-1 (Mersenne prime).
# Keeps a*h+b < 2^62 — inside signed int64 in Spark AND DuckDB, so the
# oracle arithmetic is bit-identical with no overflow in either engine.
MINHASH_PRIME = (1 << 31) - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficients for the minhash family
    h_i(x) = (a_i * x + b_i) mod MINHASH_PRIME, a_i != 0.

    Derived from md5 of a fixed label so Spark code and generated SQL
    oracles embed the exact same literals."""
    import hashlib

    params = []
    for i in range(num_hashes):
        a = (
            int(hashlib.md5(f"disq-mh-a-{i}".encode()).hexdigest()[:8], 16)
            % (MINHASH_PRIME - 1)
            + 1
        )
        b = int(hashlib.md5(f"disq-mh-b-{i}".encode()).hexdigest()[:8], 16) % MINHASH_PRIME
        params.append((a, b))
    return params


def gram_hash(col) -> F.Column:
    """60-bit integer fingerprint of a gram/shingle: first 15 hex chars
    of md5 as an int64. SQL equivalent:
    CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT).

    Hashing before a shuffle cuts the exchanged key from tens of bytes
    (a 13-word gram is ~80 B) to 8 B; at 2^60 key space the collision
    expectation is ~n^2/2^61 — at 10^12 distinct grams that's a ~4e-7
    relative error, the standard fingerprinting trade (Rabin/datasketch
    do the same)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_base_hash(col) -> F.Column:
    """60-bit integer base hash of a shingle: first 15 hex chars of md5,
    reduced mod MINHASH_PRIME. SQL equivalent:
    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647."""
    return gram_hash(col) % F.lit(MINHASH_PRIME)


def content_hash(col) -> F.Column:
    """sha256 over normalized text — the exact-dedup key."""
    return F.sha2(normalize(col), 256)


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_rows: bool = False,
) -> DataFrame:
    """Keep the min-id representative per identical (normalized) text.

    Default: one row per distinct text with only (id_col, n_copies) —
    the groupBy projects the other columns away. One hash-shuffle on the
    64-hex-char digest; map-side partial agg keeps shuffle volume
    ~= distinct count.

    ``keep_rows=True``: the common "give me the surviving documents"
    call as ONE operator — ``min_by(struct(all columns), id)`` carries
    the representative's full row through the same single shuffle
    (no groupBy-then-rejoin second scan/shuffle), plus ``n_copies``.
    """
    h = content_hash(F.col(text_col))
    if not keep_rows:
        return (
            df.withColumn("__h", h)
            .groupBy("__h")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
            .drop("__h")
        )
    cols = df.columns
    kept = (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(
            F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"),
            F.count("*").alias("n_copies"),
        )
    )
    return kept.select(*[F.col(f"__row.{c}").alias(c) for c in cols], "n_copies")


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
) -> DataFrame:
    """(id, shingle) inverted-index rows — distinct shingles per doc.

    ``max_df``: drop shingles appearing in more than this many documents
    — the hot keys that make the candidate join quadratic; capping df is
    the standard production mitigation (and the one that keeps the
    inverted-index tiers viable at 100 TB). Quality caveat (measured,
    r10 planted-truth benchmark — SCALE.md §r10): a duplicate CLUSTER
    larger than ``max_df`` pushes its own shingles past the cap, so the
    cap trades away recall on exactly the heaviest dup clusters; it is
    a COST bound. Where candidate generation doesn't need it (minhash
    banding: 1 row/doc/band at any df), prefer uncapped for quality.

    Implementation notes (each measured at sf0.1, 32 cores):
    - The repartition keeps the CPU-bound explode off a single task when
      the source is narrower than the core count (one small parquet file
      -> serial explode, 2.6s vs 0.4s). At 100 TB sources already carry
      >> cores partitions and the branch never fires.
    - The normalize regex is projected BEFORE the explode so Catalyst's
      project collapsing cannot inline it once per lambda element
      (measured 7x slowdown in the fused form); the repartition exchange
      is the materialization barrier.
    - max_df pruning: groupBy(shingle).count() -> hot-shingle blacklist
      -> broadcast LEFT ANTI join. The count shuffle carries one row per
      (map partition, distinct shingle) thanks to partial aggregation —
      a shingle in 10^9 docs contributes #map-partitions rows, not 10^9
      — and the blacklist (shingles above max_df) is small by
      construction, so the anti join broadcasts and the main path never
      shuffles on the skewed key. The previously-used window count
      (partitionBy shingle) shuffled the entire inverted index AND sent
      every occurrence of a hot shingle to a single reducer — the exact
      skew max_df exists to kill. Costs one recompute of the explode
      (CPU-bound, embarrassingly parallel — wall-clock safe), saves the
      skew bottleneck. No caching anywhere: cache builds fed by a
      shuffle measured slower than recomputing.
    """
    norm = df.select(
        F.col(id_col),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias("__t"),
    )
    # hash-by-id, not round-robin: a keyless repartition pays the
    # deterministic map-side sort of the (wide) text rows
    # (SPARK-23207); ids are unique so the hash spread is as even.
    # Measured at sf0.1: minhash end-to-end 2.42 -> 1.86 s.
    from disq_spark.operators.dispatch import fan_out

    norm = fan_out(norm, id_col)
    sh = norm.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, greatest(cast(floor((length(__t) - {k}) / {stride}) as int), 0)), "
                    f"i -> substring(__t, i * {stride} + 1, {k}))"
                )
            )
        ).alias("shingle"),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
) -> DataFrame:
    """One row per doc: id + mh_0..mh_{n-1} (int64 minhash components).

    Single explode + single groupBy. One md5 per shingle (60-bit base
    hash) fans out to num_hashes components via the Carter-Wegman family
    (a_i*h + b_i) mod 2^31-1 — integer multiply-adds in codegen instead
    of num_hashes separate digests, and 8 B of agg state per component
    instead of a 32-char hex string. At 100 TB the signature table
    shrinks 4x and the digest work per shingle drops num_hashes-fold.
    """
    sh = shingle_table(df, text_col, id_col, k, stride, max_df)
    sh = sh.select(F.col(id_col), minhash_base_hash(F.col("shingle")).alias("__h"))
    # one F.expr per component, not nested Column arithmetic: every
    # Column op is a py4j round trip and every intermediate Dataset
    # re-runs the analyzer — plan-build cost was 0.68 s/call at r11
    # profiling, ~all driver-side. The parsed expression tree is
    # identical (integer literals, same operators), so the gate oracle
    # is unaffected.
    aggs = [
        F.expr(f"min(({a} * __h + {b}) % {MINHASH_PRIME}) AS mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _mh_array(num_hashes: int, alias: str = "mh") -> F.Column:
    """``array(mh_0, ..., mh_{n-1}) AS mh`` as one parsed expression
    (one py4j round trip instead of num_hashes+1 Column calls)."""
    return F.expr(
        "array(" + ", ".join(f"mh_{i}" for i in range(num_hashes)) + f") AS {alias}"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
    method: str = "auto",
    carry_signatures: bool | str = "auto",
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b and
    est_jaccard = fraction of equal signature components >= threshold.
    Candidates come only from docs sharing a band bucket.

    Design-point guidance (measured against planted truth on Zipf
    corpora, SCALE.md §r10 quality tables): run UNCAPPED (max_df=None)
    for retrieval quality — banding bounds candidate fan-out at one
    row/doc/band at any df, and the cap blinds the tier to dup clusters
    larger than itself. At 2 rows/band, widening the signature raises
    BOTH precision and recall (8/4: P .77/R .41 -> 32/16: P .92/R .57
    at 50k docs; the same ordering holds at 250k/500k) for linearly
    more signature bytes; the gate default stays 8/4 because the
    sf0.01 verification corpus doesn't exercise the difference.

    Plan shape (deliberately small — codegen time on a wide plan was the
    measured bottleneck, not compute): band keys come from ONE
    posexplode over an array of per-band md5s (not a bands-way union).
    One aggregate shuffle for signatures, one shuffle for the bucket
    join, one for pair distinct.

    ``carry_signatures`` picks how the signature reaches scoring:

    - ``True`` ("carry"): the full signature array rides along into the
      bucket self-join, so est_jaccard is a zip_with over columns
      already present — no join-back. Cheapest at NARROW signatures:
      the carried array widens every bucket row and every pair-distinct
      state entry by num_hashes x 8 B x 2 sides, which is the measured
      heap cliff at wide design points (32 hashes x 16 bands x 500k
      Zipf docs needed 48 GB heap, SCALE.md §r10 — the whole candidate
      volume rides the exchange and the distinct's hash map).
    - ``False`` ("lean"): buckets carry only (band, band_key, id); the
      pair distinct dedups bare (id_a, id_b) pairs, then TWO
      shuffle-hash joins against the persisted signature table attach
      mh_a/mh_b for scoring. Two extra narrow shuffles, but exchange
      and distinct state are ~16 B/row regardless of signature width —
      this is what unlocks the quality-recommended 32/16 design point
      at corpus scale (same output bit-for-bit; equality locked by
      tests/test_dedup.py). The join-backs are HINTED shuffle_hash with
      the signature table as build side: Catalyst's size estimate
      UNDERCOUNTS array columns and would otherwise broadcast a
      corpus-proportional table (the r9 OOM lesson), and SMJ would
      sort the much larger pair side for no benefit.
    - ``"auto"`` (default): carry iff num_hashes <= 8 — the measured
      safe width (8/4 at 500k docs ran in 37 s inside the default
      heap); wider signatures go lean.
    """
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, stride, max_df)
    sig = sig.select(F.col(id_col), _mh_array(num_hashes))
    # sig feeds both sides of the self-join below. Materialize it once:
    # the signature table is 1 row/doc x (id + num_hashes*8 B) — tiny
    # relative to the corpus — while its lineage (explode + hot-shingle
    # count + agg) is the expensive part, and exchange reuse does NOT
    # kick in for the aliased self-join sides (verified: the SMJ plan
    # shows two full Exchange chains, no ReusedExchange). persist, NOT
    # localCheckpoint: checkpoint converts the plan to an RDD at BUILD
    # time — a full analyze/optimize/codegen pass of the 128-agg
    # subplan, measured 2.5 s per rebuild warm and ~6 s cold at sf0.1
    # (r8 profile), which dominated the whole query; persist is a lazy
    # marker with the same compute-once property (CacheManager dedups
    # identical canonical plans, MEMORY_AND_DISK evicts under pressure).
    # Bench: cold 9.9 -> 4.0 s, warm 2.6 -> 2.4 s for the full pipeline.
    sig = _persist_tracked(sig)

    band_keys = _band_key_array(num_hashes, bands)
    carry = (
        num_hashes <= 8 if carry_signatures == "auto" else bool(carry_signatures)
    )
    if carry:
        buckets = sig.select(
            F.col(id_col), F.col("mh"), F.posexplode(band_keys).alias("band", "band_key")
        )
        left = buckets.select(
            F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a")
        )
        right = buckets.select(
            F.col("band").alias("band_r"),
            F.col("band_key").alias("band_key_r"),
            F.col(id_col).alias("id_b"),
            F.col("mh").alias("mh_b"),
        )
        cand = (
            left.join(
                right,
                (F.col("band") == F.col("band_r"))
                & (F.col("band_key") == F.col("band_key_r"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b", "mh_a", "mh_b")
            .distinct()  # mh_* are functionally dependent on the ids
        )
    else:
        buckets = sig.select(
            F.col(id_col), F.posexplode(band_keys).alias("band", "band_key")
        )
        left = buckets.select(
            F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
        )
        right = buckets.select(
            F.col("band").alias("band_r"),
            F.col("band_key").alias("band_key_r"),
            F.col(id_col).alias("id_b"),
        )
        pairs = (
            left.join(
                right,
                (F.col("band") == F.col("band_r"))
                & (F.col("band_key") == F.col("band_key_r"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
            .distinct()
        )
        cand = (
            pairs.join(
                sig.select(
                    F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a")
                ).hint("shuffle_hash"),
                "id_a",
            )
            .join(
                sig.select(
                    F.col(id_col).alias("id_b"), F.col("mh").alias("mh_b")
                ).hint("shuffle_hash"),
                "id_b",
            )
            .select("id_a", "id_b", "mh_a", "mh_b")
        )

    # est_jaccard = fraction of equal signature components. Integer
    # equality counting is exact in any engine, so the Arrow-batched
    # numpy path is bit-identical to the zip_with fold while skipping
    # the interpreted per-component lambda (num_hashes ops/pair; the
    # JVM runs HOF lambdas interpreted — SCALE.md, SemDeDup lesson).
    # Under ~50k docs the Python-worker spin-up + Arrow round-trip
    # outweighs the interpreted fold (r6 bench: sf0.1 warm 2.37->2.94 s
    # on the numpy path, sf10 a clear numpy win) — method="auto"
    # dispatches on the input's Catalyst size estimate.
    return _score_signature_pairs(cand, num_hashes, threshold, method, df)


def _score_signature_pairs(
    cand: DataFrame,
    num_hashes: int,
    threshold: float,
    method: str,
    dispatch_df: DataFrame,
) -> DataFrame:
    """(id_a, id_b, mh_a, mh_b) candidates -> (id_a, id_b, est_jaccard)
    rows passing ``threshold``. Shared by the one-shot and the
    store-backed LSH paths; ``dispatch_df`` supplies the Catalyst size
    estimate for the SQL/numpy choice (see operators/dispatch.py)."""
    from disq_spark.operators.dispatch import resolve_method

    if resolve_method(method, dispatch_df) == "sql":
        # one parsed expression == the previous zip_with/aggregate
        # Column-lambda tree (CASE WHEN is exactly F.when); Column
        # lambdas cost dozens of py4j round trips per build
        eq_sum = F.expr(
            "aggregate(zip_with(mh_a, mh_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
            "0, (acc, x) -> acc + x)"
        )
        return (
            cand.withColumn(
                "est_jaccard", F.round(eq_sum / F.lit(float(num_hashes)), 4)
            )
            .filter(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard")
        )
    id_t = cand.schema["id_a"].dataType.simpleString()
    thr = float(threshold)
    nh = float(num_hashes)

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf["mh_a"].to_numpy())
            b = np.stack(pdf["mh_b"].to_numpy())
            # half-up like Spark's F.round / DuckDB round() — np.round is
            # half-to-even and diverges on exact halfway points such as
            # 68/128 = 0.53125 (values are nonnegative, no sign handling)
            est = np.floor((a == b).sum(axis=1) / nh * 1e4 + 0.5) / 1e4
            keep = est >= thr
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "est_jaccard": est[keep],
                }
            )

    return cand.mapInPandas(score, f"id_a {id_t}, id_b {id_t}, est_jaccard double")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.4,
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
    two_level_agg: bool = False,
    agg_buckets: int = 16,
    prefix_filter: bool | str = "auto",
) -> DataFrame:
    """Exact Jaccard over shingle sets, computed only for pairs that share
    at least one shingle (inverted-index candidate join).

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    ``two_level_agg``: classic partial-agg salting probe for the
    measured sf10 single-box knee (SCALE.md: 872M pair rows into one
    hash agg) — pre-aggregate counts per (shingle mod agg_buckets,
    pair) before the global pair groupBy. MEASURED NEGATIVE at sf10
    (SCALE.md §round-7 probe: 104 s baseline vs 206 s two-level, clean
    box, identical pairs): candidate pairs overwhelmingly share one
    kept shingle, so the pre-agg shrinks nothing while adding a full
    extra shuffle with MORE distinct groups. Kept available (default
    off) as the documented negative; the scale-out lever for the knee
    is executors over the uniform pair-keyed shuffle, not salting.

    ``prefix_filter``: the PPJoin-family prefix-filtered variant
    (Chaudhuri/Bayardo/Vernica — the published SSJoin scale design).
    Same output rows, different candidate generation: under one global
    token order (document frequency ascending, rarest first), two sets
    with jaccard >= t MUST share a token within their first
    |X| - ceil(t*|X|) + 1 tokens, so only those prefixes enter the
    inverted-index join, and verification is size(array_intersect)
    per candidate pair instead of one shuffled row per shared shingle.
    Measured both ways, on the two corpus families that exist
    (SCALE.md §r8 + §r9): when ``max_df`` caps document frequency the
    baseline shared-shingle join is already near-linear and the prefix
    machinery (df-join + per-doc sort + post-distinct join-backs) is
    pure overhead — replica corpus sf10: 119 s baseline vs 442 s
    prefix; zipf 50k capped: 8.8 vs 9.2 s. With df UNCAPPED on
    Zipfian text — hot boilerplate shingles shared across unrelated
    docs, the published PPJoin regime — the prefix path wins ~2x and
    the gap grows with corpus size (zipf 50k: 18.8 -> 9.9 s, identical
    851,888 output pairs). Hence ``prefix_filter="auto"`` (default):
    prefix on exactly when ``max_df is None``, i.e. when nothing else
    bounds a shingle's candidate fan-out. Pass True/False to override.
    """
    if isinstance(prefix_filter, str):
        if prefix_filter != "auto":
            # only the literal "auto" is meaningful; any other string
            # (e.g. "Auto", "true") would otherwise fall through to
            # `if prefix_filter:` as truthy and silently enable the path
            raise ValueError(
                f"prefix_filter must be True, False or 'auto', got {prefix_filter!r}"
            )
        # an explicit two_level_agg request overrides auto (the paths
        # are mutually exclusive; only a literal True conflicts)
        prefix_filter = max_df is None and not two_level_agg
    sh = shingle_table(df, text_col, id_col, k, stride, max_df)
    # join/checkpoint on an 8-byte xxhash64 fingerprint, not the shingle
    # string: n_common depends only on equality classes, so the hash
    # value never reaches the result (collision budget ~n^2/2^64 across
    # the candidate join, same trade gram_hash documents). Halves the
    # checkpointed index and the self-join shuffle row width.
    sh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
    # sh feeds three consumers (both join sides + the size table); one
    # materialization beats three recomputes of the explode + max_df
    # pruning. persist, not localCheckpoint: checkpoint pays a full
    # plan->RDD conversion (analyze/optimize/codegen) at BUILD time —
    # measured 7.6 s cold / part of every warm rebuild at sf0.1 (r8
    # profile) — while persist defers planning to the single action and
    # still computes the index once (CacheManager dedups canonical
    # plans). At scale this caches ~the inverted index to
    # memory-then-disk — same bytes the checkpoint wrote, minus the
    # eager planning pass.
    sh = _persist_tracked(sh)
    if prefix_filter:
        if two_level_agg:
            raise ValueError("prefix_filter and two_level_agg are mutually exclusive")
        return _ngram_jaccard_prefix(sh, id_col, threshold)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    # Join-back shape, kept DELIBERATELY after measuring the
    # alternative (r11): carrying each side's set size through the
    # candidate join (Vernica et al.'s SSJoin layout — one index join
    # up front, no post-agg join-backs) measured FASTER at sf0.1
    # (1.82 -> 1.31 s, pure stage-count/driver overhead) but 1.7x
    # SLOWER at 10x docs (12.3 -> 20.6 s, 50k zipf-free corpus,
    # identical output): the carried n_a/n_b widen every
    # PRE-partial-agg candidate row — the sum-df^2 stream that grows
    # with duplication — and add a full index-sized shuffle for the
    # size attach, while the join-backs they replace touch only the
    # post-agg DISTINCT-pair table. Locally-faster/scale-slower is the
    # wrong trade for this repo; see OPTIMIZATION_r11.md.
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    joined = a.join(b, ["shingle"]).filter(F.col("id_a") < F.col("id_b"))
    if two_level_agg:
        inter = (
            joined.groupBy(
                F.pmod("shingle", F.lit(agg_buckets)).alias("__gb"), "id_a", "id_b"
            )
            .agg(F.count("*").alias("__n"))
            .groupBy("id_a", "id_b")
            .agg(F.sum("__n").alias("n_common"))
        )
    else:
        inter = (
            joined.groupBy("id_a", "id_b").agg(F.count("*").alias("n_common"))
        )
    # corpus-proportional join-backs: same no-broadcast rule as the
    # prefix path's token-array join (see _ngram_jaccard_prefix note)
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a.hint("shuffle_hash"), "id_a")
        .join(sz_b.hint("shuffle_hash"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _ngram_jaccard_prefix(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """PPJoin-style candidate generation + array-intersect verification
    over an (id, shingle-hash) inverted-index table. Same output as the
    shared-shingle path (see ngram_jaccard_pairs docstring).

    Soundness of the prefix: order every document's tokens by
    (document frequency, token) ascending — one GLOBAL total order.
    jaccard(A,B) >= t implies |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so
    by pigeonhole A and B must share a token among their first
    |X| - ceil(t*|X|) + 1 tokens. ceil is computed with a 1e-9 slack
    SUBTRACTED before the ceil: float error can only lengthen the
    prefix (more candidates), never shorten it (missed pairs). The
    size filter min >= t*max (same slack direction) prunes before the
    pair distinct.

    The keep rule downstream is round(jaccard, 4) >= t, so a pair with
    exact jaccard as low as t - 5e-5 is KEPT — the candidate pruning
    must therefore run at the effective threshold t - 5e-5 (minus the
    float slack), or a near-threshold pair that rounds up could be
    pruned that the baseline path and the shared oracle both keep.

    Join-strategy note (r9, found by the 500k-doc zipf probe): every
    corpus-sized table in this path — the df table and the per-doc
    token-array table joined back after the pair distinct — carries a
    shuffle_hash hint. Catalyst's pre-materialization size estimates
    undercount array columns, and at 500k docs it chose to BROADCAST
    the 500k-row token-array table: ~0.5 GB materialized on the driver
    -> 'Not enough memory to build and broadcast'. A corpus-sized side
    must never broadcast at any scale; the hint pins the partitioned
    strategy (results identical — strategy hints don't change
    semantics, and the shared oracle is unaffected)."""
    t = float(threshold) - 5e-5
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    docs = (
        sh.join(dfreq.hint("shuffle_hash"), "shingle")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("toks")
        )
        .select(
            F.col(id_col),
            "toks",
            F.size("toks").alias("n"),
            F.slice(
                "toks",
                F.lit(1),
                F.size("toks")
                - F.ceil(F.lit(t) * F.size("toks") - F.lit(1e-9)).cast("int")
                + F.lit(1),  # t already carries the round-window slack
            ).alias("prefix"),
        )
    )
    docs = _persist_tracked(docs)
    # the candidate join and its pair-distinct run on NARROW rows (ids +
    # sizes only) — token arrays are unbounded (doc length / stride), so
    # carrying them through the join's sort/shuffle multiplies each
    # array by its prefix-match fan-out (measured: disk-spill blowup at
    # sf5). The arrays join back AFTER the distinct, once per pair side,
    # against the 1-row-per-doc table.
    a = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("n").alias("n_a"),
        F.explode("prefix").alias("tok"),
    )
    b = docs.select(
        F.col(id_col).alias("id_b"),
        F.col("n").alias("n_b"),
        F.explode("prefix").alias("tok"),
    )
    cand = (
        a.join(
            b,
            (a["tok"] == b["tok"])
            & (F.col("id_a") < F.col("id_b"))
            # size filter: jaccard >= t forces min(|A|,|B|) >= t*max
            & (
                F.least("n_a", "n_b").cast("double")
                >= F.lit(t) * F.greatest("n_a", "n_b") - F.lit(1e-9)
            ),
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = docs.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    tb = docs.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    n_common = F.size(F.array_intersect("toks_a", "toks_b"))
    # merge, not shuffle_hash, for the ARRAY-carrying sides: SMJ sorts
    # spill to disk under pressure, while a hash build of wide rows is
    # the next OOM once broadcasting is ruled out
    return (
        cand.join(ta.hint("merge"), "id_a")
        .join(tb.hint("merge"), "id_b")
        .withColumn(
            "jaccard",
            F.round(n_common / (F.col("n_a") + F.col("n_b") - n_common), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# instr() is 1-based in both Spark SQL and DuckDB -> value of a hex digit
_HEXVAL = "(instr('0123456789abcdef', {d}) - 1)"


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Per-doc SimHash over whitespace tokens.

    Token hash = first bits/4 hex chars of md5(token); bit j of the
    simhash is 1 iff sum over distinct tokens of (+1 if bit j set else -1)
    is > 0. Pure SQL arithmetic (hex-digit lookup via strpos) so the
    DuckDB oracle is expression-identical. Output: (id, simhash:long);
    at the full 64 bits, bit 63 lands on the sign bit via two's
    complement (adding -2^63), keeping every intermediate inside int64
    in both engines. bits <= 64.
    """
    return _simhash_impl(df, text_col, id_col, bits)


def _simhash_bit_terms(bits: int) -> list[str]:
    """SQL term for each bit j extracted from hex digits of column `th`."""
    terms = []
    for j in range(bits):
        digit_idx = j // 4 + 1  # which hex char (1-based), high bits first
        bit_in_digit = 3 - (j % 4)  # bit within the hex digit, MSB first
        d = f"substring(th, {digit_idx}, 1)"
        v = _HEXVAL.format(d=d)
        terms.append(f"(case when floor({v} / {2 ** bit_in_digit}) % 2 = 1 then 1 else -1 end)")
    return terms


def _simhash_weight(j: int) -> int:
    """Two's-complement weight of bit j in a signed 64-bit code."""
    return -(1 << 63) if j == 63 else (1 << j)


def _simhash_impl(df: DataFrame, text_col: str, id_col: str, bits: int) -> DataFrame:
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    hex_chars = (bits + 3) // 4
    from disq_spark.operators.dispatch import fan_out

    # parallelize the token explode; project to the two used columns
    # FIRST so the exchange never carries the unused ones
    df = fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
                )
            ).alias("tok"),
        )
        .withColumn("th", F.expr(f"substring(md5(tok), 1, {hex_chars})"))
    )
    bit_aggs = [
        F.sum(F.expr(term)).alias(f"s_{j}") for j, term in enumerate(_simhash_bit_terms(bits))
    ]
    per_doc = toks.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(_simhash_weight(j))).otherwise(
            F.lit(0)
        )
        sim = term if sim is None else sim + term
    return per_doc.select(F.col(id_col), sim.cast("long").alias("simhash"))


def duplicate_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (node, component) where component = min node id reachable.

    The step a dedup pipeline needs AFTER pair generation: transitive
    closure groups {A~B, B~C} into one cluster so exactly one
    representative survives.

    Size-adaptive (the broadcast-join principle applied to graphs): a
    pair graph under ``driver_threshold`` edges collects to the driver
    and union-finds in milliseconds — near-dup pair sets are usually a
    tiny fraction of the corpus, and spending N Spark rounds on a small
    graph is pure scheduling overhead. Above the threshold: iterative
    min-label propagation as DataFrame joins (each round: label =
    min(own, neighbors')); converges in O(component diameter) rounds —
    near-dup clusters are shallow, so a handful. Each round is one
    shuffle join + one groupBy on the node key; localCheckpoint cuts
    lineage so round N+1 doesn't replan rounds 1..N (the standard Spark
    iterative-algorithm shape — cf. GraphX connected components, which
    this replaces without the package dependency).
    """
    spark = pairs.sparkSession
    # one bounded materialization decides the path AND supplies the edges:
    # <= threshold rows means we already hold the whole graph
    probe = pairs.select(id_a, id_b).limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        edges = [(r[0], r[1]) for r in probe]
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id so the representative is deterministic
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = sorted((n, find(n)) for n in parent)
        schema = pairs.select(
            F.col(id_a).alias("node"), F.col(id_a).alias("comp")
        ).schema
        return spark.createDataFrame(rows, schema)

    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("n_comp"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
                (F.col("n_comp") < F.col("comp")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("__chg")).limit(1).count()
        labels = updated.drop("__chg")
        if changed == 0:
            break
    return labels


def keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except its cluster representative (the
    min id per connected component); rows not in any pair survive."""
    comps = duplicate_components(pairs, id_a, id_b)
    losers = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_hashes: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against an already-deduped corpus without
    rescanning the corpus: ``seen_hashes`` is the running (content-hash)
    table maintained across batches.

    Returns (kept_rows, updated_seen_hashes). kept = new rows whose
    normalized-content hash is neither in seen_hashes nor claimed by an
    earlier (min id) row of the same batch. At 100 TB this is THE dedup
    shape: the corpus is touched only through its hash index (one
    anti-join), new data only once.
    """
    h = content_hash(F.col(text_col))
    with_h = new_df.withColumn("__h", h)
    if seen_hashes is not None:
        fresh = with_h.join(seen_hashes, with_h["__h"] == seen_hashes["h"], "left_anti")
    else:
        fresh = with_h
    reps = fresh.groupBy("__h").agg(F.min(id_col).alias(id_col))
    kept = fresh.join(reps.select(id_col), id_col, "semi").drop("__h")
    new_hashes = reps.select(F.col("__h").alias("h"))
    updated = (
        seen_hashes.union(new_hashes) if seen_hashes is not None else new_hashes
    )
    return kept, updated


def incremental_minhash_pairs(
    new_df: DataFrame,
    sig_store: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs of a NEW batch against itself AND a stored
    signature table (minhash_signatures output of everything seen),
    without re-shingling the corpus.

    Returns (pairs, updated_sig_store). Pairs have id_a < id_b where at
    least one side is new. The bucket join touches only band-key
    collisions — the corpus contributes its signature table (32B *
    num_hashes per doc), never its text. This is how a daily ingest
    dedups against a year of data.
    """
    new_sig = minhash_signatures(df=new_df, text_col=text_col, id_col=id_col,
                                 num_hashes=num_hashes, k=k, stride=stride, max_df=max_df)
    all_sig = new_sig.union(sig_store) if sig_store is not None else new_sig
    new_ids = new_df.select(F.col(id_col))

    assert num_hashes % bands == 0
    arr = lambda s: s.select(
        F.col(id_col), _mh_array(num_hashes)
    )
    # persist, not localCheckpoint — same r8 finding as minhash_lsh_pairs:
    # checkpoint pays an eager plan->RDD codegen pass per table at build
    # time; persist defers to the action and still computes each once.
    sig_n = _persist_tracked(arr(new_sig))
    sig_a = _persist_tracked(arr(all_sig))

    def buckets(sig):
        return sig.select(
            F.col(id_col),
            F.col("mh"),
            F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "band_key"),
        )

    left = buckets(sig_n).select(
        "band", "band_key", F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a")
    )
    right = buckets(sig_a).select(
        F.col("band").alias("band_r"), F.col("band_key").alias("band_key_r"),
        F.col(id_col).alias("id_b"), F.col("mh").alias("mh_b"),
    )
    # new x all, deduped to id_a != id_b; normalize orientation afterwards
    cand = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("band_key") == F.col("band_key_r"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .select(
            F.least("id_a", "id_b").alias("id_a_n"),
            F.greatest("id_a", "id_b").alias("id_b_n"),
            F.col("mh_a"),
            F.col("mh_b"),
        )
        .select(
            F.col("id_a_n").alias("id_a"), F.col("id_b_n").alias("id_b"), "mh_a", "mh_b"
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    eq_sum = F.expr(
        "aggregate(zip_with(mh_a, mh_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, x) -> acc + x)"
    )
    pairs = (
        cand.withColumn("est_jaccard", F.round(eq_sum / F.lit(float(num_hashes)), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return pairs, sig_a


def _band_key_array(num_hashes: int, bands: int, mh_col: str = "mh") -> F.Column:
    """array<string> of per-band md5 keys over an mh signature array —
    the single band-key expression every LSH path shares. Built as ONE
    SQL string (one py4j round trip) instead of nested Column calls;
    the parsed tree — md5 over concat_ws over 0-based array items — is
    identical, so every oracle stays bit-exact."""
    rows_per_band = num_hashes // bands
    parts = []
    for b in range(bands):
        items = ", ".join(
            f"{mh_col}[{i}]" for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        )
        parts.append(f"md5(concat_ws('|', {items}))")
    return F.expr("array(" + ", ".join(parts) + ")")


def _drop_table_and_location(spark, name: str) -> None:
    """DROP TABLE IF EXISTS plus removal of an orphaned warehouse
    location (a killed run can leave the directory behind without a
    catalog entry, which fails the next overwrite with
    LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        import os
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        for prefix in ("file:", ""):
            if wh.startswith(prefix):
                loc = os.path.join(wh[len(prefix):], name.lower())
                if os.path.isdir(loc):
                    shutil.rmtree(loc, ignore_errors=True)
                break
    except Exception:
        pass  # non-local warehouse: DROP TABLE alone is authoritative


def build_minhash_store(
    df: DataFrame,
    store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 8,
    stride: int = 4,
    n_buckets: int = 32,
) -> None:
    """Materialize the corpus's minhash signatures as PERSISTED bucketed
    parquet assets: ``{store}_sigs`` (id, mh array) bucketed by id and
    ``{store}_bands`` (band, band_key, id) bucketed by band_key — the
    asset a daily-ingest pipeline joins new batches against so the
    corpus TEXT is shingled exactly once, ever (VERDICT r6 #5:
    ``incremental_minhash_pairs`` re-derives the signature table's
    lineage per batch; at 100 TB the signatures must live on disk).

    Bucketing by band_key means every later batch-vs-store band join
    shuffles only the (small) batch side — the store side is
    exchange-free, the ``operators/bucketing.py`` co-location pattern.
    No ``max_df`` here by design: stored signatures must depend only on
    each document's text (never on corpus-wide shingle stats) so that
    batch-vs-store pairs are bit-identical to a full recompute.
    """
    assert num_hashes % bands == 0
    spark = df.sparkSession
    for t in (f"{store}_sigs", f"{store}_bands"):
        _drop_table_and_location(spark, t)
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, stride, None)
    arr = sig.select(
        F.col(id_col), _mh_array(num_hashes)
    )
    (
        arr.write.mode("overwrite")
        .bucketBy(n_buckets, id_col)
        .sortBy(id_col)
        .saveAsTable(f"{store}_sigs")
    )
    # derive band rows from the WRITTEN sigs (one shingle pass total)
    bands_df = spark.table(f"{store}_sigs").select(
        F.col(id_col),
        F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "band_key"),
    ).select("band", "band_key", id_col)
    (
        bands_df.write.mode("overwrite")
        .bucketBy(n_buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable(f"{store}_bands")
    )


def incremental_minhash_pairs_stored(
    new_df: DataFrame,
    store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    k: int = 8,
    stride: int = 4,
    method: str = "auto",
) -> DataFrame:
    """Near-dup pairs of a NEW batch vs itself + a PERSISTED signature
    store (``build_minhash_store``), with the corpus text never
    rescanned: only the batch is shingled; the store contributes its
    band/sig tables (plan-asserted in tests/test_operators.py).

    Pairs (id_a, id_b, est_jaccard), id_a < id_b, at least one side new
    — equal to a full-corpus recompute restricted to pairs touching the
    batch (the store-gate oracle states exactly that in SQL).

    Scoring dispatches SQL/numpy like ``minhash_lsh_pairs`` (shared
    ``_score_signature_pairs``); the size estimate comes from the STORE
    sig table — daily batches are small, the store is the scale driver.
    """
    assert num_hashes % bands == 0
    spark = new_df.sparkSession
    new_sig = minhash_signatures(new_df, text_col, id_col, num_hashes, k, stride, None)
    new_arr = _persist_tracked(new_sig.select(
        F.col(id_col), _mh_array(num_hashes)
    ))
    new_bands = new_arr.select(
        F.col(id_col),
        F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "band_key"),
    ).select("band", "band_key", id_col)

    all_bands = spark.table(f"{store}_bands").unionByName(new_bands)
    all_sigs = spark.table(f"{store}_sigs").unionByName(new_arr)

    cand = (
        new_bands.select(
            "band", "band_key", F.col(id_col).alias("id_a")
        )
        .join(
            all_bands.select(
                F.col("band").alias("band_r"),
                F.col("band_key").alias("band_key_r"),
                F.col(id_col).alias("id_b"),
            ),
            (F.col("band") == F.col("band_r"))
            & (F.col("band_key") == F.col("band_key_r"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = all_sigs.select(F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a"))
    b = all_sigs.select(F.col(id_col).alias("id_b"), F.col("mh").alias("mh_b"))
    scored_cand = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "mh_a", "mh_b"
    )
    return _score_signature_pairs(
        scored_cand, num_hashes, threshold, method, spark.table(f"{store}_sigs")
    )


def append_minhash_store(
    new_df: DataFrame,
    store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 8,
    stride: int = 4,
    n_buckets: int = 32,
) -> None:
    """Fold a processed batch into the store (same bucket spec, append
    mode). Call AFTER materializing the batch's pairs — the store
    tables are read lazily, so appending first would make the batch
    collide with itself through the store."""
    sig = minhash_signatures(new_df, text_col, id_col, num_hashes, k, stride, None)
    # arr feeds TWO write actions (the sigs table and the bands table):
    # persist so the shingle explode + num_hashes-aggregate pipeline
    # computes once (lazy marker — not the eager checkpoint whose
    # build-time planning cost r8 measured).
    arr = sig.select(
        F.col(id_col), _mh_array(num_hashes)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # both consuming actions run INSIDE this function, so — unlike the
    # lazy-returning operators above — the cache entry can be released
    # here instead of deferring to release_caches()
    try:
        (
            arr.write.mode("append")
            .bucketBy(n_buckets, id_col)
            .sortBy(id_col)
            .saveAsTable(f"{store}_sigs")
        )
        bands_df = arr.select(
            F.col(id_col),
            F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "band_key"),
        ).select("band", "band_key", id_col)
        (
            bands_df.write.mode("append")
            .bucketBy(n_buckets, "band_key")
            .sortBy("band_key")
            .saveAsTable(f"{store}_bands")
        )
    finally:
        arr.unpersist(blocking=False)


def remove_duplicate_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document repeated-paragraph removal — the C4/RefinedWeb
    boilerplate pass: a paragraph appearing (normalized) in >=
    ``min_docs`` DISTINCT documents is dropped from every document;
    unique paragraphs survive in their original form and order.

    Plan shape: one posexplode, one hash groupBy for the hot-paragraph
    list (countDistinct doc, partial-agg friendly), one broadcast
    anti-join (the hot list is small by construction — it is the
    boilerplate), one re-assembly groupBy. The re-assembled text joins
    surviving paragraphs with ``sep`` sorted by original position.
    Documents whose every paragraph was removed come back as ''.

    Output: (id_col, text_col cleaned, n_paragraphs, n_removed).
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__idx", "__para"),
    )
    h = F.sha2(F.trim(F.regexp_replace(F.lower(F.col("__para")), r"\s+", " ")), 256)
    paras = paras.withColumn("__h", h)
    hot = (
        paras.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__h")
    )
    flagged = paras.join(F.broadcast(hot.withColumn("__hot", F.lit(True))), "__h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__hot").isNull(),
                                F.struct(F.col("__idx"), F.col("__para")),
                            )
                        )
                    ),
                    lambda x: x["__para"],
                ),
                sep,
            ).alias(text_col),
            F.count("*").alias("n_paragraphs"),
            F.sum(F.when(F.col("__hot").isNotNull(), 1).otherwise(0)).alias("n_removed"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole banding: split the code into ``bands`` equal bit-slices;
    any pair within hamming distance < bands must agree exactly on at
    least one slice, so candidates come from equi-joins on (band,
    slice-value) — never all-pairs — and the exact popcount filter runs
    only on collisions. Same candidate-generation economics as MinHash
    LSH, but over the 8-byte code instead of a shingle signature
    (requires max_hamming < bands for completeness).

    Scale note: bucket population per band is ~n / 2^(bits/bands), so
    WIDE slices are what keep random (non-duplicate) codes from
    colliding — the 64/4 default gives 16-bit slices (65,536 buckets per
    band); bands=8 supports hamming up to 7 but drops to 8-bit slices
    (256 buckets), quadratic-ish at corpus scale. Slice extraction uses
    shiftrightunsigned so bit 63 (the sign bit of the long code) slices
    correctly.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    sim = simhash(df, text_col, id_col, bits)  # (id, simhash)
    return hamming_banded_pairs(sim, "simhash", id_col, bits, bands, max_hamming)


def hamming_banded_pairs(
    codes: DataFrame,
    code_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within hamming distance <= max_hamming over ANY int64 code
    column (simhash, image dHash, ...), pigeonhole-banded: split the
    code into ``bands`` equal bit-slices; a pair within distance <
    bands must agree exactly on >= 1 slice, so candidates are
    equi-joins on (band, slice-value) — never all-pairs. Requires
    max_hamming < bands for completeness (asserted), so the banded
    result EQUALS a brute-force popcount join. shiftrightunsigned keeps
    bit 63 (the long's sign bit) slicing correctly.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    assert bits % bands == 0
    assert max_hamming < bands, "pigeonhole completeness needs max_hamming < bands"
    slice_bits = bits // bands
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(code_col), b * slice_bits)
                .bitwiseAND((1 << slice_bits) - 1)
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = codes.select(
        F.col(id_col), F.col(code_col).alias("__code"), F.explode(slices).alias("s")
    ).select(id_col, "__code", F.col("s.band").alias("band"), F.col("s.key").alias("key"))
    left = buckets.select(
        "band", "key", F.col(id_col).alias("id_a"), F.col("__code").alias("h_a")
    )
    right = buckets.select(
        F.col("band").alias("band_r"),
        F.col("key").alias("key_r"),
        F.col(id_col).alias("id_b"),
        F.col("__code").alias("h_b"),
    )
    cand = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _word_ngrams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id_col, gram): every positional word ``n``-gram of each text —
    one explode, no shuffle (the fan_out below is a no-op whenever the
    source already carries >= cores partitions, i.e. always at scale).
    Documents with fewer than ``n`` tokens emit no row. Shared by
    substring_dup_rate and ngram_contamination."""
    from disq_spark.operators.dispatch import fan_out

    # tokenize + slice + md5-per-gram is per-byte heavy, and every
    # consumer re-runs it per subtree (flag agg + join-back) — a narrow
    # source serializes all of them (r11 stage sweep: 0.7 s/stage on
    # one task at sf0.01). Same floor-0 contract as minhash shingling.
    df = fan_out(df, id_col)
    toks = tokens(F.col(text_col))
    npos = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) would produce a DESCENDING [1, 0] in Spark — gate
    # short docs to an explicit empty array instead.
    positions = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(positions, lambda i: F.array_join(F.slice(toks, i, n), " "))
        ).alias("gram"),
    )


def ngram_contamination(
    df: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Benchmark n-gram decontamination — the industry-standard 13-gram
    overlap test (GPT-3 appendix C; PaLM/Llama train-test overlap): flag
    every corpus document sharing at least one word ``n``-gram with any
    benchmark text. Returns (id_col, n_hits), one row per contaminated
    document, ``n_hits`` = number of DISTINCT shared n-grams.

    Scale shape: per-side DISTINCT grams first (bounds each document's
    contribution by its length, collapses boilerplate), then one
    equi-join bucketed by the 8-byte gram fingerprint (``gram_hash``) —
    never all-pairs, no driver collect.
    Benchmark gram sets are typically millions of rows (eval suites are
    small next to a corpus), so AQE broadcasts that side; a hot gram on
    the corpus side is handled by AQE skew splitting. Reuses the
    positional-gram machinery of substring_dup_rate (Lee et al.).
    """
    c = (
        _word_ngrams(df, n, text_col, id_col)
        .select(F.col(id_col), gram_hash(F.col("gram")).alias("gh"))
        .distinct()
    )
    b = (
        _word_ngrams(bench, n, bench_text_col, bench_id_col)
        .select(gram_hash(F.col("gram")).alias("gh"))
        .distinct()
    )
    return c.join(b, "gh").groupBy(id_col).agg(F.count("*").alias("n_hits"))


def substring_dup_rate(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-substring rate per document.

    Distributed approximation of suffix-array substring dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better"):
    every word ``n``-gram *position* in a document is marked duplicated
    iff the same n-gram also occurs in at least one other document; the
    document's rate is the duplicated share of its n-gram positions.
    Within-document repeats do NOT count (a doc repeating its own phrase
    is repetition, not cross-corpus duplication — ``text_repetition``
    measures that). Documents with fewer than ``n`` tokens emit no row.

    Returns (id_col, n_grams, dup_rate).

    Plan shape / scale: one posexplode (no shuffle); grams shuffle as
    8-byte int64 fingerprints (``gram_hash``), not strings; one
    map-side-combinable groupBy whose cross-document test is
    ``min(id) != max(id)`` — deliberately NOT count(distinct id), so a
    boilerplate gram seen 10^9 times combines to two longs instead of a
    distinct sketch; one equi-join back on gram (AQE skew-join handles
    hot grams); one groupBy(id). Never all-pairs, no driver collect.
    """
    grams = _word_ngrams(df, n, text_col, id_col).select(
        F.col(id_col), gram_hash(F.col("gram")).alias("gh")
    )
    flag = grams.groupBy("gh").agg((F.min(id_col) != F.max(id_col)).alias("is_dup"))
    return (
        grams.join(flag, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.avg(F.col("is_dup").cast("double")).alias("dup_rate"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 5,
    min_span: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-SPAN removal — the cleaning step of
    Lee et al.'s ExactSubstr dedup (``substring_dup_rate`` only measures;
    this rewrites). Token-level variant of the paper's 50-token rule:

    - a word ``n``-gram is duplicated iff it occurs in >= 2 distinct
      documents (within-doc repeats don't count, same contract as
      ``substring_dup_rate``);
    - a token position is covered iff any duplicated gram spans it;
    - maximal runs of covered positions with run length >= ``min_span``
      are deleted; everything else (including sub-threshold covered
      runs) is kept verbatim.

    Returns one row per input document:
    (id_col, n_tokens, n_removed, clean_text) — documents shorter than
    ``n`` tokens (no grams) pass through unchanged; empty docs yield
    ``clean_text = ''``.

    Plan shape / scale: grams shuffle once as 8-byte fingerprints for
    the cross-doc flag (map-side-combinable min/max, never
    count-distinct), covered positions re-shuffle by document for the
    run-length windows — window partitions are doc-sized, bounded by
    document length, so no partition outgrows memory at 100 TB. The
    rebuild is an anti-join of the token table against the removal set
    plus one per-doc sort_array — all JVM expressions, no Python, no
    driver collect. Suffix arrays (the paper's data structure) don't
    distribute; positional-gram cover is the shuffle-native equivalent
    and finds exactly the duplicated spans of length >= n.
    """
    from pyspark.sql.window import Window

    from disq_spark.operators.dispatch import fan_out

    toks = tokens(F.col(text_col))
    # same narrow-source fan-out as _word_ngrams: the positional-gram
    # explode is re-run by three subtrees (flag, covered, rebuild)
    base = fan_out(df, id_col).select(F.col(id_col), toks.alias("toks"))
    npos = F.size(F.col("toks")) - F.lit(n - 1)
    # positional grams: (id, pos, gh) with pos 1-based
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                npos >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
                    lambda i: F.array_join(F.slice(F.col("toks"), i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "gram"),
    ).select(
        F.col(id_col),
        (F.col("pos0") + 1).alias("pos"),
        gram_hash(F.col("gram")).alias("gh"),
    )
    flag = grams.groupBy("gh").agg((F.min(id_col) != F.max(id_col)).alias("is_dup"))
    covered = (
        grams.join(flag, "gh")
        .filter("is_dup")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))).alias(
                "ti"
            ),
        )
        .distinct()
    )
    # gaps-and-islands: consecutive covered positions share (ti - row_number)
    w = Window.partitionBy(id_col).orderBy("ti")
    runs = covered.withColumn("grp", F.col("ti") - F.row_number().over(w))
    removal = (
        runs.withColumn(
            "run_len", F.count("*").over(Window.partitionBy(id_col, "grp"))
        )
        .filter(F.col("run_len") >= min_span)
        .select(id_col, "ti")
    )
    tok_rows = base.select(
        F.col(id_col), F.posexplode(F.col("toks")).alias("idx0", "tok")
    ).select(F.col(id_col), (F.col("idx0") + 1).alias("ti"), "tok")
    kept = (
        tok_rows.join(removal, [id_col, "ti"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        base.select(F.col(id_col), F.size("toks").cast("long").alias("n_tokens"))
        .join(kept, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


#: winnowing position field width: 21 bits -> documents up to 2^21-1
#: (~2M) normalized chars; longer docs must be chunked first
#: (operators/chunking.py) — asserted in the kernel, not silently wrong.
WINNOW_POS_BITS = 21


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): over the char ``k``-gram hash sequence, every
    window of ``w`` consecutive hashes selects its minimum (rightmost on
    ties); the selected (position, hash) set is the fingerprint. The
    paper's guarantee carries over: any shared substring of length
    >= w + k - 1 chars produces at least one shared fingerprint, with
    density ~2/(w+1) — the local, position-robust alternative to MinHash
    when you need to LOCATE matches, not just detect them.

    Returns (id_col, pos, fp): 1-based char position of each selected
    gram and its 40-bit hash, distinct per document.

    Determinism / oracle portability: selection uses one int64 key
    ``h40 * 2^21 + (2^21-1 - pos)`` — min of that key IS (min hash,
    rightmost position) — so the whole operator is a window MIN over
    integers, identical in any engine; a 2M-char position bound is
    ASSERTED (longer docs chunk first), never silently truncated.

    Scale shape: one explode to gram rows (no shuffle), one shuffle by
    document for the window (partitions are doc-sized), one distinct.
    Short documents (< w grams, i.e. < w+k-1 chars) have no complete
    window and yield no fingerprints — the paper's contract.
    """
    norm = normalize(F.col(text_col))
    n_grams = F.length(norm) - F.lit(k - 1)
    base = df.select(
        F.col(id_col), norm.alias("__t"), n_grams.alias("__ng")
    ).filter(F.col("__ng") >= 1)
    pos_cap = (1 << WINNOW_POS_BITS) - 1
    # the oversize guard gates the POSITIONS array, not the key: it must
    # fire before the gram transform runs (substring-per-position over an
    # oversize string is the quadratic blowup the bound exists to stop),
    # and living inside a used expression keeps the optimizer from
    # pruning it
    positions = F.when(
        F.col("__ng") > pos_cap,
        F.raise_error(
            F.lit(
                f"winnowing_fingerprints: document exceeds {pos_cap} chars; "
                "chunk first (operators/chunking.py)"
            )
        ).cast("array<int>"),
    ).otherwise(F.sequence(F.lit(1), F.col("__ng")))
    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    key = h40 * F.lit(1 << WINNOW_POS_BITS) + (
        F.lit(pos_cap) - (F.col("pos0") + 1)
    )
    grams = base.select(
        F.col(id_col),
        F.col("__ng"),
        F.posexplode(
            F.transform(positions, lambda i: F.substring(F.col("__t"), i, k))
        ).alias("pos0", "gram"),
    ).select(
        F.col(id_col),
        "__ng",
        (F.col("pos0") + 1).alias("pos"),
        key.alias("key"),
    )
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        grams.withColumn("sel", F.min("key").over(win))
        .filter(F.col("pos") <= F.col("__ng") - F.lit(w - 1))
        .select(id_col, "sel")
        .distinct()
    )
    return sel.select(
        F.col(id_col),
        (F.lit(pos_cap) - F.col("sel") % F.lit(1 << WINNOW_POS_BITS)).alias("pos"),
        F.shiftright("sel", WINNOW_POS_BITS).alias("fp"),
    )


def winnowing_pairs(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS-style match candidates: document pairs sharing >=
    ``min_shared`` winnowing fingerprints (the matching step the
    fingerprints exist for — each shared fp witnesses a shared substring
    of >= w+k-1 chars at a locatable position).

    Returns (id_a, id_b, n_shared), id_a < id_b, n_shared = number of
    DISTINCT shared fingerprint hashes.

    Scale shape: inverted-index self-join on the fp hash — cost is
    O(sum df(fp)^2) like every posting-list join, NEVER all-pairs;
    ``max_df`` drops fingerprints appearing in more than that many
    documents (boilerplate protection, same contract as the shingle
    ``max_df``) via one partial-agg count + semi-join before the pair
    join. Pair counting is count(*) over per-doc-distinct fps — no
    count-distinct shuffle.
    """
    fp = (
        winnowing_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
        .select(id_col, "fp")
        .distinct()
    )
    if max_df is not None:
        keep = fp.groupBy("fp").agg(F.count("*").alias("df_")).filter(
            F.col("df_") <= max_df
        )
        fp = fp.join(keep.select("fp"), "fp")
    a = fp.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = fp.select(F.col("fp").alias("fp_b"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, (F.col("fp") == F.col("fp_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _bounded_lev(max_ratio: float) -> F.Column:
    """Levenshtein over (t_a, t_b) with the THRESHOLDED kernel (Spark
    3.5+): distances above the bound return -1 from a banded DP —
    O(len * bound) cells plus a free length-difference early exit —
    instead of paying the full O(len_a * len_b) table per pair. The
    bound is chosen so the rewrite is EXACT w.r.t. the keep rule
    ``round(lev / max_len, 4) <= max_ratio``:

      kept  =>  lev / max_len < max_ratio + 5e-5   (half-up rounding)
            =>  lev <= ceil((max_ratio + 5e-5) * max_len) + 1 = bound

    so every kept pair's distance is computed exactly (the value the
    output's ``lev`` column carries), and every -1 pair has
    lev > bound >= (max_ratio + 5e-5) * max_len — dropped by the
    original rule too (the +1 absorbs float ulp at the boundary).
    Callers must ALSO filter ``lev >= 0``. Measured (sf0.01
    dedup_verified, 15,148 winnowing candidates at max_ratio 0.6):
    22.2 s -> see OPTIMIZATION_r11.md.

    The DP is wrapped in ``element_at(shuffle(array(..)), 1)`` — a
    value-identity wrapper (a one-element array has a single
    permutation) whose only purpose is the NONDETERMINISTIC flag:
    without it the optimizer substitutes the DP into the caller's keep
    filter and pushes the filter into the text join-back's residual
    condition, where the whole verify workload executes inside the
    join's (byte-wise tiny, AQE-coalesced-to-one-task) probe stage.
    The flag pins the DP in a Project ABOVE the join so the caller can
    repartition the candidate pairs first (see ``_dp_fan_out``) —
    same trick the optimization guide applies to expensive UDFs, r11."""
    r = float(max_ratio) + 5e-5
    return F.expr(
        f"element_at(shuffle(array(levenshtein(t_a, t_b, "
        f"cast(ceil({r!r} * greatest(length(t_a), "
        "length(t_b))) + 1 as int)))), 1)"
    )


def _dp_fan_out(pairs: DataFrame) -> DataFrame:
    """Spread candidate (id_a, id_b, t_a, t_b) rows across the session's
    full width before the Levenshtein projection. The verify tier is the
    one stage whose cost is CPU-per-row (O(len * bound) DP cells), not
    bytes — AQE's byte-based coalescing sees a few MB of join output and
    folds it to ONE post-shuffle partition, serializing the entire DP
    (measured sf0.01: 15,148 pairs, 16.2 s single-task vs 2.5 s after
    this + the _bounded_lev barrier). An explicit user partition count
    is exempt from AQE coalescing, and hash-by-pair-key avoids the
    keyless-repartition map-side sort (SPARK-23207). Scale-adaptive:
    max(defaultParallelism, shuffle.partitions) grows with the session,
    and per-task DP work stays (pair volume / n) — bounded exactly where
    byte-based coalescing would unbound it."""
    sc = pairs.sparkSession.sparkContext
    n = max(
        sc.defaultParallelism,
        int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return pairs.repartition(n, "id_a", "id_b")


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio: float = 0.25,
    candidate_threshold: float = 0.1,
    k: int = 8,
    stride: int = 4,
    max_df: float | None = None,
) -> DataFrame:
    """Edit-distance verification tier: Levenshtein over normalized text,
    computed ONLY on shingle-candidate pairs (never all-pairs — the
    O(len^2) DP per pair is affordable exactly because candidate
    generation is the bounded inverted-index join). The standard fuzzy
    second stage after minhash/Jaccard: sketches propose, an exact
    string metric disposes.

    Keeps pairs with lev / max(len_a, len_b) <= max_ratio.
    Output: (id_a, id_b, lev, ratio) with id_a < id_b.
    """
    cand = ngram_jaccard_pairs(
        df, text_col, id_col, threshold=candidate_threshold, k=k, stride=stride, max_df=max_df
    ).select("id_a", "id_b")
    norm = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__nt"))
    a = norm.select(F.col(id_col).alias("id_a"), F.col("__nt").alias("t_a"))
    b = norm.select(F.col(id_col).alias("id_b"), F.col("__nt").alias("t_b"))
    lev = _bounded_lev(max_ratio)
    return (
        _dp_fan_out(cand.join(a, "id_a").join(b, "id_b"))
        .withColumn("lev", lev)
        .withColumn(
            "ratio",
            F.round(F.col("lev") / F.greatest(F.length("t_a"), F.length("t_b")), 4),
        )
        .filter((F.col("lev") >= 0) & (F.col("ratio") <= max_ratio))
        .select("id_a", "id_b", "lev", "ratio")
    )


def verified_pairs(
    df: DataFrame,
    candidates: DataFrame,
    max_ratio: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "editdist",
) -> DataFrame:
    """Propose -> dispose verification as a first-class composition:
    an exact string metric over EXTERNALLY proposed candidate pairs.
    ``candidates`` is any (id_a, id_b) frame — winnowing_pairs,
    minhash_lsh_pairs, ngram_jaccard_pairs, a streaming sink — and the
    verifier joins the normalized texts back and keeps pairs with
    levenshtein / max(len) <= ``max_ratio``.

    Measured rationale (SCALE.md §r10 planted-truth tables): cheap
    candidate tiers are precision-poor alone (winnowing P 0.078), but
    piping them through this verifier is P 1.000 at recall set by the
    candidate tier — the "sketches propose, an exact metric disposes"
    design. ``edit_distance_pairs`` is the pre-wired ngram-candidate
    instance of the same shape.

    Output: (id_a, id_b, lev, ratio), id_a < id_b ordering inherited
    from the candidate frame. ratio is round(lev / max_len, 4), with
    identical EMPTY normalized texts scored 0 (a true dup, not 0/0).

    Scale shape: two shuffle-hash join-backs against the one-row-per-doc
    normalized-text table (hinted — Catalyst's pre-materialization size
    estimates undercount wide text columns and would broadcast a
    corpus-proportional table, the r9 OOM lesson), a pair-keyed fan-out
    of the joined candidates (``_dp_fan_out`` — the DP stage is
    CPU-bound, so AQE's byte-based coalescing must not narrow it), then
    a row-local Levenshtein. Cost is O(|candidates| * len * bound)
    JVM-side banded DP — bounded because candidate generation is
    bounded, never all-pairs.
    """
    if method != "editdist":
        raise ValueError(f"unknown verification method {method!r}")
    norm = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__nt"))
    a = norm.select(F.col(id_col).alias("id_a"), F.col("__nt").alias("t_a"))
    b = norm.select(F.col(id_col).alias("id_b"), F.col("__nt").alias("t_b"))
    max_len = F.greatest(F.length("t_a"), F.length("t_b"))
    ratio = F.when(max_len == 0, F.lit(0.0)).otherwise(
        F.round(F.col("lev") / max_len, 4)
    )
    # empty-empty pairs: bounded lev returns 0 (<= bound), ratio 0 — the
    # same rows the unbounded version kept
    return (
        _dp_fan_out(
            candidates.select("id_a", "id_b")
            .join(a.hint("shuffle_hash"), "id_a")
            .join(b.hint("shuffle_hash"), "id_b")
        )
        .withColumn("lev", _bounded_lev(max_ratio))
        .withColumn("ratio", ratio)
        .filter((F.col("lev") >= 0) & (F.col("ratio") <= max_ratio))
        .select("id_a", "id_b", "lev", "ratio")
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher repetition-rule signals (Rae et al. 2021, Table A1) per
    document:

    - ``top_{n}gram_char_frac`` (n in ``top_ns``): fraction of the
      doc's characters inside occurrences of its single most frequent
      word n-gram (Gopher filters at 0.20/0.18/0.16 for n=2/3/4).
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): fraction of
      characters covered by n-grams that occur more than once
      (Gopher: 0.15..0.10 for n=5..10). Per Gopher, character mass is
      counted per occurrence (overlaps are not de-duplicated) and
      divided by the doc's total token character mass.

    One explode per n over the token array, each collapsing straight
    into a per-(doc, gram) count then a per-doc aggregate -- all
    map-side combinable, reducer rows bounded by distinct grams. The
    final assembly joins #ns doc-sized tables on the id (AQE picks
    broadcast/sort-merge by size).
    """
    from disq_spark.functions import text as TX

    base = df.select(F.col(id_col), TX.tokens(F.col(text_col)).alias("toks"))
    base = base.withColumn(
        "__chars",
        F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))"),
    )
    out = base.select(id_col, F.size("toks").cast("long").alias("n_tokens"), "__chars")

    def grams(n):
        return base.filter(F.size("toks") >= n).select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n} + 1), "
                    f"i -> struct(array_join(slice(toks, i, {n}), ' ') as g, "
                    f"aggregate(slice(toks, i, {n}), 0L, (a, t) -> a + length(t)) as chars))"
                )
            ).alias("e"),
        ).select(id_col, F.col("e.g").alias("g"), F.col("e.chars").alias("chars"))

    for n in top_ns:
        gc = (
            grams(n)
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"), F.first("chars").alias("chars"))
            .groupBy(id_col)
            .agg(
                F.max(F.struct("c", "chars")).alias("__top"),
            )
            .select(
                id_col,
                (F.col("__top.c") * F.col("__top.chars")).alias(f"__topchars_{n}"),
            )
        )
        out = out.join(gc, id_col, "left").withColumn(
            f"top_{n}gram_char_frac",
            F.round(
                F.coalesce(F.col(f"__topchars_{n}"), F.lit(0))
                / F.nullif(F.col("__chars"), F.lit(0)),
                4,
            ),
        ).drop(f"__topchars_{n}")
    for n in dup_ns:
        gc = (
            grams(n)
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"), F.first("chars").alias("chars"))
            .filter(F.col("c") > 1)
            .groupBy(id_col)
            .agg(F.sum(F.col("c") * F.col("chars")).alias(f"__dupchars_{n}"))
        )
        out = out.join(gc, id_col, "left").withColumn(
            f"dup_{n}gram_char_frac",
            F.round(
                F.coalesce(F.col(f"__dupchars_{n}"), F.lit(0))
                / F.nullif(F.col("__chars"), F.lit(0)),
                4,
            ),
        ).drop(f"__dupchars_{n}")
    return out.drop("__chars")


def keep_best_representatives(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except the HIGHEST-``score_col`` member
    of its connected component (ties -> min id); rows not in any pair
    survive untouched. The quality-aware upgrade of
    :func:`keep_representatives` — when duplicates differ (truncation,
    boilerplate variants), keep the best copy, not the smallest id.

    Scale shape identical to keep_representatives: components come from
    the bounded label-propagation join, winners are one max_by over
    component members (map-side combinable), and the corpus is touched
    only by one broadcast anti-join of the loser ids (|members of
    components| rows, not corpus rows).
    """
    comps = duplicate_components(pairs, id_a, id_b)
    scored = comps.join(
        df.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("__s")
        ),
        "node",
    )
    # min over (-score, node): highest score wins, ties -> MIN node.
    # Negating the (numeric-by-contract) score instead of the node keeps
    # the tie-break type-agnostic — node ids may be strings, where a
    # unary minus would cast to NULL (or error under ANSI mode).
    winners = scored.groupBy("comp").agg(
        F.min_by(
            "node", F.struct((-F.col("__s")).alias("ns"), F.col("node").alias("nt"))
        ).alias("winner")
    )
    losers = (
        scored.join(winners, "comp")
        .filter(F.col("node") != F.col("winner"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def component_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-duplicate-component summary: (comp, winner, best_score,
    size) under the keep-best rule of :func:`keep_best_representatives`."""
    comps = duplicate_components(pairs)
    scored = comps.join(
        df.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("__s")
        ),
        "node",
    )
    return scored.groupBy("comp").agg(
        # see keep_best_representatives: type-agnostic (score desc, node asc)
        F.min_by(
            "node", F.struct((-F.col("__s")).alias("ns"), F.col("node").alias("nt"))
        ).alias("winner"),
        F.max("__s").alias("best_score"),
        F.count("*").alias("size"),
    )
