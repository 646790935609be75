"""Deterministic sampling, sharding, and sequence packing — the
reproducibility layer of a training-data pipeline.

Spark's built-in ``df.sample`` draws from per-partition RNG streams: the
selected set changes with partitioning, retries, and cluster size —
unacceptable when a 100 TB corpus must be re-derivable bit-for-bit.
Everything here keys off md5 of a stable row key instead:

- ``hash_sample``:       keep a row iff its md5-derived uniform < rate.
                         Partition-independent, repeatable, and a pure
                         filter — no shuffle, pushed to the scan.
- ``stratified_sample``: per-group rates via one CASE expression —
                         still a pure filter.
- ``assign_shards``:     shard = hash mod n — the output-layout step
                         before a partitioned write; same key always
                         lands in the same shard across reruns.
- ``pack_sequences``:    the concat-then-chop model LLM pretraining
                         uses: within each shard, documents are laid on
                         a token tape in hash order and every ``budget``
                         tokens starts a new pack. One window cumsum per
                         shard — parallelism = shard count, so size
                         n_shards to the cluster, not to taste.

Determinism contract: md5-of-string hashing and integer cumsums, so
every operator has an exact cross-engine SQL oracle (same generated
fragments; see operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from disq_spark.operators.sketches import hex2int_sql

#: 13 hex digits = 52 bits — exact in a double; u in [0, 1).
_U_DIGITS = 13
_U_SPACE = float(16**_U_DIGITS)


def uniform_sql(key: str, seed: str = "") -> str:
    """SQL fragment: deterministic uniform [0,1) from md5(seed || key).
    Valid in both Spark SQL and DuckDB."""
    h = f"substring(md5('{seed}' || {key}), 1, {_U_DIGITS})"
    return f"({hex2int_sql(h, _U_DIGITS)} / {_U_SPACE!r})"


def hash_sample(df: DataFrame, rate: float, key: str, seed: str = "") -> DataFrame:
    """Keep ~rate of rows, selected by key hash — repeatable under any
    partitioning, retry, or engine. A pure filter: no shuffle, no RNG
    state, evaluated at scan time."""
    return df.filter(F.expr(uniform_sql(key, seed)) < rate)


def stratified_sample(
    df: DataFrame, rates: dict[str, float], group_col: str, key: str, seed: str = ""
) -> DataFrame:
    """Per-group sampling rates (groups absent from ``rates`` are
    dropped). One CASE expression — still a scan-time filter."""
    cases = " ".join(
        f"WHEN '{g}' THEN {r!r}" for g, r in sorted(rates.items())
    )
    rate_expr = f"(CASE {group_col} {cases} ELSE 0.0 END)"
    return df.filter(F.expr(f"{uniform_sql(key, seed)} < {rate_expr}"))


def shard_sql(key: str, n_shards: int, seed: str = "") -> str:
    """SQL fragment: stable shard id in [0, n_shards) from the key hash."""
    h = f"substring(md5('{seed}' || {key}), 1, 8)"
    return f"({hex2int_sql(h, 8)} % {n_shards})"


def assign_shards(df: DataFrame, n_shards: int, key: str, seed: str = "") -> DataFrame:
    """Add a ``shard`` column: hash(key) mod n_shards. Follow with
    ``.repartition(n_shards, "shard")`` / partitioned write for layout."""
    return df.withColumn("shard", F.expr(shard_sql(key, n_shards, seed)).cast("int"))


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    key: str,
    n_shards: int = 64,
    seed: str = "",
) -> DataFrame:
    """Concat-then-chop sequence packing: within each shard, documents
    are concatenated in hash-of-key order and the token tape is cut
    every ``budget`` tokens. Adds:

    - ``shard``:      which tape
    - ``tape_offset``: token offset where this document starts
    - ``pack_id``:     floor(tape_offset / budget) — the context window
                       this document starts in

    One window cumsum per shard; at scale parallelism == n_shards, so
    pick n_shards >= cluster cores. The hash order is the global
    shuffle LLM pretraining wants anyway — no extra pass to randomize.
    """
    out = assign_shards(df, n_shards, key, seed).withColumn(
        "__ord", F.expr(f"substring(md5('{seed}' || {key}), 1, 16)")
    )
    win = (
        W.partitionBy("shard")
        .orderBy("__ord", key)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(win)
    return (
        out.withColumn("tape_offset", (cum - F.col(token_col)).cast("long"))
        .withColumn("pack_id", (F.col("tape_offset") / budget).cast("long"))
        .drop("__ord")
    )


def sampled_rank_threshold(
    df: DataFrame,
    value_col: str,
    pct: float,
    key: str,
    sample_rate: float = 0.2,
    seed: str = "",
) -> DataFrame:
    """1-row DataFrame: the ``pct``-quantile *threshold* of ``value_col``,
    estimated from a deterministic hash-sample.

    This is the scale-correct way to cut a 100 TB corpus at "top 20% by
    quality": an exact global percentile needs every value on one
    reducer, while the hash-sample (scan-time filter, no shuffle) bounds
    the sort to sample_rate * n rows and stays bit-reproducible across
    partitionings and engines. The threshold is rank-based (the
    ceil(pct * n)-th smallest sample value — an actual data value, no
    interpolation), because interpolated quantiles differ between
    engines in final-ulp float arithmetic.
    """
    s = df.select(
        F.col(value_col).alias("__v"), F.col(key).alias("__k")
    )
    s = s.filter(F.expr(uniform_sql("__k", seed)) < sample_rate)
    w = W.orderBy("__v", "__k")
    ranked = (
        s.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(W.partitionBy()))
    )
    # greatest(1, ...) makes pct=0 select the sample minimum instead of
    # matching no row; the -inf union makes an EMPTY sample yield a
    # keep-everything threshold rather than silently deleting the corpus
    # (a 1-row sentinel the max() ignores whenever a real row exists).
    thr = ranked.filter(
        F.col("__rn")
        == F.greatest(F.lit(1), F.ceil(F.lit(pct) * F.col("__n"))).cast("long")
    ).select(F.col("__v").alias("threshold"))
    sentinel = (
        df.sparkSession.range(1).select(F.lit(float("-inf")).alias("threshold"))
    )
    return thr.unionByName(sentinel).agg(
        F.max("threshold").alias("threshold")
    )


def percentile_filter(
    df: DataFrame,
    value_col: str,
    pct: float,
    key: str,
    sample_rate: float = 0.2,
    seed: str = "",
    threshold_col: str | None = None,
) -> DataFrame:
    """Keep rows whose ``value_col`` >= the sampled ``pct``-quantile
    threshold (top ``1-pct`` fraction). One scan over the corpus with
    the 1-row threshold broadcast — no global sort anywhere.

    The join uses a collision-safe internal name, so ``df`` may itself
    carry a ``threshold`` column. Pass ``threshold_col`` to keep the
    applied threshold as a column of that name in the output (it must
    not collide with an existing column); by default it is dropped."""
    thr = sampled_rank_threshold(df, value_col, pct, key, sample_rate, seed)
    out = df.crossJoin(
        F.broadcast(thr.select(F.col("threshold").alias("__disq_thr")))
    ).filter(F.col(value_col) >= F.col("__disq_thr"))
    if threshold_col is not None:
        if threshold_col in df.columns:
            raise ValueError(
                f"threshold_col {threshold_col!r} collides with an input column"
            )
        return out.withColumnRenamed("__disq_thr", threshold_col)
    return out.drop("__disq_thr")


def dsir_features(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """Hashed n-gram feature extraction for DSIR: unigrams + adjacent
    bigrams of the whitespace tokens, fingerprinted (md5 -> int64,
    same scheme as the dedup operators) and folded into ``buckets``
    hash buckets. Output: one row per feature occurrence
    (__row_key, bucket). Pure column expressions — no shuffle."""
    from disq_spark.functions import text as TX
    from disq_spark.operators.dedup import gram_hash

    toks = TX.tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return df.withColumn("__feat", F.explode(feats)).withColumn(
        "bucket", F.pmod(gram_hash(F.col("__feat")), F.lit(buckets))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is,

        logweight(doc) = sum over the doc's features f of
                         log p_target(bucket(f)) - log p_raw(bucket(f))

    with add-1 smoothed bucket unigram models fit on the target and raw
    corpora respectively: p(b) = (count_b + 1) / (total + buckets).
    Downstream, sample raw docs proportional to exp(logweight) (Gumbel
    top-k on logweight + a deterministic hash uniform composes with
    :func:`hash_sample`'s machinery).

    Output: (doc_id, n_features, logweight).

    Scale shape: the two corpus fits are map-side-combinable counts
    into ``buckets`` rows; the per-bucket log-ratio table (B rows) is
    broadcast back, so scoring is explode -> broadcast hash join ->
    one map-side-combinable per-doc sum. The raw corpus is read twice
    (fit + score) and never joined against itself; nothing in the plan
    grows with corpus size except the two linear passes.
    """
    from disq_spark.operators.dispatch import fan_out

    # the hashed-ngram explode is per-byte heavy and feeds THREE
    # subtrees (raw fit, target fit, scoring join) — a narrow source
    # runs each serially (r11 stage sweep: 1.2 s single-task fit
    # stages at sf0.01). No-op whenever the corpus already carries
    # >= cores partitions, i.e. always at scale.
    rf = dsir_features(fan_out(raw, id_col), text_col, buckets)
    tf_ = dsir_features(fan_out(target, id_col), text_col, buckets)

    import math

    rc = rf.groupBy("bucket").agg(F.count("*").alias("rc"))
    tc = tf_.groupBy("bucket").agg(F.count("*").alias("tc"))
    spark = raw.sparkSession
    # one fit job: the joint bucket table is exactly `buckets` rows, so
    # totals and log-ratios are computed driver-side from one collect
    fit = {
        r["bucket"]: (r["rc"] or 0, r["tc"] or 0)
        for r in rc.join(tc, "bucket", "full").collect()
    }
    rt = sum(v[0] for v in fit.values())
    tt = sum(v[1] for v in fit.values())
    rows = []
    for b in range(buckets):
        rcb, tcb = fit.get(b, (0, 0))
        rows.append((
            b,
            math.log((tcb + 1) / float(tt + buckets))
            - math.log((rcb + 1) / float(rt + buckets)),
        ))
    w = spark.createDataFrame(rows, "bucket long, logratio double")
    return (
        rf.join(F.broadcast(w), "bucket")
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.count("*").alias("n_features"),
            F.round(F.sum("logratio"), round_to).alias("logweight"),
        )
    )


def importance_resample(
    scored: DataFrame,
    k: int,
    weight_col: str = "logweight",
    key: str = "doc_id",
    seed: str = "",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic importance resampling via the Gumbel-top-k trick:
    drawing k rows WITHOUT replacement with probability proportional to
    exp(weight_col) is exactly taking the k largest values of

        gumbel_key = weight + G,   G = -ln(-ln(u))

    when u is uniform on (0,1) (Vieira 2014; the sampling counterpart
    of DSIR's weighting step). u comes from the same md5-of-key scheme
    as :func:`hash_sample`, so the selected set is a pure function of
    (row key, seed) — identical under repartitioning, retries, and
    engine (the oracle replays it in DuckDB verbatim).

    Scale shape: one column expression per row followed by a global
    top-k, which Spark executes as TakeOrderedAndProject — per-partition
    heap of k then a k*partitions driver merge; no full sort, no
    shuffle. Keep k in the 10^6 range or below; resample larger
    selections in per-shard strata (compose with assign_shards).
    """
    # clamp u away from exact 0/1 so the double log never overflows
    u = f"greatest(1e-12, least(1.0 - 1e-12, {uniform_sql(key, seed)}))"
    g = (
        scored.withColumn(
            "gumbel_key",
            F.round(
                F.col(weight_col) + F.expr(f"-ln(-ln({u}))"), round_to
            ),
        )
    )
    return g.orderBy(F.col("gumbel_key").desc(), F.col(key)).limit(k)


def importance_resample_sql(
    source_sql: str,
    k: int,
    weight_col: str = "logweight",
    key: str = "doc_id",
    seed: str = "",
    round_to: int = 6,
) -> str:
    """DuckDB/ANSI oracle for :func:`importance_resample` over any
    relation expression producing (key, weight_col)."""
    u = f"greatest(1e-12, least(1.0 - 1e-12, {uniform_sql(key, seed)}))"
    return f"""
SELECT *, round({weight_col} + -ln(-ln({u})), {round_to}) AS gumbel_key
FROM ({source_sql})
ORDER BY gumbel_key DESC, {key} LIMIT {k}
"""


def pack_sequences_bfd(
    df: DataFrame,
    budget: int,
    token_col: str,
    key: str,
    n_shards: int = 64,
    seed: str = "",
) -> DataFrame:
    """Best-fit-decreasing sequence packing — the no-cross-document-
    attention alternative to ``pack_sequences``: each document lands
    whole in exactly one bin of ``budget`` tokens (concat-then-chop
    splits documents across context windows; BFD never does), at the
    cost of per-bin slack. Classic bin-packing: documents sorted by
    token count DESCENDING are placed into the FULLEST bin that still
    fits (11/9 OPT + 6/9 bins guarantee); ties break to the lowest bin
    id, so the layout is fully deterministic.

    Documents longer than ``budget`` get a bin of their own with
    ``overflow = true`` — flagged, never silently truncated (chunk
    first: operators/chunking.py).

    Adds (shard, bin_id, overflow). Packing is sequential BY NATURE, so
    it runs per shard: hash-sharding (``assign_shards``) keeps the
    layout partition-invariant and bounds the sequential unit; at 100 TB
    pick n_shards >> cores and each task packs one shard. The kernel is
    an Arrow-batched applyInPandas (one group per shard) with an
    O(docs x bins) scan per shard — swap in a fill-ordered tree when a
    single shard's bin count makes the scan bite; the layout contract
    (sorted order + best-fit + lowest-id ties) is what tests pin.

    No SQL oracle: sequential greedy placement is not SQL-expressible;
    the gate is rows-only and the serial reference lives in the tests.
    """
    out = assign_shards(df, n_shards, key, seed)
    key_t = df.schema[key].dataType.simpleString()
    tok_t = df.schema[token_col].dataType.simpleString()
    schema = (
        f"{key} {key_t}, {token_col} {tok_t}, shard int, "
        "bin_id long, overflow boolean"
    )
    b = int(budget)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [token_col, key], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []
        bin_ids, overflows = [], []
        for n in pdf[token_col].tolist():
            n = int(n)
            if n > b:
                bin_ids.append(len(fills))
                overflows.append(True)
                fills.append(n)
                continue
            best, best_fill = -1, -1
            for i, f in enumerate(fills):
                if f + n <= b and f > best_fill:
                    best, best_fill = i, f
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += n
            bin_ids.append(best)
            overflows.append(False)
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                token_col: pdf[token_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bin_ids,
                "overflow": overflows,
            }
        )

    return out.select(key, token_col, "shard").groupBy("shard").applyInPandas(
        pack, schema
    )


def bfd_oracle_ctes(
    budget: int,
    n_shards: int,
    tokens_expr: str,
    docs_table: str = "documents",
    key: str = "doc_id",
    seed: str = "",
) -> str:
    """DuckDB mirror of ``pack_sequences_bfd`` as a recursive CTE (needs
    a ``WITH RECURSIVE`` prefix). Greedy sequential placement IS
    SQL-expressible: the per-shard packing state is the LIST of bin
    fills, advanced one document per recursion step in the same
    (tokens DESC, key ASC) order the kernel sorts by. Best-fit =
    ``list_aggregate(list_filter(fills, f -> f + n <= budget), 'max')``;
    the lowest-index tie-break is ``list_position`` (first occurrence).
    An overflow document (n > budget) and a no-bin-fits document both
    append a new bin holding exactly n. Produces ``bfd_bins(shard,
    fill)`` — one row per bin; a bin is an overflow bin iff
    fill > budget (overflow docs always sit alone: nothing ever fits
    next to a fill already above budget)."""
    b = int(budget)
    splice = (
        "list_slice(st.fills, 1, list_position(st.fills, best_f) - 1) || "
        "[best_f + o.n] || "
        "list_slice(st.fills, list_position(st.fills, best_f) + 1, len(st.fills))"
    )
    return f"""bfd_base AS (
  SELECT {key} AS k, CAST({tokens_expr} AS BIGINT) AS n,
         CAST({shard_sql(key, n_shards, seed)} AS INT) AS shard
  FROM {docs_table}
),
bfd_ordered AS (
  SELECT shard, k, n,
         row_number() OVER (PARTITION BY shard ORDER BY n DESC, k) AS rn
  FROM bfd_base
),
bfd_cnt AS (SELECT shard, max(rn) AS mx FROM bfd_ordered GROUP BY shard),
bfd_st AS (
  SELECT shard, 0 AS i, CAST([] AS BIGINT[]) AS fills FROM bfd_cnt
  UNION ALL
  SELECT st.shard, st.i + 1,
    CASE WHEN o.n > {b} OR best_f IS NULL THEN list_append(st.fills, o.n)
         ELSE {splice} END
  FROM (
    SELECT st.*, o.n,
           list_aggregate(list_filter(st.fills, f -> f + o.n <= {b}), 'max') AS best_f
    FROM bfd_st st JOIN bfd_ordered o ON o.shard = st.shard AND o.rn = st.i + 1
  ) st(shard, i, fills, n, best_f),
  LATERAL (SELECT st.n AS n) o
),
bfd_bins AS (
  SELECT st.shard, unnest(st.fills) AS fill
  FROM bfd_st st JOIN bfd_cnt c ON c.shard = st.shard AND st.i = c.mx
)"""


def chunk_token_windows(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-TOKEN training windows with overlap — the long-document
    counterpart of ``pack_sequences`` (distinct from operators/chunking.py::
    chunk_documents, the fixed-CHARACTER RAG chunker) (packing concatenates SHORT docs
    onto a token tape; chunking splits LONG docs into windows a model's
    context can hold; real corpus prep runs both).

    Output: (id_col, chunk_id, n_tokens, chunk_text). Window ``j``
    covers whitespace tokens [j*stride, j*stride + max_tokens) of the
    normalized text, stride = max_tokens - overlap; the final window
    keeps the tail (may be shorter); a document of <= max_tokens tokens
    (including an empty one) yields exactly one window. Chunk count is
    ceil((n - max_tokens) / stride) + 1 for n > max_tokens.

    Plan shape: one posexplode over a per-row sequence — no shuffle, no
    UDF; the token array is built once per row and sliced per window
    (slice is O(window), not O(doc), so a document's total cost is
    O(n_chunks * max_tokens) ~= O(n * max/stride))."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    from disq_spark.functions.text import tokens

    stride = max_tokens - overlap
    # coalesce NULL text to '' so a NULL-text document yields one empty
    # chunk (like an empty document) on BOTH engines: without it Spark
    # emits a phantom row (size(NULL) = -1, NULL chunk_text) while the
    # SQL mirror's generate_series(0, NULL) drops the doc entirely
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    n_chunks = (
        F.when(n <= max_tokens, F.lit(1))
        .otherwise(F.ceil((n - F.lit(max_tokens)) / F.lit(float(stride))).cast("int") + 1)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("__p", "chunk_id"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_token_windows_sql(
    max_tokens: int,
    overlap: int,
    docs_table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of chunk_token_windows: produces a CTE named ``chunks``
    (doc_id, chunk_id, n_tokens, chunk_text)."""
    stride = max_tokens - overlap
    # coalesce mirrors the Spark side's NULL-text handling (see
    # chunk_token_windows): NULL -> '' -> one empty chunk per doc
    norm = f"trim(regexp_replace(lower(coalesce({text_col}, '')), '\\s+', ' ', 'g'))"
    toks = f"(CASE WHEN {norm} = '' THEN [] ELSE string_split({norm}, ' ') END)"
    # tokenize ONCE in the innermost subquery — inlining the CASE into
    # the generate_series bound as well would run the regex pipeline up
    # to three times per document
    return f"""chunks AS (
  SELECT doc_id, chunk_id,
         len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_tokens}]) AS n_tokens,
         coalesce(array_to_string(
             toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_tokens}], ' '),
           '') AS chunk_text
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(0,
             CASE WHEN len(toks) <= {max_tokens} THEN 0
                  ELSE cast(ceil((len(toks) - {max_tokens}) / {float(stride)}) AS int)
             END)) AS chunk_id
    FROM (SELECT doc_id, {toks} AS toks FROM {docs_table}))
)"""
