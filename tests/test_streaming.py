"""Structured Streaming operators driven to completion with availableNow
+ memory sink; results checked against the batch formulations."""

import pandas as pd
from pyspark.sql import functions as F

from disq_spark.queries.tables import load
from disq_spark.streaming.events import session_counts, windowed_counts

SF = "/root/testdata/sf0.001"


def _event_stream(spark, tmp_path):
    # re-materialize events as a micro-batched parquet stream source
    # (the TIMESTAMP_NANOS source parquet needs the conversion in load())
    batch = load(spark, SF, "events")
    src = str(tmp_path / "stream_src")
    batch.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(batch.schema).parquet(src), batch


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    stream, batch = _event_stream(spark, tmp_path)
    q = (
        windowed_counts(stream, window="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, event_type, n FROM win_out"
    ).collect()
    expect = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    g = {(r.window_start, r.event_type): r.n for r in got}
    e = {(r.window_start, r.event_type): r.n for r in expect}
    # append mode with availableNow emits all finalized windows; late-data
    # windows beyond the watermark horizon may be withheld — require the
    # emitted ones to match exactly and cover >= 95% of batch windows
    assert all(e.get(k) == v for k, v in g.items())
    assert len(g) >= 0.95 * len(e)


def test_session_counts_stream(spark, tmp_path):
    stream, batch = _event_stream(spark, tmp_path)
    q = (
        session_counts(stream, gap="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, sum(n_events) AS n FROM sess_out GROUP BY user_id").collect()
    per_user = {r.user_id: r.n for r in got}
    # every emitted session's events must not exceed the user's totals
    totals = {r.user_id: r["count"] for r in batch.groupBy("user_id").count().collect()}
    assert per_user
    assert all(per_user[u] <= totals[u] for u in per_user)


def test_streaming_exact_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: duplicated corpus in, each distinct
    content out exactly once — across micro-batches (two source files)."""
    from disq_spark.streaming.dedup import streaming_exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "dedup_src")
    # two copies written as separate files -> duplicates arrive in later
    # micro-batches too (maxFilesPerTrigger=1 forces multi-batch)
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_exact_dedup(stream, "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT doc_id, fingerprint FROM dedup_out").collect()

    from disq_spark.functions.text import normalize

    n_distinct = docs.select(F.md5(normalize(F.col("text")))).distinct().count()
    # exactly one row per distinct content, no fingerprint twice
    assert len(out) == n_distinct
    assert len({r.fingerprint for r in out}) == n_distinct


def test_streaming_hll_equals_batch_sketch(spark, tmp_path):
    """HLL registers maintained over a stream == batch sketch of the same
    rows (exact equality: both are the same deterministic arithmetic).
    State is 2^p rows forever — the bounded-state streaming profile."""
    from disq_spark.operators.sketches import hll_registers
    from disq_spark.streaming.sketches import streaming_hll_registers

    batch = load(spark, SF, "orders")
    src = str(tmp_path / "hll_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_hll_registers(stream, "o_custkey", p=8)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT bucket, max_rho FROM hll_out").collect()))
    want = sorted(map(tuple, hll_registers(batch, "o_custkey", p=8).collect()))
    assert got == want


def test_streaming_countmin_equals_batch_sketch(spark, tmp_path):
    from disq_spark.operators.sketches import countmin_table
    from disq_spark.streaming.sketches import streaming_countmin

    batch = load(spark, SF, "orders").select(F.col("o_orderpriority").alias("v"))
    src = str(tmp_path / "cm_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_countmin(stream, "v", depth=2, width=16)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT row, col, cnt FROM cm_out").collect()))
    want = sorted(map(tuple, countmin_table(batch, "v", depth=2, width=16).collect()))
    assert got == want


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream attribution join == the batch interval
    join of the same rows (availableNow drains everything, so no rows
    are watermark-dropped and equality is exact)."""
    from disq_spark.streaming.joins import stream_interval_join

    stream, batch = _event_stream(spark, tmp_path)
    clicks_s = stream.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch_s = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    q = (
        stream_interval_join(clicks_s, purch_s, window="30 minutes")
        .select("event_id", "user_id", "ts", "r_event_id", "r_ts", "r_value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT event_id, r_event_id FROM ssj_out").collect())
    )

    c = batch.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ce"), F.col("user_id").alias("cu"), F.col("ts").alias("ct")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"), F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    want = sorted(
        map(
            tuple,
            c.join(
                p,
                (F.col("cu") == F.col("pu"))
                & (F.col("pt") <= F.col("ct"))
                & (F.col("pt") >= F.col("ct") - F.expr("INTERVAL 30 minutes")),
            )
            .select("ce", "pe")
            .collect(),
        )
    )
    assert len(want) > 0
    assert got == want


def test_streaming_neardup_pairs_equal_batch(spark, tmp_path):
    """Stateful streaming MinHash+LSH must emit exactly the batch
    operator's (uncapped) pair set — with the corpus split across
    micro-batches (maxFilesPerTrigger=1), so pairs whose members arrive
    in different batches are found via bucket state, and the (min,max)
    normalization makes the set independent of arrival order."""
    from disq_spark.operators.dedup import minhash_lsh_pairs
    from disq_spark.streaming.neardup import streaming_minhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "neardup_src")
    half_a.coalesce(1).write.mode("overwrite").parquet(src)
    half_b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_minhash_pairs(stream, threshold=0.25)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in spark.sql("SELECT * FROM neardup_out").collect()
    }
    want = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.25, max_df=None).collect()
    }
    assert got == want
    assert len(want) > 5  # not vacuous


def test_streaming_embedding_neardup_equal_batch(spark, tmp_path):
    """Streaming sign-LSH embedding near-dup must emit the batch
    operator's pair set at the same n_bits, across micro-batches."""
    from disq_spark.operators.similarity import embedding_neardup_pairs
    from disq_spark.streaming.neardup import streaming_embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    src = str(tmp_path / "embdup_src")
    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_embedding_neardup_pairs(stream, threshold=0.3, n_bits=6)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("embdup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.id_a, r.id_b): r.score
        for r in spark.sql("SELECT * FROM embdup_out").collect()
    }
    want = {
        (r.id_a, r.id_b): r.score
        for r in embedding_neardup_pairs(emb, threshold=0.3, n_bits=6).collect()
    }
    assert got == want
    assert len(want) > 5


def test_warc_stream_tails_segment_directory(spark, tmp_path):
    """readStream format('warc'): microbatches pick up exactly the
    segments that appeared since the committed offset — drained stream
    == batch read after every arrival wave, no record lost or doubled
    across a checkpointed restart."""
    import numpy as np

    from disq_spark.formats.warc import build_warc
    from disq_spark.sources.datasource import register_datasources
    from disq_spark.sources.warc import read_warc

    register_datasources(spark)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(41)

    def write_segment(i, n):
        recs = []
        for j in range(n):
            payload = bytes(rng.integers(32, 127, 300 + 50 * j, dtype=np.uint8))
            recs.append(
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:seg{i}:{j}>",
                        "WARC-Target-URI": f"https://x/{i}/{j}",
                        "Content-Type": "text/html",
                    },
                    payload,
                )
            )
        tmp = seg_dir / f".seg-{i:04d}.warc.gz.tmp"
        with open(tmp, "wb") as f:
            f.write(build_warc(recs, gzip_members=True))
        tmp.rename(seg_dir / f"seg-{i:04d}.warc.gz")  # atomic arrival

    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("warc")
            .option("split_size", 2048)
            .load(str(seg_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_segment(0, 5)
    write_segment(1, 7)
    drain()
    got1 = {
        r.record_id for r in spark.read.parquet(out_dir).collect()
    }
    want1 = {
        r.record_id for r in read_warc(spark, str(seg_dir)).collect()
    }
    assert got1 == want1 and len(got1) == 12

    # second wave + checkpointed restart: only the new segment arrives
    write_segment(2, 4)
    drain()
    rows = spark.read.parquet(out_dir).collect()
    ids = [r.record_id for r in rows]
    assert len(ids) == len(set(ids)) == 16  # no duplicates across restart
    assert {i for i in ids if i.startswith("<urn:seg2")} == {
        f"<urn:seg2:{j}>" for j in range(4)
    }
