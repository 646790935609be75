"""Streaming NEAR-duplicate detection — MinHash+LSH with per-bucket
signature state on ``applyInPandasWithState``.

Batch near-dup (``operators/dedup.minhash_lsh_pairs``) needs the whole
corpus; a training-data ingest pipeline needs the same signal as
documents ARRIVE. This operator keeps, per LSH band bucket, the
signatures of every document routed to that bucket, and emits a
``(id_a, id_b, est_jaccard)`` row the moment the LATER member of a
near-dup pair shows up (id_a < id_b, est >= threshold).

Semantics chosen for determinism: the emitted PAIR SET is independent
of micro-batch boundaries and arrival order — whichever member arrives
second finds the first in state, and both orders produce the same
normalized (min, max) pair. A kept/dropped verdict ("first wins") is
NOT order-independent under re-batching, which is why the pair set is
the operator's contract; admission policy is a trivial downstream
filter once the consumer picks its tie-break (e.g. min id, like the
batch ``duplicate_components``).

Parity with the batch operator: signatures are computed per-row in
Python with the exact batch formulas (normalize -> k/stride shingles ->
60-bit md5 base hash mod 2^31-1 -> Carter-Wegman mins -> per-band md5
keys, same ``minhash_params`` literals), so on a bounded stream the
distinct pair set equals ``minhash_lsh_pairs(..., max_df=None)``. A
df-cap is the one thing streaming cannot replicate (document frequency
is a corpus-global statistic); at ingest scale the cap's job — hot
buckets — is done by ``max_bucket`` below.

Scale shape:
- signature computation is a stateless ``mapInPandas`` (no shuffle);
  the single shuffle is the band-bucket groupBy, which is also the
  state-store partitioning, so re-keyed batches hit local state.
- state per bucket = ids + signatures of its members (the standard
  LSH-memory trade: bands x corpus signature copies). ``ttl_minutes``
  expires idle buckets (processing-time timeout); ``max_bucket`` stops
  comparing/admitting into a pathological hot bucket (emits nothing
  for overflow docs in that bucket — they still compare in their other
  bands), bounding per-bucket state and per-arrival compare cost.

The reference repo has no streaming at all; this extends SURVEY.md's
LLM-pipeline tier (exact streaming dedup: ``streaming/dedup.py``).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from disq_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    MINHASH_PRIME,
    minhash_params,
)

_WS = re.compile(r"\s+")


def _signature(text: str, params, k: int, stride: int) -> list[int]:
    """Batch-formula minhash signature of one document (see
    operators/dedup.minhash_signatures; shingle_table for the shingle
    grid: distinct substrings at i*stride, window k, at least one)."""
    t = _WS.sub(" ", text.lower()).strip()
    n_last = max((len(t) - k) // stride, 0)
    shingles = {t[i * stride : i * stride + k] for i in range(n_last + 1)}
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_PRIME
        for s in shingles
    ]
    return [min((a * h + b) % MINHASH_PRIME for h in hs) for a, b in params]


def streaming_minhash_pairs(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    k: int = 8,
    stride: int = 4,
    ttl_minutes: int | None = None,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) near-dup pairs over a document stream.

    A pair may be emitted once per shared band bucket — consumers
    wanting set semantics apply ``dropDuplicates(["id_a", "id_b"])``
    (batch) or their keyed sink's upsert; the duplicate emissions carry
    the identical est_jaccard, so any resolution is consistent.
    """
    assert num_hashes % bands == 0
    params = minhash_params(num_hashes)
    rpb = num_hashes // bands
    nh = float(num_hashes)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def sig_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys, sigs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                mh = _signature(str(text), params, k, stride)
                for b in range(bands):
                    seg = mh[b * rpb : (b + 1) * rpb]
                    key = hashlib.md5("|".join(map(str, seg)).encode()).hexdigest()
                    ids.append(did)
                    keys.append(f"{b}:{key}")
                    sigs.append(mh)
            yield pd.DataFrame({"id": ids, "bucket": keys, "mh": sigs})

    tagged = stream.select(F.col(id_col), F.col(text_col)).mapInPandas(
        sig_rows, "id long, bucket string, mh array<long>"
    )

    def bucket_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows: list[tuple[int, list[int]]] = []
        for pdf in pdfs:
            # plain-python ints: the state tuple is pickled for the JVM
            # state store, which rejects numpy scalars
            rows.extend(
                zip(pdf["id"].tolist(), ([int(x) for x in m] for m in pdf["mh"]))
            )
        if state.exists:
            ids, flat = state.get
            members = [
                (ids[i], list(flat[i * num_hashes : (i + 1) * num_hashes]))
                for i in range(len(ids))
            ]
        else:
            members = []
        known = {m[0] for m in members}
        out_a, out_b, out_s = [], [], []
        # id order makes within-batch emission deterministic; across
        # batches the (min, max) normalization makes order irrelevant
        for did, mh in sorted(rows, key=lambda r: r[0]):
            if did in known:  # redelivery: state already has this doc
                continue
            if len(members) < max_bucket:
                for oid, omh in members:
                    est = round(
                        sum(1 for x, y in zip(mh, omh) if x == y) / nh, 4
                    )
                    if est >= threshold:
                        out_a.append(min(did, oid))
                        out_b.append(max(did, oid))
                        out_s.append(est)
                members.append((did, mh))
                known.add(did)
            # overflow docs in a hot bucket: skip here; their other
            # bands still compare them (df-cap analog, documented)
        new_ids = [m[0] for m in members]
        new_flat = [c for m in members for c in m[1]]
        state.update((new_ids, new_flat))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "est_jaccard": out_s}
            )

    return tagged.groupBy("bucket").applyInPandasWithState(
        bucket_fn,
        "id_a long, id_b long, est_jaccard double",
        "ids array<long>, sigs array<long>",
        "append",
        timeout,
    )


def streaming_embedding_neardup_pairs(
    stream: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    ttl_minutes: int | None = None,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs over a vector stream — the
    streaming analog of ``operators/similarity.embedding_neardup_pairs``
    with the same sign-LSH bucketing (bit i = sign(vec[i])), so on a
    bounded stream the pair set equals the batch operator's at the same
    ``n_bits``. Per-bucket state holds member ids + float64 vectors +
    norms; each arrival scores against its bucket with one numpy
    matvec. ``n_bits`` is a fixed parameter here (streaming cannot
    count the corpus first — size it for the expected steady-state rate
    like ``scale_n_bits`` would); (min,max) pair normalization makes
    the output batch-boundary- and order-independent, same contract as
    ``streaming_minhash_pairs``."""
    import numpy as np

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def tag_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (v[:, :n_bits] >= 0.0).astype(np.int64)
            bucket = (bits * (1 << np.arange(n_bits, dtype=np.int64))).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "bucket": bucket,
                    "v": list(v),
                    "nrm": np.sqrt((v * v).sum(axis=1)),
                }
            )

    tagged = stream.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        tag_rows, "id long, bucket long, v array<double>, nrm double"
    )

    def bucket_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows: list[tuple[int, list[float], float]] = []
        for pdf in pdfs:
            rows.extend(
                zip(
                    pdf["id"].tolist(),
                    ([float(x) for x in m] for m in pdf["v"]),
                    (float(x) for x in pdf["nrm"]),
                )
            )
        if state.exists:
            ids, flat, nrms = state.get
            dim = len(flat) // len(ids) if ids else 0
            members = [
                (ids[i], list(flat[i * dim : (i + 1) * dim]), nrms[i])
                for i in range(len(ids))
            ]
        else:
            members = []
        known = {m[0] for m in members}
        out_a, out_b, out_s = [], [], []
        for vid, vec, nrm in sorted(rows, key=lambda r: r[0]):
            if vid in known:
                continue
            if len(members) < max_bucket:
                if members:
                    mat = np.array([m[1] for m in members])
                    mn = np.array([m[2] for m in members])
                    scores = np.round((mat @ np.array(vec)) / (mn * nrm), round_to)
                    for j in np.nonzero(scores >= threshold)[0]:
                        oid = members[j][0]
                        out_a.append(min(vid, oid))
                        out_b.append(max(vid, oid))
                        out_s.append(float(scores[j]))
                members.append((vid, vec, nrm))
                known.add(vid)
        state.update(
            (
                [m[0] for m in members],
                [c for m in members for c in m[1]],
                [m[2] for m in members],
            )
        )
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "score": out_s})

    return tagged.groupBy("bucket").applyInPandasWithState(
        bucket_fn,
        "id_a long, id_b long, score double",
        "ids array<long>, vecs array<double>, nrms array<double>",
        "append",
        timeout,
    )
