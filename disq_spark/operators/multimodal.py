"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched mapInPandas stages.

The container has no decode libraries (PIL/ffmpeg/soundfile), so the
decode kernels are STUBS: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder
(md5-seeded dimensions/features) exercises the full Spark-side pipeline
— schema, batch shapes, partitioning — which is the part that has to be
right at 100 TB. Swap ``_fake_decode`` for a real PIL/ffmpeg call and
nothing else changes.

Design for scale:
- payloads stay in BinaryType columns (Tungsten off-heap, Arrow
  zero-copy to pandas); never hex/base64 strings.
- decode is mapInPandas (per-batch), so memory is bounded by
  maxRecordsPerBatch x max payload, not partition size.
- feature outputs are fixed-width arrays -> columnar, prunable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long, content_md5 string"
)
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, features array<float>"
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat a text column as an opaque binary payload + metadata —
    the ingestion shape for real image/audio bytes."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake image decode: md5-seeded dims + 8 features."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    features = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, features


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads -> (width, height, features). STUB: real decode
    needs PIL/libjpeg which this environment lacks; ``fake=True`` runs
    the deterministic fake kernel through the real distributed plumbing."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this environment); "
            "call with fake=True to run the deterministic stub kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, feats = _fake_decode(bytes(r["payload"]))
                rows.append((r["doc_id"], w, h, r["n_bytes"], feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_bytes", "features"]
            )

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """'Frame sampling' for the stub payload: one sample index per
    every_n_bytes — the batch/explode shape of real video frame extraction."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") / every_n_bytes).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
        "n_bytes",
    )

RESIZED_SCHEMA = (
    "doc_id long, width int, height int, resized_w int, resized_h int, "
    "resized_payload binary"
)
FEATURES_SCHEMA = "doc_id long, features array<double>"


def resize_image(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = False
) -> DataFrame:
    """Aspect-preserving fit-resize. STUB: a real kernel needs PIL; the
    fake kernel derives source dims from the deterministic fake decode,
    computes the same fit arithmetic a real resize would, and emits a
    16-byte stand-in payload (the md5 digest) — exercising the
    binary-in/binary-out mapInPandas shape (Arrow handles BinaryType
    zero-copy in both directions; that is the property to protect at
    100 TB, where re-encoded payloads dominate the shuffle).

    Rounding is floor(x + 0.5) — not Python's round() — so an external
    SQL oracle can reproduce it exactly (banker's rounding can't be
    spelled portably).
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/pillow (not in this environment); "
            "call with fake=True to run the deterministic stub kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, _ = _fake_decode(b)
                scale = min(target_w / w, target_h / h)
                rw, rh = int(w * scale + 0.5), int(h * scale + 0.5)
                rows.append((doc_id, w, h, rw, rh, hashlib.md5(b).digest()))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "resized_w",
                    "resized_h",
                    "resized_payload",
                ],
            )

    return df.mapInPandas(kernel, RESIZED_SCHEMA)


def extract_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector — a REAL kernel (no decode library
    needed): normalized ``bins``-bin histogram of payload bytes, the
    stand-in for a CLIP-style featurizer. Swap the numpy body for a GPU
    batch call and the distributed shape is unchanged: Arrow batches in,
    fixed-width float arrays out, memory bounded by
    maxRecordsPerBatch x payload size, never partition size.
    """
    import numpy as np

    span = 256 // bins

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(arr) or 1
                hist = np.bincount(arr // span, minlength=bins)[:bins]
                # explicit half-up rounding: counts/n are dyadic rationals
                # that DO land on exact 1e-6 halves, where Python's
                # banker's rounding and SQL ROUND() disagree
                out.append(
                    (doc_id, [int(float(c) / n * 1e6 + 0.5) / 1e6 for c in hist])
                )
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, rms double, peak double"
)


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode audio payloads -> (sample_rate, n_samples, rms, peak).
    STUB: real decode needs soundfile/ffmpeg which this environment
    lacks; ``fake=True`` treats the payload bytes as centered 8-bit PCM
    (md5-seeded sample rate) so the distributed plumbing — Arrow batch
    shape, per-record aggregation, bounded memory — is real and tested.
    """
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this environment); "
            "call with fake=True to run the deterministic stub kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                h = hashlib.md5(payload).digest()
                rate = (8000, 16000, 22050, 44100)[h[0] % 4]
                # payload bytes as signed-centered PCM in [-1, 1)
                samples = [(b - 128) / 128.0 for b in payload]
                n = len(samples)
                rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
                peak = max((abs(s) for s in samples), default=0.0)
                # half-up rounding (floor(x*1e6+0.5)) so a SQL oracle can
                # reproduce it exactly — Python round() is banker's
                rows.append(
                    (
                        r["doc_id"],
                        rate,
                        n,
                        math.floor(rms * 1e6 + 0.5) / 1e6,
                        math.floor(peak * 1e6 + 0.5) / 1e6,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "rms", "peak"]
            )

    return df.mapInPandas(kernel, AUDIO_SCHEMA)
