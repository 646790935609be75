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
