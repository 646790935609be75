"""Document chunking — split long documents into fixed-size overlapping
windows with stable chunk ids, the preprocessing step before embedding /
context-window packing.

Pure Column arithmetic: chunk count and offsets are exact integer
expressions (no floats, no Python), so the operator runs at scan speed,
the explode fan-out is bounded by ceil(len/stride), and the DuckDB
oracle replays the identical arithmetic. Chunk ids are
``{doc_id}:{index}`` — deterministic under any partitioning, so a
re-run of a 100 TB chunking job produces byte-identical keys (the
property downstream incremental embedding caches depend on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: (doc_id, chunk_id, chunk_index, chunk_text).

    Windows of ``size`` chars every ``size - overlap`` chars; a document
    shorter than ``size`` yields exactly one chunk (its full text);
    empty documents yield one empty chunk (callers filter if unwanted).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    # extra chunks beyond the first: ceil(max(len - size, 0) / stride),
    # as exact integer arithmetic
    n_chunks = F.expr(
        f"greatest(cast(0 as bigint), "
        f"(length({text_col}) - {size} + {stride} - 1) div {stride}) + 1"
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__t"),
            F.posexplode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "__p", "chunk_index"
            ),
        )
        .select(
            "doc_id",
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("chunk_index")
            ).alias("chunk_id"),
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.expr(f"substring(__t, chunk_index * {stride} + 1, {size})").alias(
                "chunk_text"
            ),
        )
    )
