"""Shared plumbing for the streaming gate queries.

- ``bounded_stream``: re-materialize a synthetic table as a parquet
  stream source ONCE per (table, source-file identity) — keyed on the
  source's mtime+size so a regenerated data drop invalidates the cache
  — instead of writing a fresh tempdir copy on every gate run.
- ``run_to_completion``: availableNow queries signal timeout through
  ``awaitTermination``'s RETURN VALUE, not an exception; returning the
  partially-filled memory sink would hand the gate a silently-truncated
  answer, so a False here must raise.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from disq_spark.queries.tables import load

STREAM_GATE_TIMEOUT_S = 300


def bounded_stream(
    spark: SparkSession, sf_dir: str, table: str, cols: list[str]
) -> DataFrame:
    src_file = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{src_file}:{st.st_mtime_ns}:{st.st_size}:{','.join(cols)}".encode()
    ).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(), f"disq_stream_src_{key}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        load(spark, sf_dir, table).select(*cols).write.mode("overwrite").parquet(cache)
    schema = spark.read.parquet(cache).schema
    return spark.readStream.schema(schema).parquet(cache)


def run_to_completion(query, name: str, timeout_s: int = STREAM_GATE_TIMEOUT_S) -> None:
    finished = query.awaitTermination(timeout_s)
    query.stop()
    if not finished:
        raise RuntimeError(
            f"streaming gate query {name!r} did not finish within {timeout_s}s; "
            "refusing to return a partially-filled sink"
        )
