"""Shared plumbing for the streaming gate queries.

- ``bounded_stream``: re-materialize a synthetic table as a parquet
  stream source ONCE per (table, source-file identity, code version) —
  keyed on the source's mtime+size plus the package fingerprint, so a
  regenerated data drop OR a code change invalidates the cache —
  instead of writing a fresh tempdir copy on every gate run. The build
  is published atomically (see ``disq_spark.cacheutil``), so racing
  gate processes can't interleave partial writes.
- ``run_to_completion``: availableNow queries signal timeout through
  ``awaitTermination``'s RETURN VALUE, not an exception; returning the
  partially-filled memory sink would hand the gate a silently-truncated
  answer, so a False here must raise.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from disq_spark.cacheutil import cache_key, ensure_cached_dir
from disq_spark.queries.tables import load

STREAM_GATE_TIMEOUT_S = 300


def bounded_stream(
    spark: SparkSession, sf_dir: str, table: str, cols: list[str]
) -> DataFrame:
    src_file = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src_file)
    key = cache_key(src_file, st.st_mtime_ns, st.st_size, ",".join(cols))
    cache = os.path.join(tempfile.gettempdir(), f"disq_stream_src_{key}")
    data = os.path.join(cache, "data")

    def _build(tmp: str) -> None:
        load(spark, sf_dir, table).select(*cols).write.mode("overwrite").parquet(
            os.path.join(tmp, "data")
        )

    ensure_cached_dir(cache, _build)
    schema = spark.read.parquet(data).schema
    return spark.readStream.schema(schema).parquet(data)


def run_to_completion(query, name: str, timeout_s: int = STREAM_GATE_TIMEOUT_S) -> None:
    # stop() in finally: an awaitTermination that *raises* (e.g.
    # StreamingQueryException) must not leak a running stream
    try:
        finished = query.awaitTermination(timeout_s)
    finally:
        query.stop()
    if not finished:
        raise RuntimeError(
            f"streaming gate query {name!r} did not finish within {timeout_s}s; "
            "refusing to return a partially-filled sink"
        )
