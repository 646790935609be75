"""Small-file compaction for Parquet datasets.

The operational failure mode of any long-running ingest: thousands of
KB-sized part files per partition directory, each costing a task, a
footer read, and a namenode entry. Compaction rewrites a dataset into
~target-sized files:

- file count = ceil(total_bytes / target_bytes) via repartition (hash,
  no global sort — ordering inside a compacted dataset is not a
  contract; use materialize.py when position-clustering matters),
- write-to-temp + atomic directory swap, so readers never observe a
  half-compacted dataset and a mid-compaction failure leaves the
  original untouched,
- partitioned datasets compact per partition directory (the unit Spark
  lists and prunes).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from disq_spark import fs as _dfs

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _parquet_parts(path: str) -> list[tuple[str, int]]:
    return [
        (p, _dfs.getsize(p))
        for p in _dfs.listdir(path)
        if os.path.basename(p).startswith("part-") and p.endswith(".parquet")
    ]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 4,
) -> dict:
    """Compact one Parquet directory (non-recursive). Returns a stats
    dict {files_before, files_after, bytes}. No-op (files_after ==
    files_before) when the directory is already coarse enough."""
    parts = _parquet_parts(path)
    total = sum(sz for _, sz in parts)
    if len(parts) < min_files_to_compact or total / max(len(parts), 1) >= target_bytes / 2:
        return {"files_before": len(parts), "files_after": len(parts), "bytes": total}
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + ".compact.old"
    _dfs.rename(path, bak)
    _dfs.rename(tmp, path)
    _dfs.rmtree(bak)
    return {
        "files_before": len(parts),
        "files_after": len(_parquet_parts(path)),
        "bytes": total,
    }


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates,
    key: str,
    delete_col: str | None = None,
) -> dict:
    """MERGE-INTO semantics for a plain Parquet dataset: rows in
    ``updates`` replace same-``key`` rows, new keys append, and (when
    ``delete_col`` names a boolean column) delete-marked keys drop.

    Plan shape: one LEFT ANTI join of the base against the (broadcast
    when small) update key set + union — the base is never shuffled on
    its own account. Same write-to-temp + atomic swap as compaction, so
    failures leave the original dataset intact and readers never see a
    partial merge. The incremental-pipeline companion to
    dedup.incremental_*: the daily batch lands with one pass over the
    base.
    """
    from pyspark.sql import functions as F

    base = spark.read.parquet(path)
    if delete_col is not None:
        deletes = updates.filter(F.col(delete_col)).select(key)
        upserts = updates.filter(~F.col(delete_col)).drop(delete_col)
    else:
        deletes = None
        upserts = updates
    touched = upserts.select(key)
    if deletes is not None:
        touched = touched.union(deletes)
    kept = base.join(F.broadcast(touched), key, "left_anti")
    merged = kept.unionByName(upserts)

    tmp = path.rstrip("/") + ".upsert.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    bak = path.rstrip("/") + ".upsert.old"
    _dfs.rename(path, bak)
    _dfs.rename(tmp, path)
    _dfs.rmtree(bak)
    return {"rows_after": n_after}
