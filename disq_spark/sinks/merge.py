"""Part-file concatenation for single-file outputs.

The reference's move (Merger.java:41-63 + HadoopFileSystemWrapper
.concat:142-168): write headerless/terminatorless parts in parallel,
then concatenate header + parts + terminator in filename order. Merge
strategy is dispatched per filesystem:

- HDFS-family schemes: rename the first part onto the target, then one
  driver-side ``FileSystem.concat`` py4j call — O(#parts) metadata-only,
  no bytes move. This is what keeps single-file output viable at 100 TB.
- everything else (local, object stores, memory): stream copy at disk
  bandwidth — the reference's own fallback path. Object stores could
  plug multipart-upload compose into fs.register().

All byte/metadata I/O goes through disq_spark.fs, so parts directories
on any registered scheme work.
"""

from __future__ import annotations

import os
import shutil

from disq_spark import fs as _dfs

# schemes whose Hadoop FileSystem implements concat() (metadata-only)
HADOOP_CONCAT_SCHEMES = ("hdfs", "webhdfs", "viewfs")


def attempt_part_path(parts_dir: str, prefix: str = "part", suffix: str = "") -> str:
    """Attempt-unique staging name: ``{prefix}-{pid:05d}-{uuid8}{suffix}``.

    The uuid suffix is the retry/speculation guard (the Hadoop
    OutputCommitter guarantee the reference gets from
    saveAsNewAPIHadoopFile, BamSink.java:82-94): two live attempts of one
    task stage to DIFFERENT paths, so neither can interleave the other's
    writes. The zero-padded pid prefix keeps lexicographic sort ==
    partition order, so the driver can finalize from the sorted collected
    names. Same scheme as the DataSource writer (sources/datasource.py).
    """
    import uuid

    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else 0
    return os.path.join(parts_dir, f"{prefix}-{pid:05d}-{uuid.uuid4().hex[:8]}{suffix}")


def collected_parts(rows) -> list[str]:
    """Finalize-set from the rows ``mapInPandas(...).collect()`` returned:
    only the attempts the scheduler reported as successful, only non-empty
    parts, in partition order. Never a directory listing — a listing would
    include losing speculative attempts and stale impostors."""
    return sorted(r.part for r in rows if r.n > 0 and r.part)


def list_parts(parts_dir: str) -> list[str]:
    paths = [
        p
        for p in _dfs.listdir(parts_dir)
        if not os.path.basename(p).startswith((".", "_")) and _dfs.getsize(p) > 0
    ]
    return sorted(paths)


def _hadoop_concat(dst: str, srcs: list[str]) -> list[int] | None:
    """O(#parts) commit on concat-capable filesystems: lengths are
    captured first (concat consumes the sources), srcs[0] is renamed to
    dst, and the rest append via one FileSystem.concat RPC
    (HadoopFileSystemWrapper.java:142-168). Returns None -> caller falls
    back to the serial copy (also the reference's fallback)."""
    scheme = _dfs.split_scheme(dst)[0]
    if scheme not in HADOOP_CONCAT_SCHEMES and not os.environ.get(
        "DISQ_SPARK_FORCE_HADOOP_CONCAT"
    ):
        return None
    try:
        lengths = [_dfs.getsize(s) for s in srcs]
        rest = _dfs.try_hadoop_concat(dst, srcs)
        return lengths if rest is not None else None
    except Exception:
        return None


def concat_parts(dst: str, srcs: list[str], buf_size: int = 8 * 1024 * 1024) -> list[int]:
    """Concatenate ``srcs`` into ``dst`` in order; returns part lengths
    (needed by the index mergers for virtual-offset shifting)."""
    lengths = _hadoop_concat(dst, srcs)
    if lengths is not None:
        return lengths
    lengths = []
    with _dfs.open_output(dst) as out:
        for src in srcs:
            lengths.append(_dfs.getsize(src))
            with _dfs.open_input(src) as f:
                shutil.copyfileobj(f, out, buf_size)
    return lengths


def cleanup(parts_dir: str) -> None:
    _dfs.rmtree(parts_dir)


def prepare_overwrite(path: str, index_exts: tuple[str, ...] = ()) -> None:
    """Delete a pre-existing output (file or shard directory) and any
    stale index sidecars BEFORE writing (AnySamSinkMultiple.java:74-78
    semantics). Stale sidecars are the dangerous case: a leftover .sbi/
    .bai next to a rewritten file silently mis-plans every later read."""
    if _dfs.isdir(path):
        _dfs.rmtree(path)
    elif _dfs.exists(path):
        _dfs.remove(path)
    for ext in index_exts:
        if _dfs.exists(path + ext):
            _dfs.remove(path + ext)


def write_order_sidecar(parts_dir: str, part_base: str, meta: dict) -> None:
    """Persist per-part ordering metadata (first/last coordinate keys,
    contig sequence, unplaced flag) next to the part's hidden index
    fragment, for the driver-side cross-part order validation."""
    import json

    with _dfs.open_output(os.path.join(parts_dir, f".{part_base}.order")) as f:
        f.write(json.dumps(meta).encode("utf-8"))


def read_order_sidecar(parts_dir: str, part_base: str) -> dict | None:
    """Counterpart of write_order_sidecar; None when absent (older
    fragments carry nothing to prove)."""
    import json

    path = os.path.join(parts_dir, f".{part_base}.order")
    if not _dfs.exists(path):
        return None
    with _dfs.open_input(path) as f:
        return json.loads(f.read().decode("utf-8"))
