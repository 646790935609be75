"""Part-file concatenation for single-file outputs.

The reference's move (Merger.java:41-63 + HadoopFileSystemWrapper
.concat:142-168): write headerless/terminatorless parts in parallel,
then concatenate header + parts + terminator in filename order. On HDFS
``FileSystem.concat`` is O(#parts) metadata-only; here (local FS /
object stores) we stream-copy, which is the reference's own fallback
path. Zero-length and hidden parts are skipped (Merger.java:48-52).

At 100 TB: single-file output is inherently a merge bottleneck — the
design keeps it optional (sharded output is the default Spark mode) and
the merge itself is sequential I/O at disk bandwidth. On HDFS the py4j
FileSystem.concat call restores O(#parts); object stores offer multipart
-upload compose, pluggable here.
"""

from __future__ import annotations

import os
import shutil


def list_parts(parts_dir: str) -> list[str]:
    names = [
        n
        for n in os.listdir(parts_dir)
        if not n.startswith((".", "_")) and os.path.getsize(os.path.join(parts_dir, n)) > 0
    ]
    return [os.path.join(parts_dir, n) for n in sorted(names)]


def concat_parts(dst: str, srcs: list[str], buf_size: int = 8 * 1024 * 1024) -> list[int]:
    """Concatenate ``srcs`` into ``dst`` in order; returns part lengths
    (needed by the index mergers for virtual-offset shifting)."""
    lengths = []
    with open(dst, "wb") as out:
        for src in srcs:
            lengths.append(os.path.getsize(src))
            with open(src, "rb") as f:
                shutil.copyfileobj(f, out, buf_size)
    return lengths


def cleanup(parts_dir: str) -> None:
    shutil.rmtree(parts_dir, ignore_errors=True)


def prepare_overwrite(path: str, index_exts: tuple[str, ...] = ()) -> None:
    """Delete a pre-existing output (file or shard directory) and any
    stale index sidecars BEFORE writing (AnySamSinkMultiple.java:74-78
    semantics). Stale sidecars are the dangerous case: a leftover .sbi/
    .bai next to a rewritten file silently mis-plans every later read."""
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.remove(path)
    for ext in index_exts:
        if os.path.exists(path + ext):
            os.remove(path + ext)
