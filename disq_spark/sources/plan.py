"""Driver-side partition planning shared by the binary/text sources.

The reference plans splits with Spark jobs over ``PathSplit``/``BgzfBlock``
RDDs (PathSplitSource.java:68-113, BgzfBlockSource.java:59-74). We plan
driver-side (pure metadata: file lengths + optional indexes) and ship the
plan as a tiny DataFrame of byte ranges — one Spark job total, and the
planner itself costs milliseconds even for thousands of files.

At 100 TB the plan is ~#files x (size/split) rows of (path, start, end)
— a few million rows at most, trivially broadcastable; decode parallelism
then scales with the cluster, not the driver.
"""

from __future__ import annotations

from disq_spark import fs as _dfs

import glob
import os
from dataclasses import dataclass

DEFAULT_SPLIT_SIZE = 128 * 1024 * 1024  # PathSplitSource.java:47 default


@dataclass(frozen=True)
class PathRange:
    path: str
    start: int
    end: int


def resolve_paths(path: str, extensions: tuple[str, ...]) -> list[str]:
    """A path may be one file, a glob, or a (non-recursive) directory of
    same-format files (README.md:85-95). Hidden/_ files are skipped
    (HiddenFileFilter.java:26-37 semantics). Sorted lexicographically
    (HadoopFileSystemWrapper.java:122-139)."""
    if _dfs.isdir(path):
        names = [
            p
            for p in _dfs.listdir(path)
            if not os.path.basename(p).startswith((".", "_")) and p.endswith(extensions)
        ]
        if not names:
            raise FileNotFoundError(f"no {extensions} files in directory {path}")
        return sorted(names)
    if any(ch in path for ch in "*?["):
        from disq_spark.fs import split_scheme

        if split_scheme(path)[0] in ("", "file"):
            names = [
                p for p in glob.glob(path) if not os.path.basename(p).startswith((".", "_"))
            ]
            return sorted(names)
        # non-local scheme: list the parent through the fs registry and
        # fnmatch the basename (one-level globs — the common segment
        # pattern; deep ** globs need backend-native listing)
        import fnmatch

        parent, pattern = path.rsplit("/", 1)
        names = [
            p
            for p in _dfs.listdir(parent)
            if fnmatch.fnmatch(os.path.basename(p), pattern)
            and not os.path.basename(p).startswith((".", "_"))
        ]
        return sorted(names)
    return [path]


def plan_ranges(paths: list[str], split_size: int = DEFAULT_SPLIT_SIZE) -> list[PathRange]:
    out = []
    for p in paths:
        size = _dfs.getsize(p)
        if size == 0:
            continue
        start = 0
        while start < size:
            out.append(PathRange(p, start, min(start + split_size, size)))
            start += split_size
    return out
