"""Versioned, atomically-published on-disk caches for gate fixtures.

Gate queries re-encode fixtures (an indexed BAM, a parquet stream
source) and cache the artifact across runs. Two failure modes this
module closes:

- **stale code**: a cache keyed only on the *source* fixture's identity
  survives a code change, so a gate can pass against bytes written by a
  previous (possibly buggy) build. ``package_fingerprint()`` hashes the
  installed ``disq_spark`` source files and is mixed into every cache
  key, so any code change invalidates all cached artifacts.
- **torn / racing writes**: two gate processes building the same path
  concurrently can interleave partial files. ``ensure_cached_dir``
  builds into a process-unique sibling directory and publishes it with
  one atomic ``os.rename``; the loser of a race discards its build and
  uses the winner's.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable

_MARKER = "_DISQ_CACHE_OK"
_pkg_fp: str | None = None


def package_fingerprint() -> str:
    """Hash of every ``disq_spark/*.py`` source file (cached per process).

    Coarse on purpose: a cache rebuild on unrelated code changes costs a
    few seconds; a cache that survives a writer-code change silently
    defeats the round-trip check the gate advertises."""
    global _pkg_fp
    if _pkg_fp is None:
        root = os.path.dirname(os.path.abspath(__file__))
        h = hashlib.md5()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _pkg_fp = h.hexdigest()[:12]
    return _pkg_fp


def cache_key(*parts: object) -> str:
    """Stable cache key over ``parts`` + the package code fingerprint."""
    raw = ":".join(str(p) for p in parts) + ":" + package_fingerprint()
    return hashlib.md5(raw.encode()).hexdigest()[:12]


def gate_scratch_dir(name: str) -> str:
    """Per-process scratch directory for WRITE-path gates (the ones that
    must re-run their write every invocation, unlike ensure_cached_dir's
    build-once artifacts).

    The gate's returned DataFrame is lazy — the driver collects it after
    the gate function returns — so the scratch files must outlive the
    function; cleanup happens at interpreter exit instead. Dirs are
    pid-suffixed (concurrent gate processes never collide) and leftovers
    from dead processes (kill -9) are swept on the next call, so disk
    use is bounded at one scratch set per LIVE process rather than
    accumulating one per historical run."""
    import atexit
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "disq_gate_scratch")
    os.makedirs(root, exist_ok=True)
    for d in os.listdir(root):
        pid_s = d.rsplit(".", 1)[-1]
        if pid_s.isdigit() and int(pid_s) != os.getpid():
            try:
                os.kill(int(pid_s), 0)
            except ProcessLookupError:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            except PermissionError:
                pass
    path = os.path.join(root, f"{name}.{os.getpid()}")
    # same gate re-run within one process (or a pid-reuse leftover):
    # start clean; duplicate atexit registrations are harmless no-ops
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def ensure_cached_dir(final_dir: str, build: Callable[[str], None]) -> str:
    """Return ``final_dir``, building it via ``build(tmp_dir)`` if absent.

    The build populates a process-unique temp sibling; a marker file is
    written last and the directory is published with an atomic rename.
    Concurrent builders race harmlessly: exactly one rename wins, losers
    delete their temp build and read the published copy."""
    marker = os.path.join(final_dir, _MARKER)
    if os.path.exists(marker):
        return final_dir
    tmp = f"{final_dir}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        build(tmp)
        with open(os.path.join(tmp, _MARKER), "w"):
            pass
        try:
            os.rename(tmp, final_dir)
        except OSError:
            if not os.path.exists(marker):  # lost no race — real failure
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final_dir
