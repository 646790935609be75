"""spark.read.format("bam") / format("vcf") — Spark 4 Python DataSources.

This is the API surface the reference exposes through
``HtsjdkReadsRddStorage.read(path)`` (HtsjdkReadsRddStorage.java:144-160)
and ``HtsjdkVariantsRddStorage.read`` (HtsjdkVariantsRddStorage.java),
re-expressed as first-class Spark sources: after
``register_datasources(spark)`` any Spark user can

    spark.read.format("bam").option("split_size", 1 << 20).load("x.bam")
    spark.read.format("vcf").load("calls.vcf.bgz")

with no disq_spark-specific reader calls. Partition planning reuses the
same driver-side machinery as ``read_bam``/``read_vcf`` (.sbi splits or
the BGZF block + record-guess heuristic, BGZF block-aligned text
ranges), so partitioning behavior is identical to the functional API.

Scale notes:
- ``partitions()`` runs once on the driver and is pure metadata (index
  reads + arithmetic) — no Spark jobs, no file scans beyond headers.
- ``read()`` streams one chunk per task through the same pure-Python
  decoders used by the mapInPandas path.
- The functional API (``read_bam``) remains the fast path when you want
  column pruning (``columns=``) or interval pushdown; the Python
  DataSource API does not yet surface those hooks to us, so this reader
  decodes full rows and lets Spark filter afterwards. Correctness is
  identical; at scale prefer ``read_bam(intervals=...)`` for index
  pruning until the DataSource filter-pushdown API stabilizes.

Write paths intentionally stay on the sink functions (single-file
outputs need a commit-time concat + index merge that the Python
DataSource writer API does not model).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_SPLIT_SIZE = 1 << 20


@dataclass
class BamChunk(InputPartition):
    path: str
    refs: list
    v_start: int
    v_end: int


class BamReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('bam') requires .load(path)")
        self.split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))

    def partitions(self) -> list[BamChunk]:
        from disq_spark.sources.bam_source import (
            BAM_EXTENSIONS,
            plan_bam_chunks,
            read_bam_header,
        )
        from disq_spark.sources.plan import resolve_paths

        parts: list[BamChunk] = []
        for p in resolve_paths(self.path, BAM_EXTENSIONS):
            _header, refs, first_voff = read_bam_header(p)
            for vs, ve in plan_bam_chunks(p, self.split_size, refs, first_voff):
                parts.append(BamChunk(p, refs, vs, ve))
        # zero-record file: still need >=1 partition for an empty scan
        return parts or [BamChunk("", [], 0, 0)]

    def read(self, part: BamChunk) -> Iterator[tuple]:
        if not part.path:
            return
        from disq_spark.sources.bam_source import decode_chunk

        rows = decode_chunk(part.path, part.refs, part.v_start, part.v_end)
        for row in rows or []:
            yield row


class BamDataSource(DataSource):
    """Splittable BAM scan (BamSource.java:70 equivalent)."""

    @classmethod
    def name(cls) -> str:
        return "bam"

    def schema(self):
        from disq_spark.schemas import READS_SCHEMA

        return READS_SCHEMA

    def reader(self, schema) -> BamReader:
        return BamReader(self.options)


@dataclass
class VcfRange(InputPartition):
    path: str
    start: int
    end: int
    kind: str  # plain | gzip | bgzf
    samples: list
    mode: str


class VcfReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('vcf') requires .load(path)")
        self.split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))
        self.mode = options.get("mode", "STRICT")

    def partitions(self) -> list[VcfRange]:
        from disq_spark.sources.plan import resolve_paths
        from disq_spark.sources.variants import (
            VCF_EXTENSIONS,
            _compression,
            plan_ranges,
            read_header,
        )

        paths = resolve_paths(self.path, VCF_EXTENSIONS)
        samples = read_header(paths[0]).samples
        parts: list[VcfRange] = []
        for p in paths:
            kind = _compression(p)
            if kind == "bgzf":
                for r in plan_ranges([p], self.split_size):
                    parts.append(
                        VcfRange(r.path, r.start, r.end, "bgzf", samples, self.mode)
                    )
            else:
                parts.append(
                    VcfRange(p, 0, os.path.getsize(p), kind, samples, self.mode)
                )
        return parts

    def read(self, part: VcfRange) -> Iterator[tuple]:
        import pandas as pd

        from disq_spark.formats.vcf import parse_vcf_lines
        from disq_spark.sources.variants import _range_lines

        if part.kind == "plain":
            with open(part.path, "rt") as f:
                lines = [ln.rstrip("\n") for ln in f if not ln.startswith("#")]
        else:
            lines = [ln for ln in _range_lines(part.path, part.start, part.end)
                     if not ln.startswith("#")]
        if not lines:
            return
        pdf = parse_vcf_lines(pd.Series(lines, dtype="object"), part.samples, part.mode)
        for row in pdf.itertuples(index=False, name=None):
            yield row


class VcfDataSource(DataSource):
    """Splittable plain/gzip/BGZF VCF scan (VcfSource.java:71 equivalent)."""

    @classmethod
    def name(cls) -> str:
        return "vcf"

    def schema(self):
        from disq_spark.schemas import VARIANTS_SCHEMA

        return VARIANTS_SCHEMA

    def reader(self, schema) -> VcfReader:
        return VcfReader(self.options)


def register_datasources(spark) -> None:
    """Register bam/vcf with a SparkSession: enables spark.read.format(...)."""
    spark.dataSource.register(BamDataSource)
    spark.dataSource.register(VcfDataSource)
