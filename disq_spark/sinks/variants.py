"""VCF sinks: single-file (plain or BGZF) and sharded.

Re-expresses VcfSink.java:52-131 / VcfSinkMultiple.java:38-72:
- single-file: executors write headerless, terminatorless part files
  (BGZF-compressed when the target is .bgz/.gz — VcfSink.java:66), the
  driver writes the (compressed) header, concatenates in part order and
  appends the BGZF terminator once (VcfSink.java:87-103).
- sharded: one complete VCF (header + records + terminator) per
  partition, directory output (the natural Spark mode).

Format/cardinality dispatch follows VcfFormat.fromPath semantics
(VcfFormat.java:82-93): a path with a VCF extension -> SINGLE, else a
directory of shards.
"""

from __future__ import annotations

import io

from disq_spark import fs as _dfs

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from disq_spark.formats import bgzf
from disq_spark.formats.vcf import format_vcf_batch
from disq_spark.headers import VcfHeader
from disq_spark.sinks import merge


def _is_bgzf_target(path: str) -> bool:
    return path.endswith((".gz", ".bgz"))


def write_vcf(
    df: DataFrame,
    header: VcfHeader,
    path: str,
    single_file: bool | None = None,
    write_tbi: bool = False,
) -> None:
    """Write a variants DataFrame as VCF.

    ``single_file=None`` infers: VCF extension -> single file, else
    sharded directory (VcfFormat.java:91-93). ``write_tbi`` builds a
    tabix index during the distributed write and merges the per-part
    fragments with virtual-offset shifting (HeaderlessVcfOutputFormat
    .java:68-88 + TbiMerger.java:39-65); requires a BGZF target and
    coordinate-sorted input.
    """
    if single_file is None:
        single_file = path.endswith((".vcf", ".vcf.gz", ".vcf.bgz"))
    if write_tbi and not (_is_bgzf_target(path) and single_file):
        raise ValueError("write_tbi requires a single-file BGZF target")
    if single_file:
        # pre-existing target is deleted in finalize_single AFTER the
        # cross-part order validation passes
        _write_single(df, header, path, write_tbi)
    else:
        merge.prepare_overwrite(path, (".tbi",))
        _write_sharded(df, header, path)


def encode_vcf_part(
    batches: Iterator[pd.DataFrame],
    part_path: str,
    samples: list[str],
    compress: bool,
    with_tbi: bool,
) -> int:
    """Write one headerless (optionally terminatorless-BGZF) VCF part,
    plus a hidden .tbi fragment when indexing; returns the record count.
    Task-side core shared by the mapInPandas sink and the format("vcf")
    DataSource writer."""
    from disq_spark.formats import tabix as tbimod

    parts_dir = os.path.dirname(part_path)
    n = 0
    tmp = part_path + ".tmp"
    tbi = tbimod.TbiBuilder() if with_tbi else None
    dangling = 0
    # first/last (contig, pos) of the part: the builder guard proves
    # within-part order, the driver merge uses these to prove it across
    # parts (see _check_cross_part_order)
    first_key = None
    last_key = None
    with _dfs.open_output(tmp) as f:
        sink = bgzf.BgzfWriter(f, terminate=False) if compress else f
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lines = format_vcf_batch(pdf, samples)
            if tbi is None:
                payload = ("\n".join(lines) + "\n").encode("utf-8")
                sink.write(payload)
            else:
                # per-record virtual-offset tracking for the index
                for line, contig, start, end in zip(
                    lines, pdf["contig"], pdf["start"], pdf["end"]
                ):
                    v_start = sink.virtual_offset
                    sink.write(line.encode("utf-8") + b"\n")
                    tbi.add(contig, int(start), int(end), v_start, sink.virtual_offset)
                    last_key = (contig, int(start))
                    if first_key is None:
                        first_key = last_key
            n += len(pdf)
        if compress:
            dangling = sink.virtual_offset
            sink.close()
    if n > 0:
        _dfs.rename(tmp, part_path)
        if tbi is not None:
            built = tbi.build()
            if dangling & 0xFFFF:
                tbimod.patch_dangling_end(built, dangling, sink.compressed_len << 16)
            base = os.path.basename(part_path)
            tbimod.write_tbi(
                os.path.join(parts_dir, f".{base}.tbi"), built, fragment=True
            )
            # contigs = the part's FULL contig sequence in order (the
            # builder registers them by first appearance) — first/last
            # alone would hide interior contigs from the cross-part check
            merge.write_order_sidecar(
                parts_dir,
                base,
                {"first": first_key, "last": last_key, "contigs": built.names},
            )
    else:
        _dfs.remove(tmp)
    return n


def finalize_single(
    path: str,
    parts_dir: str,
    header: VcfHeader,
    part_paths: list[str],
    compress: bool,
    with_tbi: bool,
) -> None:
    """Driver-side single-file commit: header file + concat in part order
    + one BGZF terminator + offset-shifted .tbi merge (VcfSink.java:87-127).

    Order validation runs BEFORE any target byte is written; a failure
    removes ONLY outputs this invocation created, so a validation
    rejection of an overwrite leaves the pre-existing target intact."""
    from disq_spark.formats import tabix as tbimod

    created: list[str] = []
    try:
        if with_tbi:
            _check_cross_part_order(parts_dir, part_paths)
        # validation passed: NOW clear a pre-existing target + stale index
        merge.prepare_overwrite(path, (".tbi",))
        header_path = os.path.join(parts_dir, "_header")
        header_bytes = header.text.encode("utf-8")
        with _dfs.open_output(header_path) as f:
            f.write(bgzf.compress_all(header_bytes, terminate=False) if compress else header_bytes)

        created.append(path)
        lengths = merge.concat_parts(path, [header_path] + part_paths)
        if compress:
            with _dfs.open_append(path) as f:
                f.write(bgzf.EOF_BLOCK)
        if with_tbi:
            part_idx = [
                tbimod.read_tbi(os.path.join(parts_dir, "." + os.path.basename(pp) + ".tbi"), fragment=True)
                for pp in part_paths
            ]
            merged = tbimod.merge_tbi(part_idx, lengths[1:], base_offset=lengths[0])
            created.append(path + ".tbi")
            tbimod.write_tbi(path + ".tbi", merged)
    except Exception:
        for leftover in created:
            if _dfs.exists(leftover):
                _dfs.remove(leftover)
        merge.cleanup(parts_dir)
        raise
    merge.cleanup(parts_dir)


def _check_cross_part_order(parts_dir: str, part_paths: list[str]) -> None:
    """Prove coordinate order ACROSS parts before the .tbi merge (the
    per-part builder guard only proves within-part order). Each part's
    sidecar carries its FULL ordered contig sequence: a part's first
    contig must either continue the previous part's last contig at an
    equal-or-later position or be brand new, and every other contig in
    the sequence must be brand new (any contig finished in an earlier
    part — including interior ones — reappearing means the concatenation
    interleaves contigs)."""
    done: set[str] = set()
    cur: str | None = None
    cur_last = -1
    prev_part = None
    for pp in part_paths:
        base = os.path.basename(pp)
        meta = merge.read_order_sidecar(parts_dir, base)
        if meta is None:
            # encode_vcf_part writes the .tbi fragment and the sidecar
            # together; a finalize-set part without one is unverifiable
            raise ValueError(
                f".tbi merge: part {base} has no .order sidecar — "
                "refusing to merge an unverifiable part"
            )
        first, last = meta.get("first"), meta.get("last")
        if first is None:
            continue
        fc, fp = first
        lc, lp = last
        contigs = meta.get("contigs") or ([fc] if fc == lc else [fc, lc])
        for i, c in enumerate(contigs):
            if i == 0 and cur is not None and c == cur:
                if fp < cur_last:
                    raise ValueError(
                        f".tbi merge requires globally coordinate-sorted "
                        f"parts: {base} starts at {fc}:{fp} before "
                        f"{prev_part} ended at {cur}:{cur_last}"
                    )
                continue  # legal continuation of the open contig
            if c in done or c == cur:
                raise ValueError(
                    f".tbi merge requires contig-grouped parts: {c} in "
                    f"{base} reappears after an earlier part"
                )
        # everything before this part's last contig is now finished
        if cur is not None and cur != contigs[0]:
            done.add(cur)
        done.update(contigs[:-1])
        cur, cur_last, prev_part = lc, lp, base


def _write_single(df: DataFrame, header: VcfHeader, path: str, with_tbi: bool = False) -> None:
    parts_dir = path + ".parts"  # temp-parts convention (HtsjdkReadsRddStorage.java:224-229)
    _dfs.makedirs(parts_dir)
    compress = _is_bgzf_target(path)
    samples = header.samples

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        part_path = merge.attempt_part_path(parts_dir)
        n = encode_vcf_part(batches, part_path, samples, compress, with_tbi)
        yield pd.DataFrame({"part": [part_path if n else ""], "n": [n]})

    rows = df.mapInPandas(write_partition, "part string, n long").collect()
    finalize_single(path, parts_dir, header, merge.collected_parts(rows), compress, with_tbi)


def _write_sharded(df: DataFrame, header: VcfHeader, path: str) -> None:
    _dfs.makedirs(path)
    samples = header.samples
    header_text = header.text
    ext = ".vcf"

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part_path = os.path.join(path, f"part-{pid:05d}{ext}")
        # attempt-unique stage + rename publish (speculation-safe)
        tmp = merge.attempt_part_path(path, suffix=ext + ".tmp")
        n = 0
        with io.TextIOWrapper(_dfs.open_output(tmp), encoding="utf-8") as f:
            f.write(header_text)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for line in format_vcf_batch(pdf, samples):
                    f.write(line)
                    f.write("\n")
                n += len(pdf)
        _dfs.rename(tmp, part_path)
        yield pd.DataFrame({"part": [part_path], "n": [n]})

    df.mapInPandas(write_partition, "part string, n long").collect()
