"""Tabix (.tbi) index reader, used for VCF split-level partition pruning.

Re-expresses the reference's tribble/tabix split filtering
(TribbleIndexIntervalFilteringTextInputFormat.java:59-98 +
VcfSource.java:177-201): a byte split is kept only if some indexed chunk
for a queried interval overlaps it. This is metadata-only pruning — the
residual per-record overlap filter still applies (and alone is always
correct; pruning is purely physical).

.tbi layout (SAM/tabix spec, little-endian, BGZF-compressed):
  magic 'TBI\\x01', n_ref:i32, format:i32, col_seq:i32, col_beg:i32,
  col_end:i32, meta:i32, skip:i32, l_nm:i32, names (NUL-separated);
  per ref: n_bin:i32, then per bin {bin:u32, n_chunk:i32, chunks
  (cnk_beg:u64, cnk_end:u64)}, n_intv:i32, ioff:u64[n_intv].
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from disq_spark.formats import bgzf


@dataclass
class TabixIndex:
    names: list[str]
    # per ref: {bin: [(cnk_beg_voff, cnk_end_voff), ...]}
    bins: list[dict[int, list[tuple[int, int]]]]
    # per ref: linear index of 16kb-window start virtual offsets
    linear: list[list[int]]

    def ref_id(self, contig: str) -> int:
        try:
            return self.names.index(contig)
        except ValueError:
            return -1


def _reg2bins(beg: int, end: int) -> list[int]:
    """All bins overlapping [beg, end) — 0-based half-open (tabix binning)."""
    out = [0]
    end -= 1
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        out.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return out


def read_tbi(path: str) -> TabixIndex:
    import io
    import os

    data = bgzf.read_range(path, 0, os.path.getsize(path))
    if data[:4] != b"TBI\x01":
        raise ValueError("not a tabix index")
    n_ref = struct.unpack_from("<i", data, 4)[0]
    l_nm = struct.unpack_from("<i", data, 32)[0]
    names = data[36 : 36 + l_nm].rstrip(b"\x00").split(b"\x00")
    names = [n.decode("utf-8") for n in names]
    off = 36 + l_nm
    bins_all = []
    linear_all = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", data, off)[0]
        off += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            b = struct.unpack_from("<I", data, off)[0]
            n_chunk = struct.unpack_from("<i", data, off + 4)[0]
            off += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", data, off)
                chunks.append((cb, ce))
                off += 16
            bins[b] = chunks
        n_intv = struct.unpack_from("<i", data, off)[0]
        off += 4
        linear = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        off += 8 * n_intv
        bins_all.append(bins)
        linear_all.append(linear)
    return TabixIndex(names, bins_all, linear_all)


def chunks_for_interval(idx: TabixIndex, contig: str, start: int, end: int) -> list[tuple[int, int]]:
    """Virtual-offset chunks possibly containing records overlapping the
    1-based closed interval (contig, start, end)."""
    rid = idx.ref_id(contig)
    if rid < 0:
        return []
    beg0, end0 = start - 1, end  # to 0-based half-open
    out = []
    ref_bins = idx.bins[rid]
    # linear-index lower bound (skip chunks wholly before the window)
    lin = idx.linear[rid]
    min_voff = lin[min(beg0 >> 14, len(lin) - 1)] if lin else 0
    for b in _reg2bins(beg0, end0):
        for cb, ce in ref_bins.get(b, ()):
            if ce > min_voff:
                out.append((cb, ce))
    out.sort()
    return out


def split_overlaps_intervals(
    idx: TabixIndex,
    byte_start: int,
    byte_end: int,
    intervals: list[tuple[str, int, int]],
) -> bool:
    """True if any indexed chunk for any interval overlaps the compressed
    byte range [byte_start, byte_end) — the getSplits-time drop test
    (TribbleIndexIntervalFilteringTextInputFormat.java:59-98)."""
    lo, hi = byte_start << 16, byte_end << 16
    for contig, start, end in intervals:
        for cb, ce in chunks_for_interval(idx, contig, start, end):
            if cb < hi and ce > lo:
                return True
    return False
