"""Tabix (.tbi) index reader/writer/merger.

Reading drives VCF split-level partition pruning; writing happens
distributed during single-file BGZF VCF output (per-part index built
while encoding, then merged with virtual-offset shifting — the
HeaderlessVcfOutputFormat.java:68-88 build + TbiMerger.java:39-65 merge
pattern).

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

from disq_spark import fs


#: tabix metadata pseudo-bin id (one past the largest real bin, 37448)
PSEUDO_BIN = 37450


@dataclass
class TabixIndex:
    names: list[str]
    # per ref: {bin: [(cnk_beg_voff, cnk_end_voff), ...]}; dict insertion
    # order = first-record order (feeds the khash-compatible bin layout)
    bins: list[dict[int, list[tuple[int, int]]]]
    # per ref: linear index of 16kb-window start virtual offsets
    linear: list[list[int]]
    # per ref: (beg_voff, end_voff, n_mapped, n_unmapped) metadata
    # pseudo-bin payload, or None when unknown (legacy indexes)
    stats: list[tuple[int, int, int, int] | None] | None = None
    n_no_coor: int = 0

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


def read_tbi(path: str, fragment: bool = False) -> TabixIndex:
    import os

    data = bgzf.read_range(path, 0, fs.getsize(path))
    if data[:4] != b"TBI\x01":
        raise ValueError("not a tabix index")
    n_ref = struct.unpack_from("<i", data, 4)[0]
    l_nm = struct.unpack_from("<i", data, 32)[0]
    names = data[36 : 36 + l_nm].rstrip(b"\x00").split(b"\x00")
    names = [n.decode("utf-8") for n in names]
    off = 36 + l_nm
    bins_all = []
    linear_all = []
    stats_all: list[tuple[int, int, int, int] | None] = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", data, off)[0]
        off += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        stats: tuple[int, int, int, int] | None = None
        for _ in range(n_bin):
            b = struct.unpack_from("<I", data, off)[0]
            n_chunk = struct.unpack_from("<i", data, off + 4)[0]
            off += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", data, off)
                chunks.append((cb, ce))
                off += 16
            if b == PSEUDO_BIN and len(chunks) == 2:
                # metadata pseudo-bin: (beg,end) voffs + (n_mapped, n_unmapped)
                stats = (chunks[0][0], chunks[0][1], chunks[1][0], chunks[1][1])
            else:
                bins[b] = chunks
        n_intv = struct.unpack_from("<i", data, off)[0]
        off += 4
        linear = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        if fragment:
            linear = [v - 1 if v > 0 else -1 for v in linear]
        off += 8 * n_intv
        bins_all.append(bins)
        linear_all.append(linear)
        stats_all.append(stats)
    n_no_coor = struct.unpack_from("<Q", data, off)[0] if off + 8 <= len(data) else 0
    return TabixIndex(names, bins_all, linear_all, stats_all, n_no_coor)


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
    min_voff = max(lin[min(beg0 >> 14, len(lin) - 1)], 0) if lin else 0
    for b in _reg2bins(beg0, end0):
        for cb, ce in ref_bins.get(b, ()):
            if ce > min_voff:
                out.append((cb, ce))
    out.sort()
    return out


class TbiBuilder:
    """Incremental per-part tabix index builder (VCF preset).

    ``add`` is called once per record in file order with part-relative
    virtual offsets; contigs register in order of first appearance.
    """

    def __init__(self) -> None:
        self.names: list[str] = []
        self._rid: dict[str, int] = {}
        self.bins: list[dict[int, list[tuple[int, int]]]] = []
        self.linear: list[list[int]] = []
        self.stats: list[tuple[int, int, int, int] | None] = []
        self._last: tuple[int, int] | None = None  # (rid, start1)

    def add(self, contig: str, start1: int, end1: int, v_start: int, v_end: int) -> None:
        rid = self._rid.get(contig)
        # tabix semantics require coordinate-sorted input; indexing
        # unsorted records would SILENTLY produce an index whose linear/
        # bin structure prunes regions that do contain data (htsjdk's
        # TabixIndexCreator throws "features out of order" here too)
        if self._last is not None:
            lrid, lstart = self._last
            if rid == lrid and start1 < lstart:
                raise ValueError(
                    f"tabix build requires coordinate-sorted input: "
                    f"{contig}:{start1} after {contig}:{lstart}"
                )
            if rid is not None and rid != lrid:
                raise ValueError(
                    f"tabix build requires contig-grouped input: {contig} "
                    f"reappears after {self.names[lrid]}"
                )
        if rid is None:
            rid = len(self.names)
            self._rid[contig] = rid
            self.names.append(contig)
            self.bins.append({})
            self.linear.append([])
            self.stats.append(None)
        st = self.stats[rid]
        self.stats[rid] = (
            (v_start, v_end, 1, 0)
            if st is None
            else (min(st[0], v_start), max(st[1], v_end), st[2] + 1, st[3])
        )
        beg0, end0 = start1 - 1, max(end1, start1)
        b = _reg2bin(beg0, end0)
        chunks = self.bins[rid].setdefault(b, [])
        if chunks and v_start <= chunks[-1][1]:
            chunks[-1] = (chunks[-1][0], max(chunks[-1][1], v_end))
        else:
            chunks.append((v_start, v_end))
        lin = self.linear[rid]
        w_beg, w_end = beg0 >> 14, (end0 - 1) >> 14
        if len(lin) <= w_end:
            lin.extend([-1] * (w_end + 1 - len(lin)))  # -1 = unset
        for w in range(w_beg, w_end + 1):
            if lin[w] < 0 or v_start < lin[w]:
                lin[w] = v_start
        self._last = (rid, start1)

    def build(self) -> TabixIndex:
        # -1 = uncovered window (in-memory convention; see bai.RefIndex)
        return TabixIndex(list(self.names), self.bins, self.linear, list(self.stats))


def _reg2bin(beg: int, end: int) -> int:
    """Single bin fully containing 0-based half-open [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return 4681 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return 585 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return 73 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return 9 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return 1 + (beg >> 26)
    return 0


def _khash_layout_order(keys: list[int]) -> list[int]:
    """Bucket-iteration order of htslib's ``khash`` (int keys) after
    inserting ``keys`` in order — the order the C ``tabix`` tool emits
    bins in. Replicates khash.h exactly: hash(k)=k, quadratic probing
    ``i = (i + ++step) & mask``, growth to the next power of two (min 4)
    at load factor 0.77, and the in-place kick-out rehash that walks old
    buckets in slot order. Verified byte-for-byte against the
    tabix-built ``HiSeq.10000.vcf.bgz.tbi`` reference fixture."""
    n_buckets = 0
    ks: list[int] = []
    flags: list[int] = []  # 0=empty, 1=occupied, 2=vacated-during-rehash
    size = 0

    def resize(req: int) -> None:
        nonlocal n_buckets, ks, flags
        new_n = max(req - 1, 1)
        for s in (1, 2, 4, 8, 16):
            new_n |= new_n >> s
        new_n += 1
        if new_n < 4:
            new_n = 4
        if size >= int(new_n * 0.77 + 0.5):
            return
        mask = new_n - 1
        new_flags = [0] * new_n
        if new_n > n_buckets:
            ks.extend([0] * (new_n - n_buckets))
        old_n = n_buckets
        for j in range(old_n):
            if flags[j] != 1:
                continue
            key = ks[j]
            flags[j] = 2
            while True:  # kick-out chain
                i = key & mask
                step = 0
                while new_flags[i] == 1:
                    step += 1
                    i = (i + step) & mask
                new_flags[i] = 1
                if i < old_n and flags[i] == 1:
                    ks[i], key = key, ks[i]
                    flags[i] = 2
                else:
                    ks[i] = key
                    break
        flags[:] = new_flags
        n_buckets = new_n

    for key in keys:
        if size >= int(n_buckets * 0.77 + 0.5):
            resize(n_buckets + 1)
        mask = n_buckets - 1
        i = key & mask
        step = 0
        while flags[i] == 1 and ks[i] != key:
            step += 1
            i = (i + step) & mask
        if flags[i] != 1:
            ks[i] = key
            flags[i] = 1
            size += 1
    return [ks[i] for i in range(n_buckets) if flags[i] == 1]


def write_tbi(path: str, idx: TabixIndex, fragment: bool = False) -> None:
    """Serialize with the VCF preset header (format=2, seq/beg cols 1/2,
    end=0 i.e. derived, meta '#', skip 0); body BGZF-compressed.

    Final indexes replicate the C ``tabix`` tool byte-for-byte (asserted
    vs the htsjdk-shipped fixture in tests/test_tabix.py): bins emit in
    khash bucket order with the metadata pseudo-bin inserted last,
    uncovered linear windows fill forward from the previous window
    (hts_idx_finish convention), and the trailing u64 records the
    no-coordinate count.

    ``fragment=True`` = hidden per-part intermediate: linear stored
    biased (v+1, 0 = absent) because part-relative voff 0 is a real
    offset, and absent windows stay absent for the merge's min logic."""
    body = bytearray()
    body += b"TBI\x01"
    names_blob = b"".join(n.encode("utf-8") + b"\x00" for n in idx.names)
    body += struct.pack(
        "<7i", len(idx.names), 2, 1, 2, 0, ord("#"), 0
    )
    body += struct.pack("<i", len(names_blob))
    body += names_blob
    for rid in range(len(idx.names)):
        rbins = dict(idx.bins[rid])
        st = idx.stats[rid] if idx.stats else None
        if st is not None:
            # pseudo-bin registers last (tabix adds it at ref finish)
            rbins[PSEUDO_BIN] = [(st[0], st[1]), (st[2], st[3])]
        order = (
            sorted(rbins)
            if fragment
            else _khash_layout_order(list(rbins))
        )
        body += struct.pack("<i", len(order))
        for b in order:
            chunks = rbins[b]
            body += struct.pack("<Ii", b, len(chunks))
            for cb, ce in chunks:
                body += struct.pack("<QQ", cb, ce)
        if fragment:
            lin = [v + 1 if v >= 0 else 0 for v in idx.linear[rid]]
        else:
            lin = []
            for v in idx.linear[rid]:
                lin.append(v if v >= 0 else (lin[-1] if lin else 0))
        body += struct.pack("<i", len(lin))
        if lin:
            body += struct.pack(f"<{len(lin)}Q", *lin)
    body += struct.pack("<Q", idx.n_no_coor)
    with fs.open_output(path) as f:
        f.write(bgzf.compress_all(bytes(body), terminate=True))


def _shift(voff: int, shift_bytes: int) -> int:
    return ((voff >> 16) + shift_bytes) << 16 | (voff & 0xFFFF)


def merge_tbi(parts: list[TabixIndex], part_lengths: list[int], base_offset: int = 0) -> TabixIndex:
    """Merge per-part indexes of concatenated parts, shifting virtual
    offsets by the cumulative compressed length of preceding bytes
    (TbiMerger.java:39-65 / htsjdk TabixIndexMerger semantics). Contig
    order = first appearance across parts in part order (legal for
    sorted VCF, where it equals header contig order)."""
    out = TbiBuilder()
    shift = base_offset
    n_no_coor = 0
    for idx, plen in zip(parts, part_lengths):
        n_no_coor += idx.n_no_coor
        for rid, name in enumerate(idx.names):
            orid = out._rid.get(name)
            if orid is None:
                orid = len(out.names)
                out._rid[name] = orid
                out.names.append(name)
                out.bins.append({})
                out.linear.append([])
                out.stats.append(None)
            pst = idx.stats[rid] if idx.stats else None
            if pst is not None:
                sb, se = _shift(pst[0], shift), _shift(pst[1], shift)
                ost = out.stats[orid]
                out.stats[orid] = (
                    (sb, se, pst[2], pst[3])
                    if ost is None
                    else (
                        min(ost[0], sb),
                        max(ost[1], se),
                        ost[2] + pst[2],
                        ost[3] + pst[3],
                    )
                )
            for b, chunks in idx.bins[rid].items():
                dst = out.bins[orid].setdefault(b, [])
                for cb, ce in chunks:
                    cb, ce = _shift(cb, shift), _shift(ce, shift)
                    if dst and cb <= dst[-1][1]:
                        dst[-1] = (dst[-1][0], max(dst[-1][1], ce))
                    else:
                        dst.append((cb, ce))
            lin, olin = idx.linear[rid], out.linear[orid]
            if len(olin) < len(lin):
                olin.extend([-1] * (len(lin) - len(olin)))
            for w, vo in enumerate(lin):
                if vo < 0:  # window not covered by this part
                    continue
                vo = _shift(vo, shift)
                if olin[w] < 0 or vo < olin[w]:
                    olin[w] = vo
        shift += plen
    merged = out.build()
    merged.n_no_coor = n_no_coor
    return merged


def patch_dangling_end(idx: TabixIndex, dangling_voff: int, safe_voff: int) -> None:
    """Same concat-correctness patch as bai.patch_dangling_end."""
    for rbins in idx.bins:
        for chunks in rbins.values():
            for i, (cb, ce) in enumerate(chunks):
                if ce == dangling_voff:
                    chunks[i] = (cb, safe_voff)
    if idx.stats:
        for rid, st in enumerate(idx.stats):
            if st is not None and st[1] == dangling_voff:
                idx.stats[rid] = (st[0], safe_voff, st[2], st[3])


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
