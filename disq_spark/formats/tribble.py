"""Tribble binary index (.idx) — the htsjdk index family the reference
loads for plain-VCF interval queries (VcfSource.java:177-201 via
IndexFactory.loadIndex; written by GATK/IGVTools for uncompressed VCFs
where tabix requires BGZF).

Layout (verified byte-exact against the reference's GATK-written
fixture CEUTrio.20.21.gatk3.4.g.vcf.idx — 0 trailing bytes):

  magic:int32 'TIDX' (0x58444954 LE), type:int32 (1=linear,
  2=interval tree), version:int32, indexed_file:cstr, file_size:int64,
  timestamp:int64, md5:cstr, flags:int32, n_properties:int32,
  {key:cstr value:cstr}*, n_chromosomes:int32, then per chromosome:
    name:cstr, n_nodes:int32,
    {start:int32, end:int32, block_pos:int64, block_size:int32}*

Only the interval-tree type (2) is implemented — it is what current
htsjdk writes and what the fixture contains; the legacy linear type (1)
raises with a clear message rather than shipping an unverified parse.
Node order on disk is tree order; pruning only needs a flat overlap
scan, so the tree is not reconstructed.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from disq_spark import fs

MAGIC = 0x58444954  # 'TIDX' little-endian
TYPE_LINEAR = 1
TYPE_INTERVAL_TREE = 2
VERSION = 3


@dataclass
class TribbleIndex:
    indexed_file: str
    file_size: int
    timestamp: int
    properties: dict[str, str] = field(default_factory=dict)
    # chrom -> [(start, end, block_pos, block_size)], 1-based closed spans
    chroms: dict[str, list[tuple[int, int, int, int]]] = field(default_factory=dict)

    def blocks_for_interval(self, contig: str, start: int, end: int) -> list[tuple[int, int]]:
        """Byte ranges [block_pos, block_pos+block_size) of nodes whose
        feature span overlaps [start, end] (1-based closed)."""
        out = []
        for n_start, n_end, b_pos, b_size in self.chroms.get(contig, ()):
            if n_start <= end and n_end >= start:
                out.append((b_pos, b_pos + b_size))
        return out


def _read_cstr(data: bytes, off: int) -> tuple[str, int]:
    end = data.index(0, off)
    return data[off:end].decode("utf-8"), end + 1


def read_tribble(path: str) -> TribbleIndex:
    with fs.open_input(path) as f:
        data = f.read()
    magic, typ, version = struct.unpack_from("<iii", data, 0)
    if magic != MAGIC:
        raise ValueError(f"not a tribble index (magic {magic:#x})")
    if typ == TYPE_LINEAR:
        raise NotImplementedError(
            "legacy tribble LINEAR index (type 1) is not supported; "
            "regenerate the index with a current htsjdk/GATK (interval tree)"
        )
    if typ != TYPE_INTERVAL_TREE:
        raise ValueError(f"unknown tribble index type {typ}")
    off = 12
    indexed_file, off = _read_cstr(data, off)
    file_size, timestamp = struct.unpack_from("<qq", data, off)
    off += 16
    _md5, off = _read_cstr(data, off)
    _flags, nprops = struct.unpack_from("<ii", data, off)
    off += 8
    props: dict[str, str] = {}
    for _ in range(nprops):
        k, off = _read_cstr(data, off)
        v, off = _read_cstr(data, off)
        props[k] = v
    (nchrom,) = struct.unpack_from("<i", data, off)
    off += 4
    chroms: dict[str, list[tuple[int, int, int, int]]] = {}
    for _ in range(nchrom):
        name, off = _read_cstr(data, off)
        (n,) = struct.unpack_from("<i", data, off)
        off += 4
        nodes = []
        for _ in range(n):
            s, e = struct.unpack_from("<ii", data, off)
            off += 8
            (bpos,) = struct.unpack_from("<q", data, off)
            off += 8
            (bsize,) = struct.unpack_from("<i", data, off)
            off += 4
            nodes.append((s, e, bpos, bsize))
        chroms[name] = nodes
    return TribbleIndex(indexed_file, file_size, timestamp, props, chroms)


def write_tribble(path: str, index: TribbleIndex) -> None:
    """Serialize in the same layout read_tribble parses (round-trip
    tested); enough to index our own plain-VCF outputs for pruning."""
    out = bytearray()
    out += struct.pack("<iii", MAGIC, TYPE_INTERVAL_TREE, VERSION)
    out += index.indexed_file.encode("utf-8") + b"\x00"
    out += struct.pack("<qq", index.file_size, index.timestamp)
    out += b"\x00"  # md5 (empty)
    out += struct.pack("<ii", 0, len(index.properties))
    for k, v in index.properties.items():
        out += k.encode("utf-8") + b"\x00" + v.encode("utf-8") + b"\x00"
    out += struct.pack("<i", len(index.chroms))
    for name, nodes in index.chroms.items():
        out += name.encode("utf-8") + b"\x00"
        out += struct.pack("<i", len(nodes))
        for s, e, bpos, bsize in nodes:
            out += struct.pack("<ii", s, e) + struct.pack("<q", bpos) + struct.pack("<i", bsize)
    with fs.open_output(path) as f:
        f.write(bytes(out))


def build_tribble_from_vcf(vcf_path: str, features_per_node: int = 64) -> TribbleIndex:
    """Index a plain-text VCF: group consecutive records per contig into
    nodes of ``features_per_node``, node span = [min POS, max POS+reflen),
    block = covered byte range. (The writer-side analog of what GATK's
    DynamicIndexCreator does, simplified to fixed-size bins.)"""
    chroms: dict[str, list[tuple[int, int, int, int]]] = {}
    cur: list[tuple[str, int, int, int, int]] = []  # contig,start,end,b0,b1

    def flush():
        if not cur:
            return
        contig = cur[0][0]
        s = min(c[1] for c in cur)
        e = max(c[2] for c in cur)
        b0 = cur[0][3]
        b1 = cur[-1][4]
        chroms.setdefault(contig, []).append((s, e, b0, b1 - b0))
        cur.clear()

    offset = 0
    with fs.open_input(vcf_path) as f:
        for raw in f:
            ln = len(raw)
            line = raw.decode("utf-8", "replace")
            if not line.startswith("#") and line.strip():
                parts = line.split("\t", 4)
                contig, pos, _id, ref = parts[0], int(parts[1]), parts[2], parts[3]
                end = pos + max(len(ref), 1) - 1
                if cur and (cur[0][0] != contig or len(cur) >= features_per_node):
                    flush()
                cur.append((contig, pos, end, offset, offset + ln))
            offset += ln
    flush()
    return TribbleIndex(vcf_path, fs.getsize(vcf_path), 0, {}, chroms)


def split_overlaps_intervals(
    index: TribbleIndex,
    split_start: int,
    split_end: int,
    intervals: list[tuple[str, int, int]],
    virtual: bool = False,
) -> bool:
    """Keep the byte split [split_start, split_end) iff some index node
    overlapping a query interval has bytes inside it. ``virtual`` maps
    block-compressed virtual offsets to compressed positions (>>16) for
    .idx files written over BGZF data."""
    for contig, s, e in intervals:
        for b0, b1 in index.blocks_for_interval(contig, s, e):
            if virtual:
                b0, b1 = b0 >> 16, (b1 >> 16) + 1
            if b0 < split_end and b1 > split_start:
                return True
    return False
