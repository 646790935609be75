"""CRAM container machinery: file-definition parse, ITF8/LTF8 varints,
container-boundary scan, .crai index read.

Re-expresses the reference's CRAM split planning (CramSource.java:82-174):
splits must snap to container boundaries, discovered either from the
.crai index (:146-160) or by walking container headers (:162-174).

Record DECODE lives in formats/cram_decode.py (pure-Python: huffman/
external/byte-array codecs + reference-based sequence reconstruction);
this module holds the container/byte-level machinery both the planner
and the decoder share.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass

from disq_spark import fs

CRAM_MAGIC = b"CRAM"
# v3 EOF container marker bytes (spec-defined sentinel; contains the
# special content-id -1 empty container)
EOF_LEN = 38


def read_itf8(data: bytes, off: int) -> tuple[int, int]:
    """CRAM ITF8 varint -> (value, next_offset)."""
    b0 = data[off]
    if b0 < 0x80:
        return b0, off + 1
    if b0 < 0xC0:
        return ((b0 & 0x7F) << 8) | data[off + 1], off + 2
    if b0 < 0xE0:
        return ((b0 & 0x3F) << 16) | (data[off + 1] << 8) | data[off + 2], off + 3
    if b0 < 0xF0:
        return (
            ((b0 & 0x1F) << 24) | (data[off + 1] << 16) | (data[off + 2] << 8) | data[off + 3],
            off + 4,
        )
    v = (
        ((b0 & 0x0F) << 28)
        | (data[off + 1] << 20)
        | (data[off + 2] << 12)
        | (data[off + 3] << 4)
        | (data[off + 4] & 0x0F)
    )
    # sign: ITF8 is a 32-bit signed int
    if v >= 1 << 31:
        v -= 1 << 32
    return v, off + 5


def read_ltf8(data: bytes, off: int) -> tuple[int, int]:
    """CRAM LTF8 varint (64-bit) -> (value, next_offset)."""
    b0 = data[off]
    n_extra = 0
    for i in range(8):
        if b0 & (0x80 >> i):
            n_extra += 1
        else:
            break
    if n_extra == 0:
        return b0, off + 1
    if n_extra < 8:
        v = b0 & ((1 << (7 - n_extra)) - 1)
    else:
        v = 0
    for i in range(n_extra):
        v = (v << 8) | data[off + 1 + i]
    return v, off + 1 + n_extra


@dataclass(frozen=True)
class CramContainer:
    offset: int  # byte offset of the container header in the file
    length: int  # compressed content length (excl. header)
    ref_id: int
    start: int
    span: int
    n_records: int
    header_len: int
    landmarks: tuple = ()  # slice-start offsets within the container data

    @property
    def end(self) -> int:
        return self.offset + self.header_len + self.length

    @property
    def is_eof(self) -> bool:
        # spec sentinel: unmapped ref, zero records, start = 4542278
        return self.ref_id == -1 and self.n_records == 0 and self.start == 4542278


def parse_file_definition(data: bytes) -> tuple[int, int, int]:
    """(major, minor, first_container_offset)."""
    if data[:4] != CRAM_MAGIC:
        raise ValueError("not a CRAM file (bad magic)")
    return data[4], data[5], 26


def parse_container_header(data: bytes, off: int, major: int) -> CramContainer:
    length = struct.unpack_from("<i", data, off)[0]
    p = off + 4
    ref_id, p = read_itf8(data, p)
    start, p = read_itf8(data, p)
    span, p = read_itf8(data, p)
    n_records, p = read_itf8(data, p)
    if major >= 3:
        _counter, p = read_ltf8(data, p)
    elif major == 2:
        _counter, p = read_itf8(data, p)
    _bases, p = read_ltf8(data, p)
    _n_blocks, p = read_itf8(data, p)
    n_landmarks, p = read_itf8(data, p)
    landmarks = []
    for _ in range(n_landmarks):
        lm, p = read_itf8(data, p)
        landmarks.append(lm)
    if major >= 3:
        p += 4  # crc32
    return CramContainer(
        offset=off,
        length=length,
        ref_id=ref_id,
        start=start,
        span=span,
        n_records=n_records,
        header_len=p - off,
        landmarks=tuple(landmarks),
    )


def scan_containers(path: str, data: bytes | None = None) -> list[CramContainer]:
    """Walk every container header (CramSource.java:162-174 semantics).

    Driver-side: reads only the ~30-byte headers, seeking over content.
    ``data``: pass already-read file bytes to avoid a second full read
    (build_crai holds the bytes for slice-header parsing anyway).
    """
    if data is None:
        with fs.open_input(path) as f:
            data = f.read()  # fixtures are small; real impl would seek
    major, _minor, off = parse_file_definition(data)
    out: list[CramContainer] = []
    while off < len(data):
        c = parse_container_header(data, off, major)
        out.append(c)
        off = c.end
    return out


def read_crai(path: str) -> list[tuple[int, int, int, int, int, int]]:
    """.crai entries: (seq_id, start, span, container_offset,
    slice_offset, slice_size) — gzip-compressed TSV (CramSource.java:146-160)."""
    out = []
    with gzip.open(fs.open_input(path), "rt") as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split("\t")
            out.append(tuple(int(x) for x in parts[:6]))
    return out


def plan_cram_containers(path: str, split_size: int) -> list[tuple[int, int]]:
    """Byte ranges snapped to container boundaries: each split covers the
    containers whose start lies in [split_start, split_end)
    (TreeSet.ceiling snap, CramSource.java:119-143)."""
    import os

    containers = [c for c in scan_containers(path) if not c.is_eof]
    # first container holds the (compressed) SAM header; data follows
    boundaries = [c.offset for c in containers[1:]]
    if not boundaries:
        return []
    size = fs.getsize(path)
    chunks: list[tuple[int, int]] = []
    starts = sorted(boundaries)
    pos = 0
    chosen: list[int] = []
    while pos < size:
        import bisect

        i = bisect.bisect_left(starts, pos)
        if i < len(starts) and starts[i] < pos + split_size and (not chosen or starts[i] > chosen[-1]):
            chosen.append(starts[i])
        pos += split_size
    for i, s in enumerate(chosen):
        e = chosen[i + 1] if i + 1 < len(chosen) else size
        chunks.append((s, e))
    return chunks
