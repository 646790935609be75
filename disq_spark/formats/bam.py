"""BAM binary record codec, pure Python (no htsjdk, no pysam).

Field layout (SAM spec §4.2; also spelled out in the reference's
record-guessing heuristic, BamRecordGuesser.java:106-122):

  block_size:i32, refID:i32, pos:i32 (0-based), l_read_name:u8, mapq:u8,
  bin:u16, n_cigar_op:u16, flag:u16, l_seq:i32, next_refID:i32,
  next_pos:i32, tlen:i32, read_name (NUL-terminated), cigar (u32:
  len<<4|op), seq (4-bit packed), qual (l_seq), tags...

Decode emits reads-schema rows (1-based coords, '*'-style missing ->
NULL). Encode is the exact inverse; round-trip through decode/encode is
byte-identical modulo the `bin` field (recomputed).
"""

from __future__ import annotations

import struct

CIGAR_OPS = "MIDNSHP=X"
_REF_CONSUMING = frozenset("MDN=X")
SEQ_CODES = "=ACMGRSVTWYHKDBN"
_SEQ_INDEX = {c: i for i, c in enumerate(SEQ_CODES)}

BAM_MAGIC = b"BAM\x01"

# hot-loop lookup tables (the per-base loops dominated decode at ~30k
# records/s; per-byte table lookups + bytes.translate run in C)
_SEQ_PAIR = [SEQ_CODES[b >> 4] + SEQ_CODES[b & 0xF] for b in range(256)]
_SEQ_PAIR_B = [p.encode("ascii") for p in _SEQ_PAIR]
_QUAL_TO_ASCII = bytes((min(q + 33, 255)) for q in range(256))
_ASCII_TO_QUAL = bytes((max(c - 33, 0)) for c in range(256))
_SEQ_PACK = {}
for _a in SEQ_CODES + SEQ_CODES.lower():
    for _b in SEQ_CODES + SEQ_CODES.lower():
        _SEQ_PACK[_a + _b] = (_SEQ_INDEX[_a.upper()] << 4) | _SEQ_INDEX[_b.upper()]


def parse_bam_header(data: bytes) -> tuple[str, list[tuple[str, int]], int]:
    """Parse the uncompressed BAM header block(s).

    Returns (header_text, [(ref_name, ref_len)], header_end_offset) where
    header_end_offset is the offset of the first alignment record within
    the uncompressed stream.
    """
    if data[:4] != BAM_MAGIC:
        raise ValueError("not a BAM stream (bad magic)")
    l_text = struct.unpack_from("<i", data, 4)[0]
    text = data[8 : 8 + l_text].split(b"\x00", 1)[0].decode("utf-8")
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    refs: list[tuple[str, int]] = []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, off)[0]
        off += 4
        name = data[off : off + l_name - 1].decode("utf-8")
        off += l_name
        l_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        refs.append((name, l_ref))
    return text, refs, off


def _f32_str(v: float) -> str:
    """Shortest decimal string that round-trips to the same float32.

    '%g' keeps only 6 significant digits (16357.98 -> '16358'), silently
    corrupting f / B:f tag values on a read->write round trip.
    """
    import numpy as _np

    return _np.format_float_positional(_np.float32(v), unique=True, trim="-")


def _decode_tags(data: bytes, off: int, end: int) -> dict[str, str]:
    """Aux tags -> {tag: "TYPE:value"} (lossless string form)."""
    tags: dict[str, str] = {}
    while off < end:
        tag = data[off : off + 2].decode("ascii")
        typ = chr(data[off + 2])
        off += 3
        if typ == "A":
            tags[tag] = "A:" + chr(data[off])
            off += 1
        elif typ in "cC":
            v = struct.unpack_from("<b" if typ == "c" else "<B", data, off)[0]
            tags[tag] = f"i:{v}"
            off += 1
        elif typ in "sS":
            v = struct.unpack_from("<h" if typ == "s" else "<H", data, off)[0]
            tags[tag] = f"i:{v}"
            off += 2
        elif typ in "iI":
            v = struct.unpack_from("<i" if typ == "i" else "<I", data, off)[0]
            tags[tag] = f"i:{v}"
            off += 4
        elif typ == "f":
            v = struct.unpack_from("<f", data, off)[0]
            tags[tag] = f"f:{_f32_str(v)}"
            off += 4
        elif typ == "Z":
            endz = data.index(b"\x00", off)
            tags[tag] = "Z:" + data[off:endz].decode("ascii")
            off = endz + 1
        elif typ == "H":
            endz = data.index(b"\x00", off)
            tags[tag] = "H:" + data[off:endz].decode("ascii")
            off = endz + 1
        elif typ == "B":
            sub = chr(data[off])
            n = struct.unpack_from("<i", data, off + 1)[0]
            off += 5
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            size = struct.calcsize("<" + fmt)
            vals = struct.unpack_from(f"<{n}{fmt}", data, off)
            off += n * size
            if sub == "f":
                tags[tag] = "B:" + sub + "," + ",".join(_f32_str(v) for v in vals)
            else:
                tags[tag] = "B:" + sub + "," + ",".join(str(v) for v in vals)
        else:
            raise ValueError(f"unknown tag type {typ!r}")
    return tags


_REC_HDR = struct.Struct("<iiBBHHHiiii")


def decode_record(
    data: bytes,
    off: int,
    refs: list[tuple[str, int]],
    with_seq: bool = True,
    with_qual: bool = True,
    with_tags: bool = True,
):
    """Decode one alignment starting at ``off`` (at block_size field).

    Returns (row_tuple_in_READS_COLUMNS_order, next_offset). The
    ``with_*`` switches are manual column pruning INTO the Python
    decoder: seq/qual/tags are most of the bytes and most of the decode
    time, and counting/position workloads never look at them.
    """
    block_size = struct.unpack_from("<i", data, off)[0]
    base = off + 4
    (
        ref_id,
        pos,
        l_read_name,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        next_ref,
        next_pos,
        tlen,
    ) = _REC_HDR.unpack_from(data, base)
    p = base + 32
    name = data[p : p + l_read_name - 1].decode("ascii")
    p += l_read_name
    cigar_ops = struct.unpack_from(f"<{n_cigar}I", data, p)
    p += 4 * n_cigar
    n_seq_bytes = (l_seq + 1) // 2
    seq_packed = data[p : p + n_seq_bytes] if with_seq else None
    p += n_seq_bytes
    qual_raw = data[p : p + l_seq] if with_qual else None
    p += l_seq
    tags = _decode_tags(data, p, base + block_size) if with_tags else None

    cigar_str = None
    ref_len = 0
    if n_cigar:
        parts = []
        for c in cigar_ops:
            n, op = c >> 4, CIGAR_OPS[c & 0xF]
            parts.append(f"{n}{op}")
            if op in _REF_CONSUMING:
                ref_len += n
        cigar_str = "".join(parts)

    seq = None
    if l_seq and with_seq:
        seq = b"".join(map(_SEQ_PAIR_B.__getitem__, seq_packed)).decode("ascii")[:l_seq]
    qual = None
    if l_seq and with_qual and (not qual_raw or qual_raw[0] != 0xFF):
        qual = qual_raw.translate(_QUAL_TO_ASCII).decode("latin-1")

    contig = refs[ref_id][0] if ref_id >= 0 else None
    start = pos + 1 if (ref_id >= 0 and pos >= 0) else None
    end = (start + max(ref_len, 1) - 1) if start else None
    mate_contig = refs[next_ref][0] if next_ref >= 0 else None
    mate_start = next_pos + 1 if (next_ref >= 0 and next_pos >= 0) else None
    read_group = None
    if tags and "RG" in tags:
        read_group = tags["RG"].split(":", 1)[1]

    row = (
        None if name == "*" else name,
        flag,
        contig,
        start,
        end,
        mapq,
        cigar_str,
        mate_contig,
        mate_start,
        tlen,
        seq,
        qual,
        tags or None,
        read_group,
    )
    return row, off + 4 + block_size


def _opt_int(v) -> int | None:
    """None/NaN-safe int (pandas renders nullable longs as float NaN)."""
    if v is None:
        return None
    try:
        import math

        if isinstance(v, float) and math.isnan(v):
            return None
    except TypeError:
        pass
    return int(v)


def encode_record(row: dict, ref_index: dict[str, int]) -> bytes:
    """reads-schema row (dict-like) -> one BAM alignment record."""
    name = row["name"] if row["name"] is not None else "*"
    flag = int(row["flags"])
    contig = row["contig"]
    ref_id = ref_index[contig] if contig is not None else -1
    start = _opt_int(row["start"])
    pos = start - 1 if start is not None else -1
    mapq = _opt_int(row["mapq"])
    mapq = mapq if mapq is not None else 255
    cigar = row["cigar"]
    mate = row["mate_contig"]
    next_ref = ref_index[mate] if mate is not None else -1
    mate_start = _opt_int(row["mate_start"])
    next_pos = mate_start - 1 if mate_start is not None else -1
    tlen = _opt_int(row["template_len"]) or 0
    seq = row["seq"]
    qual = row["qual"]

    name_b = name.encode("ascii") + b"\x00"

    cigar_ops = []
    ref_len = 0
    if cigar:
        import re

        for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar):
            cigar_ops.append((int(n) << 4) | CIGAR_OPS.index(op))
            if op in _REF_CONSUMING:
                ref_len += int(n)

    l_seq = len(seq) if seq else 0
    if seq:
        pack = _SEQ_PACK
        padded = seq if l_seq % 2 == 0 else seq + "="
        try:
            seq_packed = bytes(
                pack[padded[i : i + 2]] for i in range(0, len(padded), 2)
            )
        except KeyError:  # rare non-IUPAC characters: slow path, map to N
            seq_packed = bytearray((l_seq + 1) // 2)
            for i, ch in enumerate(seq):
                code = _SEQ_INDEX.get(ch.upper(), 15)
                seq_packed[i // 2] |= code << 4 if i % 2 == 0 else code
            seq_packed = bytes(seq_packed)
    else:
        seq_packed = b""
    qual_b = qual.encode("latin-1").translate(_ASCII_TO_QUAL) if qual else b"\xff" * l_seq

    tags_b = _encode_tags(row["tags"] or {})

    # bin: reg2bin over [pos, pos+ref_len) — SAM spec §5.3
    endp = pos + max(ref_len, 1)
    bin_ = _reg2bin(pos if pos >= 0 else 0, endp if endp > 0 else 1)

    body = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id,
            pos,
            len(name_b),
            mapq,
            bin_,
            len(cigar_ops),
            flag,
            l_seq,
            next_ref,
            next_pos,
            tlen,
        )
        + name_b
        + struct.pack(f"<{len(cigar_ops)}I", *cigar_ops)
        + bytes(seq_packed)
        + qual_b
        + tags_b
    )
    return struct.pack("<i", len(body)) + body


def _encode_tags(tags: dict[str, str]) -> bytes:
    out = bytearray()
    for tag, tv in tags.items():
        typ, val = tv.split(":", 1)
        out += tag.encode("ascii")
        if typ == "A":
            out += b"A" + val.encode("ascii")
        elif typ == "i":
            v = int(val)
            if -128 <= v < 128:
                out += b"c" + struct.pack("<b", v)
            elif 0 <= v < 256:
                out += b"C" + struct.pack("<B", v)
            elif -32768 <= v < 32768:
                out += b"s" + struct.pack("<h", v)
            elif 0 <= v < 65536:
                out += b"S" + struct.pack("<H", v)
            else:
                out += b"i" + struct.pack("<i", v)
        elif typ == "f":
            out += b"f" + struct.pack("<f", float(val))
        elif typ == "Z":
            out += b"Z" + val.encode("ascii") + b"\x00"
        elif typ == "H":
            out += b"H" + val.encode("ascii") + b"\x00"
        elif typ == "B":
            sub, rest = val.split(",", 1)
            vals = rest.split(",")
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            out += b"B" + sub.encode("ascii") + struct.pack("<i", len(vals))
            for v in vals:
                out += struct.pack("<" + fmt, float(v) if sub == "f" else int(v))
        else:
            raise ValueError(f"unknown tag type {typ!r}")
    return bytes(out)


def _reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def encode_bam_header(header_text: str, refs: list[tuple[str, int]]) -> bytes:
    text_b = header_text.encode("utf-8")
    out = bytearray()
    out += BAM_MAGIC
    out += struct.pack("<i", len(text_b))
    out += text_b
    out += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode("utf-8") + b"\x00"
        out += struct.pack("<i", len(nb))
        out += nb
        out += struct.pack("<i", length)
    return bytes(out)
