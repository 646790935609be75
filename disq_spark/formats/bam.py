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

import math as _math
import struct

from disq_spark.schemas import READS_COLUMNS as _READS_COLS

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
# char -> 4-bit code table for the C-speed packer (0xFF = non-IUPAC sentinel)
_SEQ_CODE_TABLE = bytes(
    _SEQ_INDEX.get(chr(c).upper(), 0xFF) if chr(c).upper() in _SEQ_INDEX else 0xFF
    for c in range(256)
)


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
    """Aux tags -> {tag: "TYPE:value"} (lossless string form).

    Hot loop: dispatches on the raw type byte and slices with
    int.from_bytes — this parser dominates full-record decode time, so
    no struct/chr/f-string in the common cases.
    """
    tags: dict[str, str] = {}
    ifb = int.from_bytes
    idx = data.index
    while off < end:
        tag = data[off : off + 2].decode("ascii")
        t = data[off + 2]
        off += 3
        if t == 90:  # Z
            endz = idx(0, off)
            tags[tag] = "Z:" + data[off:endz].decode("ascii")
            off = endz + 1
        elif t == 105:  # i (int32)
            tags[tag] = "i:" + str(ifb(data[off : off + 4], "little", signed=True))
            off += 4
        elif t == 67:  # C (uint8)
            tags[tag] = "i:" + str(data[off])
            off += 1
        elif t == 99:  # c (int8)
            v = data[off]
            tags[tag] = "i:" + str(v - 256 if v > 127 else v)
            off += 1
        elif t == 83:  # S (uint16)
            tags[tag] = "i:" + str(ifb(data[off : off + 2], "little"))
            off += 2
        elif t == 115:  # s (int16)
            tags[tag] = "i:" + str(ifb(data[off : off + 2], "little", signed=True))
            off += 2
        elif t == 73:  # I (uint32)
            tags[tag] = "i:" + str(ifb(data[off : off + 4], "little"))
            off += 4
        elif t == 65:  # A
            tags[tag] = "A:" + chr(data[off])
            off += 1
        elif t == 102:  # f
            v = struct.unpack_from("<f", data, off)[0]
            tags[tag] = "f:" + _f32_str(v)
            off += 4
        elif t == 72:  # H
            endz = idx(0, off)
            tags[tag] = "H:" + data[off:endz].decode("ascii")
            off = endz + 1
        elif t == 66:  # B
            sub = chr(data[off])
            n = ifb(data[off + 1 : off + 5], "little", signed=True)
            off += 5
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            size = struct.calcsize("<" + fmt)
            vals = struct.unpack_from(f"<{n}{fmt}", data, off)
            off += n * size
            if sub == "f":
                tags[tag] = "B:" + sub + "," + ",".join(_f32_str(v) for v in vals)
            else:
                tags[tag] = "B:" + sub + "," + ",".join(map(str, vals))
        else:
            raise ValueError(f"unknown tag type {chr(t)!r}")
    return tags


_REC_HDR = struct.Struct("<iiBBHHHiiii")

# numpy views of the decode lookup tables (vectorized batch decoder)
_HDR_DTYPE = None  # built lazily to keep numpy import off the cold path


def _np_tables():
    global _HDR_DTYPE, _SEQ_CHARS_NP, _CIG_CHARS_NP, _REF_CONSUME_NP
    import numpy as np

    if _HDR_DTYPE is None:
        _HDR_DTYPE = np.dtype(
            [
                ("ref_id", "<i4"),
                ("pos", "<i4"),
                ("l_read_name", "u1"),
                ("mapq", "u1"),
                ("bin", "<u2"),
                ("n_cigar", "<u2"),
                ("flag", "<u2"),
                ("l_seq", "<i4"),
                ("next_ref", "<i4"),
                ("next_pos", "<i4"),
                ("tlen", "<i4"),
            ]
        )
        _SEQ_CHARS_NP = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
        _CIG_CHARS_NP = np.array(list(CIGAR_OPS))
        _REF_CONSUME_NP = np.array(
            [1 if c in _REF_CONSUMING else 0 for c in CIGAR_OPS], dtype=np.int64
        )
    return _HDR_DTYPE


def decode_batch(
    data: bytes,
    offs,
    refs: list[tuple[str, int]],
    with_seq: bool = True,
    with_qual: bool = True,
    with_tags: bool = True,
    raw_tags: bool = False,
) -> dict:
    """Vectorized decode of many records -> column dict (READS_COLUMNS).

    numpy batch-parses the fixed 32-byte record headers, cigars, packed
    seq nibbles, and qual arrays over the whole batch (one gather per
    field instead of per-record struct.unpack) — the ~3x single-core
    throughput the per-record loop leaves on the table. Names and aux
    tags stay per-record (inherently variable-length string assembly).
    Values are bit-identical to decode_record; test_bam asserts the
    differential.
    """
    import numpy as np

    cols = {c: [] for c in _READS_COLS}
    n = len(offs)
    if n == 0:
        return cols
    dt = _np_tables()
    u8 = np.frombuffer(data, dtype=np.uint8)
    offs = np.asarray(offs, dtype=np.int64)
    base = offs + 4
    hdr = np.ascontiguousarray(u8[base[:, None] + np.arange(32)])
    f = hdr.view(dt).reshape(n)
    ref_id = f["ref_id"].astype(np.int64)
    pos = f["pos"].astype(np.int64)
    l_name = f["l_read_name"].astype(np.int64)
    n_cigar = f["n_cigar"].astype(np.int64)
    l_seq = f["l_seq"].astype(np.int64)
    next_ref = f["next_ref"].astype(np.int64)
    next_pos = f["next_pos"].astype(np.int64)

    name_start = base + 32
    cig_start = name_start + l_name
    seq_start = cig_start + 4 * n_cigar
    n_seq_bytes = (l_seq + 1) // 2
    qual_start = seq_start + n_seq_bytes
    tag_start = qual_start + l_seq

    # names (per-record: tiny slices)
    name_start_l = name_start.tolist()
    l_name_l = l_name.tolist()
    names = []
    for i in range(n):
        s = data[name_start_l[i] : name_start_l[i] + l_name_l[i] - 1].decode("ascii")
        names.append(None if s == "*" else s)

    # cigars: one flat gather for every op in the batch
    total_ops = int(n_cigar.sum())
    ref_len = np.zeros(n, dtype=np.int64)
    cigars: list = [None] * n
    if total_ops:
        op_rec = np.repeat(np.arange(n), n_cigar)
        grp_start = np.cumsum(n_cigar) - n_cigar
        within = np.arange(total_ops) - np.repeat(grp_start, n_cigar)
        flat = cig_start[op_rec] + 4 * within
        b = u8[flat[:, None] + np.arange(4)].astype(np.uint32)
        cig32 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        lens = (cig32 >> 4).astype(np.int64)
        ops = (cig32 & 0xF).astype(np.int64)
        ref_len = np.bincount(op_rec, weights=lens * _REF_CONSUME_NP[ops], minlength=n).astype(
            np.int64
        )
        pieces = np.char.add(lens.astype("U10"), _CIG_CHARS_NP[ops]).tolist()
        idx = 0
        n_cigar_l = n_cigar.tolist()
        for i in range(n):
            c = n_cigar_l[i]
            if c:
                cigars[i] = "".join(pieces[idx : idx + c])
            idx += c

    l_seq_l = l_seq.tolist()

    # seq: flat nibble expansion, then per-record slices off one array
    seqs: list = [None] * n
    if with_seq:
        total_sb = int(n_seq_bytes.sum())
        if total_sb:
            sb_rec = np.repeat(np.arange(n), n_seq_bytes)
            grp = np.cumsum(n_seq_bytes) - n_seq_bytes
            within = np.arange(total_sb) - np.repeat(grp, n_seq_bytes)
            packed = u8[seq_start[sb_rec] + within]
            chars = np.empty(2 * total_sb, dtype=np.uint8)
            chars[0::2] = _SEQ_CHARS_NP[packed >> 4]
            chars[1::2] = _SEQ_CHARS_NP[packed & 0xF]
            cbytes = chars.tobytes()
            grp_l = (2 * grp).tolist()
            for i in range(n):
                if l_seq_l[i]:
                    seqs[i] = cbytes[grp_l[i] : grp_l[i] + l_seq_l[i]].decode("ascii")

    # qual: flat +33 translate, per-record slices; 0xFF first byte = missing
    quals: list = [None] * n
    if with_qual:
        total_q = int(l_seq.sum())
        if total_q:
            q_rec = np.repeat(np.arange(n), l_seq)
            grp = np.cumsum(l_seq) - l_seq
            within = np.arange(total_q) - np.repeat(grp, l_seq)
            q = u8[qual_start[q_rec] + within]
            qchars = np.minimum(q.astype(np.int64) + 33, 255).astype(np.uint8).tobytes()
            grp_l = grp.tolist()
            qual_start_l = qual_start.tolist()
            for i in range(n):
                if l_seq_l[i] and data[qual_start_l[i]] != 0xFF:
                    quals[i] = qchars[grp_l[i] : grp_l[i] + l_seq_l[i]].decode("latin-1")

    # tags: per-record scalar loop. (A vectorized wavefront parse was
    # measured SLOWER here: per-tag Python string + dict creation is the
    # floor, and numpy string ops cost more than int.from_bytes slicing.)
    # raw_tags sidesteps that floor entirely: one bytes slice per record
    # (the scale path — parse on demand via parse_tags(), copy verbatim
    # on write).
    tags_col: list = [None] * n
    rg_col: list = [None] * n
    if with_tags:
        bs = u8[offs[:, None] + np.arange(4)].astype(np.uint32)
        block_size = (bs[:, 0] | (bs[:, 1] << 8) | (bs[:, 2] << 16) | (bs[:, 3] << 24)).astype(
            np.int64
        )
        tag_start_l = tag_start.tolist()
        tag_end_l = (base + block_size).tolist()
        if raw_tags:
            for i in range(n):
                ts, te = tag_start_l[i], tag_end_l[i]
                if te > ts:
                    tags_col[i] = data[ts:te]
        else:
            for i in range(n):
                t = _decode_tags(data, tag_start_l[i], tag_end_l[i])
                if t:
                    tags_col[i] = t
                    rg = t.get("RG")
                    if rg is not None:
                        rg_col[i] = rg.split(":", 1)[1]

    refnames = [r[0] for r in refs]
    ref_id_l = ref_id.tolist()
    pos_l = pos.tolist()
    next_ref_l = next_ref.tolist()
    next_pos_l = next_pos.tolist()
    ref_len_l = ref_len.tolist()
    starts: list = [None] * n
    ends: list = [None] * n
    contigs: list = [None] * n
    m_contigs: list = [None] * n
    m_starts: list = [None] * n
    for i in range(n):
        r = ref_id_l[i]
        if r >= 0:
            contigs[i] = refnames[r]
            if pos_l[i] >= 0:
                s = pos_l[i] + 1
                starts[i] = s
                ends[i] = s + max(ref_len_l[i], 1) - 1
        mr = next_ref_l[i]
        if mr >= 0:
            m_contigs[i] = refnames[mr]
            if next_pos_l[i] >= 0:
                m_starts[i] = next_pos_l[i] + 1

    cols["name"] = names
    cols["flags"] = f["flag"].astype(np.int64).tolist()
    cols["contig"] = contigs
    cols["start"] = starts
    cols["end"] = ends
    cols["mapq"] = f["mapq"].astype(np.int64).tolist()
    cols["cigar"] = cigars
    cols["mate_contig"] = m_contigs
    cols["mate_start"] = m_starts
    cols["template_len"] = f["tlen"].astype(np.int64).tolist()
    cols["seq"] = seqs
    cols["qual"] = quals
    cols["tags"] = tags_col
    cols["read_group"] = rg_col
    return cols


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
    if type(v) is int:
        return v
    try:
        if isinstance(v, float) and _math.isnan(v):
            return None
    except TypeError:
        pass
    return int(v)


_CIGAR_RE = None
# cigar-string -> (packed_ops_bytes, n_ops, ref_len) memo: real corpora
# have a tiny distinct-cigar set ('101M', '100M', ...), so parsing each
# string once makes cigar encoding a dict hit. Bounded against
# adversarial inputs.
_CIGAR_CACHE: dict[str, tuple[bytes, int, int]] = {}
_CIGAR_CACHE_MAX = 1 << 16


def _encode_cigar(cigar: str) -> tuple[bytes, int, int]:
    global _CIGAR_RE
    hit = _CIGAR_CACHE.get(cigar)
    if hit is not None:
        return hit
    if _CIGAR_RE is None:
        import re

        _CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
    ops = []
    ref_len = 0
    for n, op in _CIGAR_RE.findall(cigar):
        ops.append((int(n) << 4) | CIGAR_OPS.index(op))
        if op in _REF_CONSUMING:
            ref_len += int(n)
    packed = struct.pack(f"<{len(ops)}I", *ops)
    if len(_CIGAR_CACHE) < _CIGAR_CACHE_MAX:
        _CIGAR_CACHE[cigar] = (packed, len(ops), ref_len)
    return packed, len(ops), ref_len


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

    if cigar:
        cigar_b, n_cigar, ref_len = _encode_cigar(cigar)
    else:
        cigar_b, n_cigar, ref_len = b"", 0, 0

    l_seq = len(seq) if seq else 0
    if seq:
        # C-speed nibble pack: translate chars to 4-bit codes, then
        # hi*16+lo over all bytes at once via big-int arithmetic (codes
        # <= 15, so per-byte products never carry into the next byte)
        padded = seq if l_seq % 2 == 0 else seq + "="
        codes = padded.encode("latin-1", "replace").translate(_SEQ_CODE_TABLE)
        if 0xFF in codes:  # rare non-IUPAC characters: slow path, map to N
            seq_packed = bytearray((l_seq + 1) // 2)
            for i, ch in enumerate(seq):
                code = _SEQ_INDEX.get(ch.upper(), 15)
                seq_packed[i // 2] |= code << 4 if i % 2 == 0 else code
            seq_packed = bytes(seq_packed)
        else:
            half = len(codes) // 2
            packed_int = (
                int.from_bytes(codes[0::2], "big") * 16
                + int.from_bytes(codes[1::2], "big")
            )
            seq_packed = packed_int.to_bytes(half, "big")
    else:
        seq_packed = b""
    qual_b = qual.encode("latin-1").translate(_ASCII_TO_QUAL) if qual else b"\xff" * l_seq

    tags = row["tags"]
    if isinstance(tags, (bytes, bytearray)):
        # raw-tags row (read_bam(tags="raw")): aux bytes pass through
        # verbatim — bit-exact round-trip, zero re-encode cost
        tags_b = bytes(tags)
    else:
        tags_b = _encode_tags(tags or {})

    # bin: reg2bin over [pos, pos+ref_len) — SAM spec §5.3
    endp = pos + max(ref_len, 1)
    bin_ = _reg2bin(pos if pos >= 0 else 0, endp if endp > 0 else 1)

    body = (
        _REC_HDR.pack(
            ref_id,
            pos,
            len(name_b),
            mapq,
            bin_,
            n_cigar,
            flag,
            l_seq,
            next_ref,
            next_pos,
            tlen,
        )
        + name_b
        + cigar_b
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
