"""CRAM 3.0 encoder, pure Python — the inverse of cram_decode.

Spec-conformant but deliberately simple encoding choices (legal CRAM is
a large space; we pick the corner that is easy to verify):
- one multi-reference slice per container (slice ref_id = -2, RI series
  per record), so no grouping by contig is required before writing;
- every data series EXTERNAL (own block, ITF8/bytes): no core bitstream
  on write — readers (ours, htsjdk, pysam) accept any declared encoding.
  Bases/quals (BA/QS) take the smaller of gzip and rans4x8 order-0
  (formats/rans.compress — htsjdk also writes these rANS), the numeric/
  name series stay gzip (LZ matches beat order-0 entropy coding there);
- absolute alignment positions (AP delta = 0);
- features computed against the reference FASTA from (cigar, seq):
  X substitutions via the canonical substitution matrix, I/S/D/N/H/P
  taken from the cigar — the inverse of cram_decode._reconstruct.

Verified by round-trip: encode -> our decoder -> identical rows
(tests/test_cram.py); the container layout also re-scans with
formats/cram.py (offsets, record counts, EOF sentinel).

Replaces the reference's htsjdk-backed CRAM sink
(CramSink.java:60-141 + CramOutputFormat.java:51-127).
"""

from __future__ import annotations

import struct
import zlib

BASES = "ACGTN"
SM_DEFAULT = bytes([0x1B] * 5)  # codes 0,1,2,3 = substitution bases in order

# spec-defined CRAM v3 EOF container (38 bytes)
EOF_V3 = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f0001000606010001000100ee63014b"
)

# external block content-id allocation (arbitrary but fixed)
CID = {
    "BF": 1, "CF": 2, "RI": 3, "RL": 4, "AP": 5, "RG": 6, "RN": 7,
    "MF": 8, "NS": 9, "NP": 10, "TS": 11, "NF": 12, "TL": 13,
    "FN": 14, "FC": 15, "FP": 16, "BS": 17, "IN": 18, "DL": 19,
    "SC": 20, "RS": 21, "HC": 22, "PD": 23, "BA": 24, "QS": 25, "MQ": 26,
}
TAG_CID_BASE = 64  # (len, val) cid pairs per distinct tag


def write_itf8(v: int) -> bytes:
    if v < 0:
        v &= 0xFFFFFFFF
        return bytes(
            [0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F]
        )
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])
    return bytes(
        [0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F]
    )


def write_ltf8(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n = v
    nbytes = 0
    while n:
        nbytes += 1
        n >>= 8
    prefix_bits = nbytes
    first = ((0xFF << (8 - prefix_bits)) & 0xFF) | (
        (v >> (8 * nbytes)) & ((1 << (7 - prefix_bits)) - 1) if prefix_bits < 8 else 0
    )
    out.append(first)
    for i in range(nbytes - 1, -1, -1):
        out.append((v >> (8 * i)) & 0xFF)
    return bytes(out[: nbytes + 1])


class Series:
    """Byte accumulator for one external block."""

    def __init__(self):
        self.buf = bytearray()

    def itf8(self, v: int) -> None:
        self.buf += write_itf8(v)

    def byte(self, v: int) -> None:
        self.buf.append(v & 0xFF)

    def raw(self, b: bytes) -> None:
        self.buf += b

    def stop_bytes(self, b: bytes, stop: int = 0) -> None:
        self.buf += b
        self.buf.append(stop)


def _block(method: int, ctype: int, cid: int, payload: bytes, rans_order: int = 0) -> bytes:
    """Serialize one v3 block (with CRC32). method: 0 raw, 1 gzip,
    4 rans4x8 (order 0 or 1 per ``rans_order`` — the order byte lives
    inside the stream, the block method byte is 4 for both)."""
    if method == 1:
        comp = zlib.compressobj(6, zlib.DEFLATED, 15 + 16)
        data = comp.compress(payload) + comp.flush()
    elif method == 4:
        from disq_spark.formats import rans

        data = rans.compress_o1(payload) if rans_order else rans.compress(payload)
    else:
        data = payload
    head = bytes([method, ctype]) + write_itf8(cid) + write_itf8(len(data)) + write_itf8(len(payload))
    body = head + data
    return body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)


# series whose payloads are raw per-base bytes — the shape rANS order-0
# models well (htsjdk writes these rANS-compressed); everything else
# (ITF8-packed numbers, names) tends to favor gzip's LZ matches
_RANS_SERIES = ("BA", "QS")


def _best_block(ctype: int, cid: int, payload: bytes, try_rans: bool) -> bytes:
    """gzip block, or the smallest of gzip/rans4x8-o0/rans4x8-o1 for byte
    series (htsjdk writes quality series order-1; per-block pick-smaller
    mirrors its per-series method choice while guaranteeing the written
    file never exceeds the gzip baseline)."""
    gz = _block(1, ctype, cid, payload)
    if not try_rans or not payload:
        return gz
    best = min(
        (_block(4, ctype, cid, payload), _block(4, ctype, cid, payload, rans_order=1)),
        key=len,
    )
    return best if len(best) < len(gz) else gz


def _sub_code(ref_base: str, alt_base: str, sm: bytes = SM_DEFAULT) -> int:
    ri = BASES.index(ref_base if ref_base in BASES else "N")
    subs = [b for b in BASES if b != BASES[ri]]
    byte = sm[ri]
    for j, cand in enumerate(subs):
        if cand == (alt_base if alt_base in BASES else "N"):
            return (byte >> (6 - 2 * j)) & 3
    return byte & 3


def _features_from_cigar(cigar: str, seq: str, contig: str, pos: int, get_ref):
    """(features, ok): inverse of cram_decode._reconstruct. Features are
    (read_pos_1based, code, value)."""
    import re

    feats = []
    read_i = 0
    ref_i = pos
    for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar or ""):
        n = int(n)
        if op in ("M", "=", "X"):
            ref_seg = get_ref(contig, ref_i, ref_i + n - 1)
            for k in range(n):
                rb = ref_seg[k] if k < len(ref_seg) else "N"
                sb = seq[read_i + k] if read_i + k < len(seq) else "N"
                if sb != rb:
                    feats.append((read_i + k + 1, "X", _sub_code(rb, sb)))
            read_i += n
            ref_i += n
        elif op == "I":
            feats.append((read_i + 1, "I", seq[read_i : read_i + n].encode("ascii")))
            read_i += n
        elif op == "S":
            feats.append((read_i + 1, "S", seq[read_i : read_i + n].encode("ascii")))
            read_i += n
        elif op == "D":
            feats.append((read_i + 1, "D", n))
            ref_i += n
        elif op == "N":
            feats.append((read_i + 1, "N", n))
            ref_i += n
        elif op == "H":
            feats.append((read_i + 1, "H", n))
        elif op == "P":
            feats.append((read_i + 1, "P", n))
    return feats


def _tag_binary(tv: str) -> tuple[str, bytes]:
    """our "T:value" string -> (type char, CRAM byte payload)."""
    typ, val = tv.split(":", 1)
    if typ == "Z":
        return "Z", val.encode("ascii") + b"\x00"
    if typ == "A":
        return "A", val[:1].encode("ascii")
    if typ == "i":
        return "i", struct.pack("<i", int(val))
    if typ == "f":
        return "f", struct.pack("<f", float(val))
    if typ == "H":
        return "H", val.encode("ascii") + b"\x00"
    if typ == "B":
        sub, rest = val.split(",", 1)
        vals = rest.split(",")
        fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
        out = sub.encode("ascii") + struct.pack("<i", len(vals))
        for v in vals:
            out += struct.pack("<" + fmt, float(v) if sub == "f" else int(v))
        return "B", out
    raise ValueError(f"tag type {typ}")


def _compression_header(tag_lines: list[list[tuple[str, str]]], tag_cids: dict) -> bytes:
    # preservation map: RN=1, AP=0 (absolute), RR=1, SM, TD
    td_blob = b"".join(
        b"".join(t.encode("ascii") + y.encode("ascii") for t, y in line) + b"\x00"
        for line in tag_lines
    )
    pres = bytearray()
    entries = [
        (b"RN", bytes([1])),
        (b"AP", bytes([0])),
        (b"RR", bytes([1])),
        (b"SM", SM_DEFAULT),
        (b"TD", write_itf8(len(td_blob)) + td_blob),
    ]
    pres += write_itf8(len(entries))
    for k, v in entries:
        pres += k + v
    pres_blob = write_itf8(len(pres)) + pres

    # data series: all EXTERNAL (codec 1, params = itf8 cid)
    ds = bytearray()
    keys = list(CID.keys())
    ds += write_itf8(len(keys))
    for key in keys:
        if key in ("RN", "IN", "SC"):
            params = bytes([0x00]) + write_itf8(CID[key])  # BYTE_ARRAY_STOP \x00
            ds += key.encode("ascii") + write_itf8(5) + write_itf8(len(params)) + params
        else:
            params = write_itf8(CID[key])
            ds += key.encode("ascii") + write_itf8(1) + write_itf8(len(params)) + params
    ds_blob = write_itf8(len(ds)) + ds

    # tag encodings: BYTE_ARRAY_LEN(len=EXTERNAL(len_cid), val=EXTERNAL(val_cid))
    tg = bytearray()
    tg += write_itf8(len(tag_cids))
    for (tag, typ), (len_cid, val_cid) in tag_cids.items():
        key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
        len_params = write_itf8(len_cid)
        val_params = write_itf8(val_cid)
        params = (
            write_itf8(1) + write_itf8(len(len_params)) + len_params
            + write_itf8(1) + write_itf8(len(val_params)) + val_params
        )
        tg += write_itf8(key) + write_itf8(4) + write_itf8(len(params)) + params
    tg_blob = write_itf8(len(tg)) + tg

    return bytes(pres_blob + ds_blob + tg_blob)


def encode_container(rows: list[tuple], ref_index: dict[str, int], get_ref) -> tuple[bytes, list]:
    """rows (READS_COLUMNS order) -> (container bytes, crai entries).

    crai entries are (seq_id, start, span, container_offset_relative=0,
    slice_header_offset, slice_size) — caller shifts container offsets.
    """
    s = {k: Series() for k in CID}
    tag_lines: list[list[tuple[str, str]]] = []
    line_index: dict[tuple, int] = {}
    tag_cids: dict[tuple[str, str], tuple[int, int]] = {}
    tag_data: dict[tuple[str, str], tuple[Series, Series]] = {}
    per_ref: dict[int, tuple[int, int]] = {}  # seq_id -> (min_start, max_end)

    n_records = 0
    for row in rows:
        (name, flags, contig, start, end, mapq, cigar, mate_contig, mate_start,
         tlen, seq, qual, tags, _rg) = row
        flags = int(flags)
        ref_id = ref_index.get(contig, -1) if contig is not None else -1
        pos = int(start) if start is not None and contig is not None else 0
        rl = len(seq) if seq else 0
        cf = 0x2  # always detached (mate stored verbatim)
        if qual is not None:
            cf |= 0x1
        if seq is None:
            cf |= 0x8  # decode sequence as '*'
        s["BF"].itf8(flags)
        s["CF"].itf8(cf)
        s["RI"].itf8(ref_id)
        s["RL"].itf8(rl)
        s["AP"].itf8(pos)
        s["RG"].itf8(-1)
        s["RN"].stop_bytes((name or "*").encode("ascii"))
        # detached mate
        mf = 0
        if flags & 0x8:
            mf |= 0x1
        if flags & 0x20:
            mf |= 0x2
        s["MF"].itf8(mf)
        s["NS"].itf8(ref_index.get(mate_contig, -1) if mate_contig is not None else -1)
        s["NP"].itf8(int(mate_start) if mate_start is not None else 0)
        s["TS"].itf8(int(tlen) if tlen is not None else 0)
        # tags
        items = sorted((tags or {}).items())
        typed = []
        for tag, tv in items:
            typ, payload = _tag_binary(tv)
            typed.append((tag, typ, payload))
        key = tuple((t, y) for t, y, _p in typed)
        tl = line_index.get(key)
        if tl is None:
            tl = len(tag_lines)
            line_index[key] = tl
            tag_lines.append([(t, y) for t, y in key])
        s["TL"].itf8(tl)
        for tag, typ, payload in typed:
            tk = (tag, typ)
            if tk not in tag_cids:
                n = len(tag_cids)
                tag_cids[tk] = (TAG_CID_BASE + 2 * n, TAG_CID_BASE + 2 * n + 1)
                tag_data[tk] = (Series(), Series())
            ls, vs = tag_data[tk]
            ls.itf8(len(payload))
            vs.raw(payload)
        # alignment
        if flags & 0x4 == 0 and contig is not None:
            feats = _features_from_cigar(cigar or f"{rl}M", seq or "", contig, pos, get_ref)
            s["FN"].itf8(len(feats))
            prev = 0
            for fpos, code, val in feats:
                s["FC"].byte(ord(code))
                s["FP"].itf8(fpos - prev)
                prev = fpos
                if code == "X":
                    s["BS"].byte(val)
                elif code in ("I",):
                    s["IN"].stop_bytes(val)
                elif code == "S":
                    s["SC"].stop_bytes(val)
                elif code == "D":
                    s["DL"].itf8(val)
                elif code == "N":
                    s["RS"].itf8(val)
                elif code == "H":
                    s["HC"].itf8(val)
                elif code == "P":
                    s["PD"].itf8(val)
            s["MQ"].itf8(int(mapq) if mapq is not None else 0)
            ref_len = max(
                sum(f[2] for f in feats if f[1] in ("D", "N"))
                + rl
                - sum(len(f[2]) for f in feats if f[1] in ("I", "S")),
                1,
            )
            lo, hi = per_ref.get(ref_id, (pos, pos + ref_len - 1))
            per_ref[ref_id] = (min(lo, pos), max(hi, pos + ref_len - 1))
        elif seq is not None:
            s["BA"].raw(seq.encode("ascii"))
        if True:
            if ref_id >= 0:
                lo, hi = per_ref.get(ref_id, (pos, pos))
                per_ref[ref_id] = (min(lo, pos), max(hi, pos))
        if qual is not None:
            s["QS"].raw(bytes(ord(c) - 33 for c in qual))
        n_records += 1

    # blocks: compression header + slice header + externals
    ch_block = _block(1, 1, 0, _compression_header(tag_lines, tag_cids))

    ext_blocks = []
    content_ids = []
    for key, series in s.items():
        if series.buf:
            ext_blocks.append(
                _best_block(4, CID[key], bytes(series.buf), key in _RANS_SERIES)
            )
            content_ids.append(CID[key])
    for tk, (ls, vs) in tag_data.items():
        lc, vc = tag_cids[tk]
        ext_blocks.append(_block(1, 4, lc, bytes(ls.buf)))
        ext_blocks.append(_block(1, 4, vc, bytes(vs.buf)))
        content_ids.extend([lc, vc])
    core_block = _block(0, 5, 0, b"")  # empty core bitstream

    slice_payload = bytearray()
    slice_payload += write_itf8(-2)  # multiref
    slice_payload += write_itf8(0)  # start
    slice_payload += write_itf8(0)  # span
    slice_payload += write_itf8(n_records)
    slice_payload += write_ltf8(0)  # record counter
    slice_payload += write_itf8(1 + len(ext_blocks))  # core + externals
    slice_payload += write_itf8(len(content_ids))
    for cid in content_ids:
        slice_payload += write_itf8(cid)
    slice_payload += write_itf8(-1)  # no embedded reference
    slice_payload += b"\x00" * 16  # md5 (unchecked)
    sl_block = _block(1, 2, 0, bytes(slice_payload))

    blocks = ch_block + sl_block + core_block + b"".join(ext_blocks)

    # container header (v3): length, ref -2, start 0, span 0, n_records,
    # counter ltf8, bases ltf8, n_blocks, landmarks [slice offset], crc
    hdr = bytearray()
    hdr += struct.pack("<i", len(blocks))
    hdr += write_itf8(-2)
    hdr += write_itf8(0)
    hdr += write_itf8(0)
    hdr += write_itf8(n_records)
    hdr += write_ltf8(0)
    hdr += write_ltf8(0)
    hdr += write_itf8(3 + len(ext_blocks))  # ch + slice hdr + core + externals
    hdr += write_itf8(1)  # one landmark
    hdr += write_itf8(len(ch_block))  # slice header offset within blocks
    hdr_bytes = bytes(hdr)
    hdr_bytes += struct.pack("<I", zlib.crc32(hdr_bytes) & 0xFFFFFFFF)

    crai = [
        (rid, lo, hi - lo + 1, 0, len(ch_block), len(blocks) - len(ch_block))
        for rid, (lo, hi) in sorted(per_ref.items())
    ]
    return hdr_bytes + blocks, crai


def encode_file_header(sam_text: str) -> bytes:
    """The first (FILE_HEADER) container."""
    payload = struct.pack("<i", len(sam_text.encode("utf-8"))) + sam_text.encode("utf-8")
    blk = _block(1, 0, 0, payload)
    hdr = bytearray()
    hdr += struct.pack("<i", len(blk))
    hdr += write_itf8(-1)
    hdr += write_itf8(0)
    hdr += write_itf8(0)
    hdr += write_itf8(0)
    hdr += write_ltf8(0)
    hdr += write_ltf8(0)
    hdr += write_itf8(1)
    hdr += write_itf8(0)  # no landmarks
    hdr_bytes = bytes(hdr)
    hdr_bytes += struct.pack("<I", zlib.crc32(hdr_bytes) & 0xFFFFFFFF)
    return hdr_bytes + blk


def file_definition() -> bytes:
    return b"CRAM" + bytes([3, 0]) + b"disq_spark".ljust(20, b"\x00")
