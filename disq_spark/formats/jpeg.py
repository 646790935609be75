"""JPEG (JFIF) codec in numpy + stdlib — baseline AND progressive, no PIL.

Real LLM image corpora are JPEG-dominated (and web JPEGs are heavily
progressive), so the multimodal decode path needs a real JPEG decoder,
not a stub. This implements ITU-T T.81 (ISO/IEC 10918-1):

- decode: SOI/APP/DQT/SOF0/SOF2/DHT/DRI/SOS parsing, Huffman entropy
  decode with byte unstuffing and restart markers, dequantize +
  dezigzag, batched 8x8 float IDCT, chroma upsampling (h/v factors
  1-2), BT.601 YCbCr->RGB. Progressive (SOF2, T.81 Annex G): multi-scan
  spectral selection + successive approximation — DC/AC first and
  refinement passes, EOB-run skips with correction bits, ZRL-in-refine,
  non-interleaved single-component block grids, per-scan restarts.
  Arithmetic coding, 12-bit precision, lossless, and hierarchical modes
  return None (decode_jpeg is a sniffing decoder, same contract as
  _decode_png).
- encode: grayscale or 4:4:4/4:2:0 colour, baseline with the Annex K
  tables, or ``progressive=True`` (SOF2 scan script: DC Al=1 + refine;
  per-component AC 1-5/6-63 at Al=1 + one refine pass) — the
  progressive bitstream carries the IDENTICAL quantized coefficients
  as baseline, so both decodes agree pixel-exactly (the differential
  the property tests pin). Exists so tests and gates can synthesize
  JPEG payloads in a container that has no image libraries, and as the
  write side of the multimodal sink.

Exactness contract used by the oracle gate: an 8x8-blockwise-CONSTANT
grayscale image round-trips bit-exactly at any quality whose DC quant
step divides 8*(v-128) or equals 1 — all AC coefficients are exactly
zero and the DC path is integer — so a hash-exact DuckDB oracle can
verify the full Huffman+DCT pipeline on that subspace while ordinary
photographic content takes the usual lossy path (property-tested with
error bounds in tests/test_multimodal.py).

The reference (disq) has no image handling at all; this is part of the
beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag index order (T.81 Figure A.6): ZIGZAG[i] = raster index of the
# i-th coefficient in zig-zag order.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example quantization tables (raster order)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A: S = A @ block @ A.T."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """Decode table: a 256-entry LUT for codes <= 8 bits (one peek
    resolves the typical symbol) + the (length, code) map for longer
    codes. ~8x faster than the per-bit dict walk on real streams."""

    __slots__ = ("map", "lut8")

    def __init__(self, bits: list[int], vals: list[int]):
        self.map = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.map[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        self.lut8 = [None] * 256
        for (length, c), sym in self.map.items():
            if length <= 8:
                base = c << (8 - length)
                for pad in range(1 << (8 - length)):
                    self.lut8[base | pad] = (sym, length)


def _build_decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    return _HuffTable(bits, vals)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _encode_blocks(
    bw: _BitWriter,
    coefs: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-encode quantized zig-zag coefficient blocks (n, 64);
    returns the new DC predictor."""
    for blk in coefs:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size, amp = _magnitude(diff)
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(amp, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            size, amp = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            bw.write(code, length)
            bw.write(amp, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    return pred


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (n_blocks, 64) quantized zig-zag coeffs,
    blocks in raster order; H, W multiples of 8."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    s = np.einsum("ux,nxy,vy->nuv", _A, blocks - 128.0, _A)
    qm = q.reshape(8, 8).astype(np.float64)
    quant = np.round(s / qm).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


# Progressive AC scans need EOBn symbols (r<<4 for run lengths 2^r..)
# that the standard sequential AC tables do not contain. A flat table —
# all 256 symbols at code length 9 (Kraft sum 0.5, so the all-ones
# prefix stays unused as T.81 prefers) — can encode every progressive
# symbol; compression is not the point of the test encoder.
_FLAT_BITS = [0] * 16
_FLAT_BITS[8] = 255  # 255 codes of length 9 (DHT counts are bytes)
_FLAT_BITS[9] = 1  # symbol 0xFF at length 10
_FLAT_VALS = list(range(256))


class _ProgScanWriter:
    """Entropy writer for one progressive scan: EOB-run accumulation,
    buffered correction bits, restart handling (mirrors the decoder in
    _decode_prog_scan, which mirrors T.81 G.1.2 / libjpeg)."""

    def __init__(self, ac_codes, restart_interval):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.restart_interval = restart_interval
        self.eobrun = 0
        self.be: list[int] = []
        self.unit_i = 0
        self.rst_n = 0

    def flush_eob(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.be:
            self.bw.write(bit, 1)
        self.be = []

    def unit_boundary(self) -> bool:
        """Call before each MCU/block; emits RSTn when due. Returns
        True when a restart was emitted (DC predictors must reset)."""
        due = (
            self.restart_interval
            and self.unit_i
            and self.unit_i % self.restart_interval == 0
        )
        if due:
            self.flush_eob()
            self.bw.flush()
            self.bw.buf += bytes([0xFF, 0xD0 + self.rst_n])
            self.rst_n = (self.rst_n + 1) % 8
            self.reset_state()
        self.unit_i += 1
        return bool(due)

    def reset_state(self) -> None:
        self.eobrun = 0
        self.be = []

    def finish(self) -> bytes:
        self.flush_eob()
        self.bw.flush()
        return bytes(self.bw.buf)


def _enc_ac_first_block(w: _ProgScanWriter, blk, ss: int, se: int, al: int) -> None:
    vals = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al  # AC point transform truncates toward zero
        vals.append(a if v >= 0 else -a)
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eob()
        return
    w.flush_eob()
    r = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = w.ac[0xF0]
            w.bw.write(code, length)
            r -= 16
        size, amp = _magnitude(v)
        code, length = w.ac[(r << 4) | size]
        w.bw.write(code, length)
        w.bw.write(amp, size)
        r = 0
    if nz[-1] < se - ss:
        w.eobrun += 1


def _enc_ac_refine_block(w: _ProgScanWriter, blk, ss: int, se: int, al: int) -> None:
    band = [int(blk[k]) for k in range(ss, se + 1)]
    absv = [abs(v) >> al for v in band]
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = i
    r = 0
    br_bits: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            w.flush_eob()
            code, length = w.ac[0xF0]
            w.bw.write(code, length)
            r -= 16
            for bit in br_bits:
                w.bw.write(bit, 1)
            br_bits = []
        if a > 1:
            br_bits.append(a & 1)
            continue
        # newly-nonzero coefficient
        w.flush_eob()
        code, length = w.ac[(r << 4) | 1]
        w.bw.write(code, length)
        w.bw.write(1 if band[i] > 0 else 0, 1)
        for bit in br_bits:
            w.bw.write(bit, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        w.eobrun += 1
        w.be.extend(br_bits)
        if w.eobrun == 0x7FFF or len(w.be) > 900:
            w.flush_eob()


def _encode_progressive(
    out: bytearray,
    comps: list[np.ndarray],
    factors: list[tuple[int, int]],
    mcux: int,
    mcuy: int,
    h: int,
    w: int,
    gray: bool,
    restart_interval: int,
) -> None:
    """Append the progressive scan script: DC first (Al=1, interleaved),
    DC refine, then per component AC first split 1-5 / 6-63 at Al=1 and
    one AC refine 1-63 — exercising spectral selection, successive
    approximation, EOBRUN, ZRL-in-refine, and non-interleaved grids."""
    ncomp = len(comps)
    dc_codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    flat = _build_codes(_FLAT_BITS, _FLAT_VALS)
    out += _seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))  # DC table 0
    out += _seg(0xC4, bytes([0x10] + _FLAT_BITS + _FLAT_VALS))  # AC table 0
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        hdr = bytes([len(scan_comps)])
        for cid in scan_comps:
            hdr += bytes([cid, 0x00])  # DC table 0, AC table 0
        return _seg(0xDA, hdr + bytes([ss, se, (ah << 4) | al]))

    def mcu_order():
        for my in range(mcuy):
            for mx in range(mcux):
                blks = []
                for ci, (fh_, fv_) in enumerate(factors):
                    bstride = mcux * fh_
                    for by in range(fv_):
                        for bx in range(fh_):
                            blks.append(
                                (ci, (my * fv_ + by) * bstride + mx * fh_ + bx)
                            )
                yield blks

    # 1. DC first, Al=1, interleaved
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    wri = _ProgScanWriter(flat, restart_interval)
    preds = [0] * ncomp
    for blks in mcu_order():
        if wri.unit_boundary():
            preds = [0] * ncomp
        for ci, bi in blks:
            v = int(comps[ci][bi][0]) >> 1  # arithmetic shift, like decode
            diff = v - preds[ci]
            preds[ci] = v
            size, amp = _magnitude(diff)
            code, length = dc_codes[size]
            wri.bw.write(code, length)
            if size:
                wri.bw.write(amp, size)
    out += wri.finish()
    # 2. DC refine (Ah=1 -> Al=0): one raw bit per block, MCU order
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    wri = _ProgScanWriter(flat, restart_interval)
    for blks in mcu_order():
        wri.unit_boundary()
        for ci, bi in blks:
            wri.bw.write(int(comps[ci][bi][0]) & 1, 1)
    out += wri.finish()
    # 3. per-component AC scans over the component's OWN block grid
    for ci in range(ncomp):
        fh_, fv_ = factors[ci]
        cw = -(-w * fh_ // hmax)
        ch = -(-h * fv_ // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        bstride = mcux * fh_
        grid = [(by * bstride + bx) for by in range(nby) for bx in range(nbx)]
        for ss, se, ah, al in ((1, 5, 0, 1), (6, 63, 0, 1), (1, 63, 1, 0)):
            out += sos([ci + 1], ss, se, ah, al)
            wri = _ProgScanWriter(flat, restart_interval)
            for bi in grid:
                wri.unit_boundary()
                if ah == 0:
                    _enc_ac_first_block(wri, comps[ci][bi], ss, se, al)
                else:
                    _enc_ac_refine_block(wri, comps[ci][bi], ss, se, al)
            out += wri.finish()


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 to baseline JFIF.

    ``subsample=False`` (default) writes 4:4:4 so decode error is
    bounded by quantization alone; ``subsample=True`` writes 4:2:0
    (chroma 2x2-mean downsampled) — the dominant layout in web corpora,
    and the path that exercises the decoder's multi-block-MCU +
    upsampling code. ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (baseline) / units (progressive scans).
    ``progressive=True`` writes SOF2 with a spectral-selection +
    successive-approximation scan script (see _encode_progressive);
    the DCT coefficients are IDENTICAL to the baseline encoding of the
    same image, so progressive and baseline decodes must agree
    pixel-exactly — the differential the tests pin."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if gray:
        factors = [(1, 1)]
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            factors = [(2, 2), (1, 1), (1, 1)]
            # pad to even dims, then 2x2 mean-pool the chroma planes
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-grid size
    padded = []
    for (fh_, fv_), p in zip(factors, planes):
        th, tw = mcuy * fv_ * 8, mcux * fh_ * 8
        padded.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            )
        )
    planes = padded

    ql = scale_qtable(QTABLE_LUMA, quality)
    qc = scale_qtable(QTABLE_CHROMA, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: zig-zag order on the wire
    out += _seg(0xDB, b"\x00" + bytes(int(x) for x in ql[ZIGZAG]))
    if not gray:
        out += _seg(0xDB, b"\x01" + bytes(int(x) for x in qc[ZIGZAG]))
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        fh_, fv_ = factors[cid - 1]
        tq = 0 if cid == 1 else 1
        sof += struct.pack(">BBB", cid, (fh_ << 4) | fv_, tq)
    out += _seg(0xC2 if progressive else 0xC0, sof)
    if progressive:
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        comps = []
        for i, p in enumerate(planes):
            comps.append(_forward_blocks(p, ql if i == 0 else qc))
        _encode_progressive(
            out, comps, factors, mcux, mcuy, h, w, gray, restart_interval
        )
        out += b"\xff\xd9"
        return bytes(out)
    # DHT
    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([tc_th] + bits + vals))

    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    comps = []
    for i, p in enumerate(planes):
        q = ql if i == 0 else qc
        comps.append(_forward_blocks(p, q))
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu_i = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(comps)
            for ci, coefs in enumerate(comps):
                fh_, fv_ = factors[ci]
                bstride = mcux * fh_
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(fv_):
                    for bx in range(fh_):
                        bi = (my * fv_ + by) * bstride + mx * fh_ + bx
                        preds[ci] = _encode_blocks(
                            bw, coefs[bi : bi + 1], dc, ac, preds[ci]
                        )
            mcu_i += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                    self.pos += 2
                else:
                    return self.nbits > 0  # marker: stop
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        if self.nbits == 0:
            raise EOFError
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits >= n:  # fast path: one window extract
            self.nbits -= n
            return (self.acc >> self.nbits) & ((1 << n) - 1)
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self) -> None:
        """Drop partial byte, consume an RSTn marker if present."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


def _decode_huff(br: _BitReader, table: _HuffTable) -> int:
    if br.nbits < 8:
        br._fill()
    if br.nbits >= 8:
        hit = table.lut8[(br.acc >> (br.nbits - 8)) & 0xFF]
        if hit is not None:
            br.nbits -= hit[1]
            return hit[0]
    # long code, or near segment end: per-bit walk on the map
    code = 0
    m = table.map
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = m.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(b: bytes):
    """Baseline JFIF -> (w, h, HxWx3 uint8) or None if not a decodable
    baseline JPEG. Never raises on malformed input — returns None (the
    sniffing contract shared by _decode_ppm/_decode_bmp/_decode_png)."""
    try:
        return _decode_jpeg_strict(b)
    except Exception:
        return None


def _decode_jpeg_strict(b: bytes):
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    store: dict[int, np.ndarray] | None = None
    restart_interval = 0
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        data = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(data[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(data[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    return None
                raster = np.zeros(64, np.int64)
                raster[ZIGZAG] = tbl  # wire order is zig-zag
                qtables[tq] = raster
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8 or fh == 0 or fw == 0 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps, "prog": marker == 0xC2}
            if frame["prog"]:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-fw // (8 * hmax))
                mcuy = -(-fh // (8 * vmax))
                frame["grid"] = (hmax, vmax, mcux, mcuy)
                store = {
                    c["id"]: np.zeros((mcuy * c["v"] * mcux * c["h"], 64), np.int64)
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = data[0]
            scan = []
            for i in range(ns):
                cs, tdta = data[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            if not frame["prog"]:
                if ns != len(frame["comps"]) or (ss, se, ahal) != (0, 63, 0):
                    return None  # baseline is one full interleaved scan
                return _decode_scan(
                    b, pos, frame, scan, qtables, htables, restart_interval
                )
            pos = _decode_prog_scan(
                b, pos, frame, scan, ss, se, ahal >> 4, ahal & 0xF,
                htables, store, restart_interval,
            )
        # else: APPn/COM/etc: skip
    if frame is not None and frame.get("prog") and store:
        hmax, vmax, mcux, mcuy = frame["grid"]
        planes = [
            (c, store[c["id"]]) for c in frame["comps"]
        ]
        return _reconstruct(frame, planes, qtables, hmax, vmax, mcux, mcuy)
    return None


def _decode_scan(b, pos, frame, scan, qtables, htables, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax not in (1, 2, 4) or vmax not in (1, 2, 4):
        return None
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    # per-component quantized coefficient store
    store = []
    for c, _, _ in scan:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        store.append(np.zeros((bh * bw, 64), np.int64))
    br = _BitReader(b, pos)
    preds = [0] * len(scan)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.align_and_skip_rst()
                preds = [0] * len(scan)
            for ci, (c, td, ta) in enumerate(scan):
                dc_tbl = htables[(0, td)]
                ac_tbl = htables[(1, ta)]
                bw = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = store[ci][
                            (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        ]
                        # DC
                        size = _decode_huff(br, dc_tbl)
                        diff = _extend(br.read_bits(size), size)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        # AC
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            blk[k] = _extend(br.read_bits(s), s)
                            k += 1
            mcu_i += 1
    comp_stores = [(c, store[ci]) for ci, (c, _, _) in enumerate(scan)]
    return _reconstruct(frame, comp_stores, qtables, hmax, vmax, mcux, mcuy)


def _reconstruct(frame, comp_stores, qtables, hmax, vmax, mcux, mcuy):
    """(comp, zig-zag coef blocks) per component -> (w, h, RGB image):
    dequantize + batched IDCT + upsample + color convert. Shared by the
    baseline single-scan path and the progressive multi-scan path."""
    fh, fw = frame["h"], frame["w"]
    planes = []
    for c, blocks in comp_stores:
        q = qtables[c["tq"]]
        coefs = blocks[:, np.argsort(ZIGZAG)]  # zig-zag -> raster
        deq = (coefs * q).astype(np.float64).reshape(-1, 8, 8)
        px = np.einsum("xu,nuv,yv->nxy", _A.T, deq, _A.T) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid
        if c["h"] != hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        img = np.repeat(gray[:, :, None], 3, axis=2)
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        img = np.clip(
            np.round(np.stack([r, g, bl], axis=2)), 0, 255
        ).astype(np.uint8)
    return fw, fh, np.ascontiguousarray(img)


def _next_marker(b: bytes, pos: int) -> int:
    """Byte offset of the next real marker (skips entropy bytes, FF00
    stuffing, and stray RSTn) at or after pos."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] != 0xFF:
            pos += 1
        elif b[pos + 1] == 0x00:
            pos += 2
        elif 0xD0 <= b[pos + 1] <= 0xD7:
            pos += 2
        elif b[pos + 1] == 0xFF:  # fill byte
            pos += 1
        else:
            return pos
    return n


def _decode_prog_scan(
    b, pos, frame, scan, ss, se, ah, al, htables, store, restart_interval
):
    """One progressive scan (T.81 G.2): DC/AC, first/refinement, into
    the per-component zig-zag coefficient store. Returns the byte
    offset of the marker that follows the scan's entropy data."""
    hmax, vmax, mcux, mcuy = frame["grid"]
    fh, fw = frame["h"], frame["w"]
    ns = len(scan)
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC")
    if ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    br = _BitReader(b, pos)
    preds = [0] * ns
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def units():
        """Decoding units: MCUs (interleaved) or single blocks (ns=1,
        the component's OWN grid, not the MCU-padded one — T.81 A.2.2)."""
        if ns > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    blks = []
                    for ci, (c, _, _) in enumerate(scan):
                        bw = mcux * c["h"]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blks.append(
                                    (
                                        ci,
                                        store[c["id"]][
                                            (my * c["v"] + by) * bw
                                            + (mx * c["h"] + bx)
                                        ],
                                    )
                                )
                    yield blks
        else:
            c = scan[0][0]
            cw = -(-fw * c["h"] // hmax)
            ch = -(-fh * c["v"] // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            bw = mcux * c["h"]
            for by in range(nby):
                for bx in range(nbx):
                    yield [(0, store[c["id"]][by * bw + bx])]

    unit_i = 0
    for blks in units():
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            br.align_and_skip_rst()
            preds = [0] * ns
            eobrun = 0
        for ci, blk in blks:
            c, td, ta = scan[ci]
            if ss == 0 and ah == 0:  # DC first
                size = _decode_huff(br, htables[(0, td)])
                diff = _extend(br.read_bits(size), size)
                preds[ci] += diff
                blk[0] = preds[ci] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if br.read_bit():
                    blk[0] |= p1
            elif ah == 0:  # AC first
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                ac_tbl = htables[(1, ta)]
                while k <= se:
                    rs = _decode_huff(br, ac_tbl)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC overflow")
                    blk[int(k)] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # AC refinement (T.81 G.2 / libjpeg decode_mcu_AC_refine)
                ac_tbl = htables[(1, ta)]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_huff(br, ac_tbl)
                        r, s = rs >> 4, rs & 0xF
                        if s:
                            if s != 1:
                                raise ValueError("bad refinement size")
                            s = p1 if br.read_bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        # advance past r zero-history coefficients,
                        # correcting every nonzero-history one en route
                        while k <= se:
                            coef = int(blk[k])
                            if coef != 0:
                                if br.read_bit() and (coef & p1) == 0:
                                    blk[k] = coef + (p1 if coef >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if s and k <= se:
                            blk[int(k)] = s
                        k += 1
                if eobrun > 0:  # EOB run covers this block's remainder
                    while k <= se:
                        coef = int(blk[k])
                        if coef != 0 and br.read_bit() and (coef & p1) == 0:
                            blk[k] = coef + (p1 if coef >= 0 else m1)
                        k += 1
                    eobrun -= 1
        unit_i += 1
    return _next_marker(b, br.pos)
