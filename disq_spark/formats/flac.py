"""FLAC codec in numpy + stdlib — no external audio libraries.

Audio corpora for multimodal training are WAV/FLAC/MP3-dominated; WAV
already decodes for real (stdlib ``wave``), this adds lossless FLAC so
the multimodal audio path covers the dominant lossless format. Decode
implements the full frame layer of the public spec (RFC 9639 / the
xiph.org format document):

- STREAMINFO metadata (incl. the raw-PCM MD5, verified when set),
  other metadata blocks skipped.
- frames: 14-bit sync, UTF-8 frame number, all block-size/sample-rate
  code forms, CRC-8 header check, CRC-16 frame check.
- channel assignments: independent, left/side, right/side, mid/side
  (side channel carries the +1 bit sample size).
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + signed shift), wasted-bits unary prefix.
- residuals: partitioned Rice, both 4-bit (method 0) and 5-bit
  (method 1) parameter widths, escape-to-raw partitions.

The encoder (for tests/gates — this container has no flac binary to
cross-check against, which is the same posture as formats/gif.py) uses
FIXED predictors with per-block best-order selection, per-partition
Rice parameters, and mid-side stereo when it is smaller; every encoded
stream round-trips bit-exactly to the input PCM and both CRCs + the
STREAMINFO MD5 are computed per spec, so a conforming external decoder
has three independent integrity anchors to flag any divergence.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc_table(poly: int, width: int) -> list[int]:
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(_CRC8_POLY, 8)
_CRC16_TABLE = _make_crc_table(_CRC16_POLY, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        while n > 0:
            if self.bytepos >= len(d):
                raise EOFError("flac: bitstream exhausted")
            avail = 8 - self.bitpos
            take = min(n, avail)
            byte = d[self.bytepos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= (1 << (n - 1)):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _read_utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _write_utf8_number(out: bytearray, v: int) -> None:
    if v < 0x80:
        out.append(v)
        return
    # same shape as UTF-8 multi-byte sequences, up to 7 bytes
    tmp = []
    n_extra = 1
    while v >= (1 << (6 * n_extra + (6 - n_extra))):
        n_extra += 1
    for _ in range(n_extra):
        tmp.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (7 - n_extra)) & 0xFF | v
    out.append(lead)
    out.extend(reversed(tmp))


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_read(br: _Bits, param: int) -> int:
    q = br.read_unary()
    u = (q << param) | (br.read(param) if param else 0)
    return (u >> 1) ^ -(u & 1)  # unfold zigzag


def _read_residual(br: _Bits, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError("flac: unknown residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("flac: partition order does not divide block size")
    out = np.empty(block_size - order, np.int64)
    idx = 0
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                out[idx + i] = _rice_read(br, param)
        idx += n
    return out


def _decode_subframe(br: _Bits, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(block_size, v, np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(block_size)], np.int64)
    elif 8 <= t <= 12:  # FIXED order t-8
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif t >= 32:  # LPC order t-31
        order = t - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out = out << wasted
    return out


_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(b: bytes):
    """(sample_rate, n_channels, (n, ch) int32 samples, bits_per_sample)
    or None if not FLAC. Raises ValueError on corrupt frames / CRC
    mismatches."""
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            info = body
        if last:
            break
    if info is None or len(info) < 34:
        return None
    sr = (info[10] << 12) | (info[11] << 4) | (info[12] >> 4)
    nch = ((info[12] >> 1) & 0x7) + 1
    bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    total = ((info[13] & 0x0F) << 32) | struct.unpack(">I", info[14:18])[0]
    md5_expect = info[18:34]
    if sr == 0:
        return None
    channels: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(nch)]
    got = 0
    while pos < len(b) and (total == 0 or got < total):
        frame_start = pos
        br = _Bits(b, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError("flac: reserved sample size code")
        hdr_end = br.bytepos + (1 if br.bitpos else 0)
        if _crc8(b[frame_start:hdr_end]) != b[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br = _Bits(b, hdr_end + 1)
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("flac: channel count mismatch")
            subs = [_decode_subframe(br, bs, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("flac: stereo decorrelation on non-stereo stream")
            extra0 = 1 if ch_code == 9 else 0
            extra1 = 1 if ch_code in (8, 10) else 0
            a = _decode_subframe(br, bs, fbps + extra0)
            c = _decode_subframe(br, bs, fbps + extra1)
            if ch_code == 8:  # left/side
                subs = [a, a - c]
            elif ch_code == 9:  # right/side: a is side, c is right
                subs = [a + c, c]
            else:  # mid/side
                side = c
                m = (a << 1) | (side & 1)
                subs = [(m + side) >> 1, (m - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        br.align()
        crc_pos = br.bytepos
        if _crc16(b[frame_start:crc_pos]) != struct.unpack(
            ">H", b[crc_pos : crc_pos + 2]
        )[0]:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = crc_pos + 2
        for ci in range(nch):
            channels[ci] = np.concatenate([channels[ci], subs[ci]])
        got += bs
    samples = np.stack(channels, axis=1)
    if total:
        samples = samples[:total]
    if md5_expect != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(samples, bps)).digest() != md5_expect:
            raise ValueError("flac: decoded PCM does not match STREAMINFO MD5")
    return sr, nch, samples.astype(np.int32), bps


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Channel-interleaved little-endian PCM, the STREAMINFO MD5 input."""
    if bps == 16:
        return samples.astype("<i2").tobytes()
    if bps == 8:
        return samples.astype("i1").tobytes()
    if bps == 24:
        b32 = samples.astype("<i4").tobytes()
        arr = np.frombuffer(b32, np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    raise ValueError(f"unsupported bps {bps}")


def _rice_cost(res: np.ndarray, param: int) -> int:
    u = (res << 1) ^ (res >> 63)
    return int((u >> param).sum()) + len(res) * (1 + param)


def _best_rice(res: np.ndarray, max_param: int = 30) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(res, 0)
    for p in range(1, max_param + 1):
        c = _rice_cost(res, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_rice(bw: _BitsW, res: np.ndarray, param: int) -> None:
    for v in res:
        u = (int(v) << 1) ^ (int(v) >> 63)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitsW, x: np.ndarray, bps: int, as_lpc: bool = False) -> None:
    bw.write(0, 1)  # padding
    # wasted-bits detection: shared low zero bits move to the unary
    # prefix and shrink every sample/warmup/residual field
    orv = int(np.bitwise_or.reduce(x))
    wasted = 0
    if orv:
        while wasted < bps - 1 and not (orv >> wasted) & 1:
            wasted += 1
    if np.all(x == x[0]):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    if wasted:
        x = x >> wasted
        bps -= wasted
    # pick the FIXED order with the smallest residual-abs-sum (the
    # standard heuristic), orders 0-2
    best = None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        cost = int(np.abs(res).sum())
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, _ = best
    if as_lpc and order > 0:
        # emit the fixed predictor AS an LPC subframe (integer coefs,
        # shift 0): same residuals, exercises the general LPC decode
        bw.write(32 + order - 1, 6)
    else:
        as_lpc = False
        bw.write(8 + order, 6)  # FIXED
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    for i in range(order):
        bw.write(int(x[i]), bps)
    if as_lpc:
        bw.write(15 - 1, 4)  # qlp precision 15
        bw.write(0, 5)  # shift 0
        for c in _FIXED_COEFS[order]:
            bw.write(c, 15)
    res = res.astype(np.int64)
    param, _ = _best_rice(res)
    # method 0 fits params <= 14; larger residuals use rice2 (5-bit)
    method, pbits, escape = (0, 4, 15) if param <= 14 else (1, 5, 31)
    bw.write(method, 2)
    bw.write(0, 4)  # one partition
    bw.write(param, pbits)
    _write_rice(bw, res, param)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    try_mid_side: bool = True,
    as_lpc: bool = False,
) -> bytes:
    """(n,) or (n, ch) int PCM -> FLAC bytes (FIXED predictors, Rice
    residuals, optional mid-side for stereo, spec CRCs + PCM MD5)."""
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    if not (1 <= nch <= 8):
        raise ValueError("flac: 1-8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError(f"flac: samples exceed {bps}-bit range")
    out = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    info += bytes(
        [
            (sample_rate >> 12) & 0xFF,
            (sample_rate >> 4) & 0xFF,
            ((sample_rate & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        ]
    )
    info += struct.pack(">I", n & 0xFFFFFFFF)
    info += hashlib.md5(_pcm_bytes(samples, bps)).digest()
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = len(blk)
        hdr = bytearray()
        bw_h = _BitsW()
        bw_h.write(0x3FFE, 14)
        bw_h.write(0, 1)
        bw_h.write(0, 1)  # fixed blocksize strategy
        bw_h.write(7, 4)  # blocksize: 16-bit field follows
        bw_h.write(0, 4)  # sample rate: from STREAMINFO
        chans = blk.T
        ch_code = nch - 1
        use_ms = False
        if try_mid_side and nch == 2:
            left, right = chans[0], chans[1]
            side = left - right
            if int(np.abs(np.diff(side)).sum()) < int(np.abs(np.diff(right)).sum()):
                use_ms = True
                ch_code = 10
        bw_h.write(ch_code, 4)
        bw_h.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw_h.write(0, 1)
        bw_h.align()
        hdr += bw_h.buf
        _write_utf8_number(hdr, frame_no)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        body = _BitsW()
        if use_ms:
            left, right = chans[0], chans[1]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(body, mid, bps, as_lpc)
            _encode_subframe(body, side, bps + 1, as_lpc)
        else:
            for ci in range(nch):
                _encode_subframe(body, chans[ci], bps, as_lpc)
        body.align()
        frame = bytes(hdr) + bytes(body.buf)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
