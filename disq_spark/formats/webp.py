"""WebP-lossless (VP8L) codec in numpy + stdlib — no libwebp/PIL.

Web image corpora carry a growing WebP share; this decodes the
LOSSLESS profile (VP8L, the fully-public format documented in the
"WebP Lossless Bitstream Specification"), completing the real image
tier next to JPEG (baseline+progressive), PNG (incl. Adam7), GIF, and
PPM/BMP. Lossy WebP (VP8 intra-frame) stays stubbed.

Decoder coverage:
- RIFF/WEBP envelope, VP8L chunk, LSB-first bitstream.
- all four transforms, applied in reverse encode order: PREDICTOR (all
  14 spatial modes with the spec's edge rules), COLOR (per-block signed
  ColorTransformDelta multipliers), SUBTRACT_GREEN, COLOR_INDEXING
  (palette with delta coding and sub-byte pixel bundling for <=16
  colors).
- entropy layer: canonical prefix codes — both the "simple" 1/2-symbol
  form and the full form (code-length code over the spec's reorder
  table, 16/17/18 repeat ops, optional max_symbol cap), meta-prefix
  group images, LZ77 backward references with the 40-code prefix
  scheme and the 120-entry 2D distance neighborhood map, and the
  hash-indexed color cache.

The encoder exists for tests/gates (no libwebp in this container — the
same posture as formats/gif.py): literals + optional RLE backrefs +
color cache under one prefix group, with every transform emittable
(constant-mode predictor blocks, constant color multipliers,
subtract-green, palette incl. bundling), so each inverse-transform and
entropy path is exercised end-to-end by round-trip property tests.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbReader:
    """LSB-first bit reader (VP8L convention, opposite of JPEG)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise EOFError("vp8l: bitstream exhausted")
        byte_i = self.pos >> 3
        window = int.from_bytes(self.data[byte_i : byte_i + (n + 15) // 8 + 1], "little")
        v = (window >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return v


class _LsbWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.buf = bytearray()

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


# canonical prefix codes, VP8L/DEFLATE style: shorter codes first, ties
# by symbol order; codes are read LSB-first so we store reversed codes
def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_value_msbfirst, length)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixTree:
    """Decode table for a canonical prefix code (bit-by-bit walk —
    simple and adequate for test-scale payloads)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        self.table = {}
        for s, (code, l) in _canonical_codes(lengths).items():
            self.table[(l, code)] = s

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, 16):
            code = (code << 1) | br.read(1)
            s = self.table.get((l, code))
            if s is not None:
                return s
        raise ValueError("vp8l: invalid prefix code")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixTree:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # degenerate: zero bits consumed on read
            t = _PrefixTree(lengths)
            t.single = sym0
            return t
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixTree(lengths)
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixTree(clc_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _PrefixTree(lengths)


def _prefix_decode_extra(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix value (spec 'prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# The 120-entry (dx, dy) distance-code neighborhood. The spec lists it
# as a literal table; it follows an exact ordering law — all causal
# offsets with y in [0, 8], x in [-8, 8], sorted by squared euclidean
# distance, ties broken by larger y then larger x — which reproduces
# the spec table (cross-checked entry-for-entry against the published
# prefix). dx > 0 means LEFT of the current pixel (scan-order past),
# so dist = dy * width + dx is positive for every entry.
_DIST_MAP = sorted(
    [(x, y) for y in range(0, 9) for x in range(-8, 9) if (y > 0 or x > 0)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)[:120]


def _plane_dist(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * w + dx
    return max(d, 1)


_CACHE_MUL = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _LsbReader, w: int, h: int, is_level0: bool):
    """Spatially-coded ARGB image (the spec's 'decode image stream'
    minus the transform layer). Returns flat list of uint32 ARGB."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_px = _decode_entropy_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta) + 1
    cache_syms = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_syms)
        r = _read_prefix_code(br, 256)
        bl = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, bl, a, d))
    out = [0] * (w * h)
    pos = 0
    total = w * h
    mw = -(-w // (1 << meta_bits)) if meta is not None else 0
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g, r, bl, a, d = groups[gi]
        else:
            g, r, bl, a, d = groups[0]
        s = g.read(br)
        if s < 256:
            red = r.read(br)
            blue = bl.read(br)
            alpha = a.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _prefix_decode_extra(br, s - 256)
            dcode = d.read(br)
            dist = _plane_dist(_prefix_decode_extra(br, dcode), w)
            if dist > pos or pos + length > total:
                raise ValueError("vp8l: backref out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _sel(l: int, t: int, tl: int) -> int:
    def ch(v, s):
        return (v >> s) & 0xFF

    p_sum = 0
    for s in (24, 16, 8, 0):
        p = ch(l, s) + ch(t, s) - ch(tl, s)
        p_sum += abs(p - ch(l, s)) - abs(p - ch(t, s))
    return l if p_sum <= 0 else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        v = ((l >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
        out |= max(0, min(255, v)) << s
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for s in (24, 16, 8, 0):
        a = (ave >> s) & 0xFF
        c = (tl >> s) & 0xFF
        v = a + (a - c) // 2 if False else a + ((a - c) >> 1)
        out |= max(0, min(255, v)) << s
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _sel(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"vp8l: predictor mode {mode}")


def _add_px(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _ct_delta(a: int, b: int) -> int:
    """((int8)a * (int8)b) >> 5, arithmetic."""
    sa = a - 256 if a >= 128 else a
    sb = b - 256 if b >= 128 else b
    return (sa * sb) >> 5


def decode_webp(b: bytes):
    """(w, h, HxWx3 uint8 RGB) for a lossless (VP8L) WebP, or None if
    not one (incl. lossy VP8/VP8X-animation, which need libwebp)."""
    try:
        return _decode_webp_strict(b)
    except Exception:
        return None


def _decode_webp_strict(b: bytes):
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    pos = 12
    payload = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        if tag == b"VP8L":
            payload = b[pos + 8 : pos + 8 + ln]
            break
        pos += 8 + ln + (ln & 1)
    if payload is None or payload[0] != 0x2F:
        return None
    br = _LsbReader(payload, 8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: bad version")
    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color
            size_bits = br.read(3) + 2
            bw = -(-xsize // (1 << size_bits))
            bh = -(-h // (1 << size_bits))
            sub = _decode_entropy_image(br, bw, bh, False)
            transforms.append((ttype, size_bits, sub))
        elif ttype == 2:
            transforms.append((2, 0, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_px = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded
            pal = []
            prev = 0
            for p in pal_px:
                prev = _add_px(prev, p)
                pal.append(prev)
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            transforms.append((3, xbits, pal))
            xsize = -(-xsize // (1 << xbits))
    px = _decode_entropy_image(br, xsize, h, True)
    img = np.array(px, np.uint32).reshape(h, xsize)
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:  # color indexing
            xbits, pal = p1, p2
            if xbits:
                per = 1 << xbits
                ibits = 8 >> xbits
                idx = (img >> 8) & 0xFF  # green channel holds the index
                cols = []
                for sub in range(per):
                    cols.append((idx >> (sub * ibits)) & ((1 << ibits) - 1))
                wide = np.stack(cols, axis=2).reshape(h, -1)[:, :w]
            else:
                wide = (img >> 8) & 0xFF
                wide = wide[:, :w]
            if int(wide.max(initial=0)) >= len(pal):
                raise ValueError("vp8l: palette index out of range")
            lut = np.array(pal, np.uint32)
            img = lut[wide]
        elif ttype == 2:  # subtract green
            g = (img >> 8) & 0xFF
            r = (((img >> 16) & 0xFF) + g) & 0xFF
            bl = ((img & 0xFF) + g) & 0xFF
            img = (img & 0xFF00FF00) | (r << 16) | bl
        elif ttype == 1:  # color transform (inverse)
            size_bits, sub = p1, p2
            bw = -(-img.shape[1] // (1 << size_bits))
            out = img.copy()
            hh, ww = img.shape
            for y in range(hh):
                for x in range(ww):
                    elem = sub[(y >> size_bits) * bw + (x >> size_bits)]
                    g2r = elem & 0xFF
                    g2b = (elem >> 8) & 0xFF
                    r2b = (elem >> 16) & 0xFF
                    v = int(out[y, x])
                    g = (v >> 8) & 0xFF
                    r = ((v >> 16) & 0xFF) + _ct_delta(g2r, g)
                    r &= 0xFF
                    bl = (v & 0xFF) + _ct_delta(g2b, g)
                    bl = (bl + _ct_delta(r2b, r)) & 0xFF
                    out[y, x] = (v & 0xFF00FF00) | (r << 16) | bl
            img = out
        else:  # predictor (inverse)
            size_bits, sub = p1, p2
            bw = -(-img.shape[1] // (1 << size_bits))
            hh, ww = img.shape
            out = np.zeros_like(img)
            for y in range(hh):
                for x in range(ww):
                    res = int(img[y, x])
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(out[0, x - 1])  # top row: L
                    elif x == 0:
                        pred = int(out[y - 1, 0])  # left col: T
                    else:
                        mode = (sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
                        l = int(out[y, x - 1])
                        t = int(out[y - 1, x])
                        tl = int(out[y - 1, x - 1])
                        # rightmost column: TR wraps to the leftmost
                        # pixel of the CURRENT row (libwebp's top[1]
                        # aliases argb[y*w] in the flat plane)
                        tr = int(out[y - 1, x + 1]) if x + 1 < ww else int(out[y, 0])
                        pred = _predict(mode, l, t, tr, tl)
                    out[y, x] = _add_px(res, pred)
            img = out
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    bl = (img & 0xFF).astype(np.uint8)
    return w, h, np.ascontiguousarray(np.stack([r, g, bl], axis=2))


# ---------------------------------------------------------------------------
# Encoder (tests/gates; see module docstring)
# ---------------------------------------------------------------------------


def _flat_lengths(freq: dict[int, int], alphabet: int) -> list[int]:
    """COMPLETE canonical code lengths (Kraft sum exactly 1): nused
    symbols at depths L-1/L. Compression-naive, validity-exact."""
    syms = sorted(freq)
    nused = len(syms)
    lengths = [0] * alphabet
    if nused == 1:
        lengths[syms[0]] = 1
        return lengths
    L = (nused - 1).bit_length()
    k = (1 << L) - nused
    ordered = sorted(syms, key=lambda s: (-freq[s], s))
    for i, s in enumerate(ordered):
        lengths[s] = (L - 1) if i < k and L > 1 else L
    return lengths


def _write_prefix_code(bw: _LsbWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit the code definition; return symbol -> (code, length) for
    the payload writer (codes MSB-first as _PrefixTree reads them)."""
    nz = [s for s, l in enumerate(lengths) if l]
    if len(nz) == 0:
        nz = [0]
        lengths = list(lengths)
        lengths[0] = 1
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] <= 1 and len(nz) == 1:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}
    bw.write(0, 1)  # full form
    # run-length the length sequence with ops 16/17/18
    ops: list[tuple[int, int, int]] = []  # (op_symbol, extra_val, extra_bits)
    i = 0
    prev_nz = 8
    n = len(lengths)
    while i < n:
        l = lengths[i]
        j = i
        while j < n and lengths[j] == l:
            j += 1
        run = j - i
        if l == 0:
            while run >= 11:
                take = min(run, 138)
                ops.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                ops.append((17, take - 3, 3))
                run -= take
            ops.extend((0, 0, 0) for _ in range(run))
        else:
            ops.append((l, 0, 0))
            run -= 1
            if l == prev_nz or True:
                pass
            prev_nz = l
            while run >= 3:
                take = min(run, 6)
                ops.append((16, take - 3, 2))
                run -= take
            ops.extend((l, 0, 0) for _ in range(run))
        i = j
    clc_freq: dict[int, int] = {}
    for s, _, _ in ops:
        clc_freq[s] = clc_freq.get(s, 0) + 1
    clc_lengths = _flat_lengths(clc_freq, 19)
    # num_clc must cover every used symbol's position in _CLC_ORDER
    used_pos = max(_CLC_ORDER.index(s) for s in clc_freq)
    num_clc = max(4, used_pos + 1)
    bw.write(num_clc - 4, 4)
    for i2 in range(num_clc):
        bw.write(clc_lengths[_CLC_ORDER[i2]], 3)
    clc_codes = _canonical_codes(clc_lengths)
    bw.write(0, 1)  # no max_symbol
    for s, ev, eb in ops:
        c, cl = clc_codes[s]
        _write_code_msb(bw, c, cl)
        if eb:
            bw.write(ev, eb)
    return _canonical_codes(lengths)


def _write_code_msb(bw: _LsbWriter, code: int, length: int) -> None:
    """Prefix codes are read bit-by-bit MSB-of-code-first."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _prefix_encode_val(v: int) -> tuple[int, int, int]:
    """inverse of _prefix_decode_extra: value -> (code, extra, n_extra)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        lo = ((2 + (code & 1)) << extra) + 1
        if lo <= v <= lo + (1 << extra) - 1:
            return code, v - lo, extra
    raise ValueError(f"value {v} out of prefix range")


def _encode_entropy_image(
    bw: _LsbWriter,
    pixels: list[int],
    w: int,
    is_level0: bool,
    cache_bits: int = 0,
    rle: bool = False,
    use_2d_dist: bool = False,
) -> None:
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)  # no meta prefix image
    # plan the event stream (mirrors the decoder's cache updates)
    events: list[tuple] = []
    cache: dict[int, int] = {}
    i = 0
    n = len(pixels)
    while i < n:
        if rle and i > 0:
            j = i
            while j < n and pixels[j] == pixels[i - 1]:
                j += 1
            if j - i >= 4:
                length = j - i
                events.append(("ref", length, 1))
                if cache_bits:
                    for t in range(i, j):
                        cache[_cache_key(pixels[t], cache_bits)] = pixels[t]
                i = j
                continue
        px = pixels[i]
        if cache_bits:
            k = _cache_key(px, cache_bits)
            if cache.get(k) == px:
                events.append(("cache", k))
                i += 1
                continue
            cache[k] = px
        events.append(("lit", px))
        i += 1
    # histograms
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d, s):
        d[s] = d.get(s, 0) + 1

    def dist_value(dist: int) -> int:
        if use_2d_dist:
            for v in range(1, 121):
                if _plane_dist(v, w) == dist:
                    return v
        return dist + 120

    for ev in events:
        if ev[0] == "lit":
            px = ev[1]
            bump(gf, (px >> 8) & 0xFF)
            bump(rf, (px >> 16) & 0xFF)
            bump(bf, px & 0xFF)
            bump(af, (px >> 24) & 0xFF)
        elif ev[0] == "ref":
            lc, _, _ = _prefix_encode_val(ev[1])
            bump(gf, 256 + lc)
            dc, _, _ = _prefix_encode_val(dist_value(ev[2]))
            bump(df, dc)
        else:
            bump(gf, 280 + ev[1])
    cache_syms = (1 << cache_bits) if cache_bits else 0
    g_codes = _write_prefix_code(bw, _flat_lengths(gf, 256 + 24 + cache_syms))
    r_codes = _write_prefix_code(bw, _flat_lengths(rf, 256))
    b_codes = _write_prefix_code(bw, _flat_lengths(bf, 256))
    a_codes = _write_prefix_code(bw, _flat_lengths(af, 256))
    d_codes = _write_prefix_code(bw, _flat_lengths(df, 40))

    def emit(codes, s):
        c, l = codes[s]
        _write_code_msb(bw, c, l)

    for ev in events:
        if ev[0] == "lit":
            px = ev[1]
            emit(g_codes, (px >> 8) & 0xFF)
            emit(r_codes, (px >> 16) & 0xFF)
            emit(b_codes, px & 0xFF)
            emit(a_codes, (px >> 24) & 0xFF)
        elif ev[0] == "ref":
            lc, lv, lb = _prefix_encode_val(ev[1])
            emit(g_codes, 256 + lc)
            if lb:
                bw.write(lv, lb)
            dc, dv, db = _prefix_encode_val(dist_value(ev[2]))
            emit(d_codes, dc)
            if db:
                bw.write(dv, db)
        else:
            emit(g_codes, 280 + ev[1])


def _sub_px(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    color: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
    use_2d_dist: bool = False,
    size_bits: int = 3,
) -> bytes:
    """HxWx3 (or HxW gray) uint8 -> lossless WebP. Transform knobs map
    one-to-one onto the decoder's inverse paths; ``palette`` is
    mutually exclusive with the pixel-space transforms."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    argb = (
        (0xFF << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).astype(np.uint32)
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    plane = argb.copy()
    xsize = w
    if palette:
        if subtract_green or predictor is not None or color is not None:
            raise ValueError("palette is exclusive with pixel transforms")
        colors, inv = np.unique(plane.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette needs <= 256 colors")
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        deltas = []
        prev = 0
        for c in colors.tolist():
            deltas.append(_sub_px(int(c), prev))
            prev = int(c)
        _encode_entropy_image(bw, deltas, n_colors, False)
        idx = inv.reshape(h, w).astype(np.uint32)
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        if xbits:
            per = 1 << xbits
            ibits = 8 >> xbits
            xsize = -(-w // per)
            packed = np.zeros((h, xsize), np.uint32)
            for sub in range(per):
                col = idx[:, sub::per]
                packed[:, : col.shape[1]] |= col << (sub * ibits)
            plane = (0xFF << 24) | (packed << 8)
        else:
            xsize = w
            plane = (0xFF << 24) | (idx << 8)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            g = (plane >> 8) & 0xFF
            r = (((plane >> 16) & 0xFF) - g) & 0xFF
            bl = ((plane & 0xFF) - g) & 0xFF
            plane = (plane & 0xFF00FF00) | (r << 16) | bl
        if color is not None:
            g2r, g2b, r2b = color
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(size_bits - 2, 3)
            bwb = -(-xsize // (1 << size_bits))
            bhb = -(-h // (1 << size_bits))
            elem = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
            _encode_entropy_image(bw, [elem] * (bwb * bhb), bwb, False)
            out = plane.copy()
            for y in range(h):
                for x in range(xsize):
                    v = int(plane[y, x])
                    g = (v >> 8) & 0xFF
                    true_r = (v >> 16) & 0xFF
                    r = (true_r - _ct_delta(g2r, g)) & 0xFF
                    bl = ((v & 0xFF) - _ct_delta(g2b, g) - _ct_delta(r2b, true_r)) & 0xFF
                    out[y, x] = (v & 0xFF00FF00) | (r << 16) | bl
            plane = out
        if predictor is not None:
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            bwb = -(-xsize // (1 << size_bits))
            bhb = -(-h // (1 << size_bits))
            elem = (0xFF << 24) | (predictor << 8)
            _encode_entropy_image(bw, [elem] * (bwb * bhb), bwb, False)
            out = plane.copy()
            for y in range(h):
                for x in range(xsize):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(plane[0, x - 1])
                    elif x == 0:
                        pred = int(plane[y - 1, 0])
                    else:
                        l = int(plane[y, x - 1])
                        t = int(plane[y - 1, x])
                        tl = int(plane[y - 1, x - 1])
                        tr = int(plane[y - 1, x + 1]) if x + 1 < xsize else int(plane[y, 0])
                        pred = _predict(predictor, l, t, tr, tl)
                    out[y, x] = _sub_px(int(plane[y, x]), pred)
            plane = out
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(
        bw,
        [int(v) for v in plane.reshape(-1)],
        xsize,
        True,
        cache_bits=cache_bits,
        rle=rle,
        use_2d_dist=use_2d_dist,
    )
    payload = b"\x2f" + bw.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
