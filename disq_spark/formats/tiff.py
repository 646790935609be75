"""Baseline TIFF codec in numpy + stdlib — no PIL/libtiff.

Scanned-document and archival corpora are TIFF-heavy; this decodes the
baseline profile (TIFF 6.0): both byte orders, stripped images, 8-bit
grayscale / RGB(A) / palette, compressions 1 (none), 5 (LZW — MSB-first
packing with the spec's early code-width change, unlike GIF's LSB/late
variant in formats/gif.py) and 32773 (PackBits RLE), and the horizontal
differencing predictor (tag 317 = 2). Tiled, multi-IFD (first image
only), 16-bit, and JPEG-in-TIFF return None.

The encoder (tests/gates; same no-external-validator posture as
formats/gif.py) writes single-IFD stripped files in any of the three
compressions, with optional predictor and palette, so every decode path
round-trips pixel-exactly in the property tests.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode_tiff(data: bytes, max_pixels: int) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, 9->12 bit widths with
    the EARLY change (width grows when the next-to-assign code is
    2^width - 1, one step before GIF's), clear=256, EOI=257."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) <= max_pixels:
        if bitpos + width > total_bits:
            break
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "big")
        code = (window >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == EOI:
            break
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: corrupt LZW (first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("tiff: corrupt LZW (code beyond table)")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY change: the decoder's table trails the encoder's
            # next_code by one, so it must grow at 2^width - 2 to stay
            # in step with the encoder's 2^width - 1 trigger (the
            # spec's famous off-by-one that every TIFF writer ships)
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # encoder mirrors the decoder's early change: after
            # assigning, the decoder's table size == next_code - ...
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        else:
            emit(CLEAR)
            table = fresh()
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # run of >= 3 identical -> RLE
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run up to the next RLE-worthy stretch
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _read_ifd_entries(b: bytes, off: int, endian: str):
    (n,) = struct.unpack_from(endian + "H", b, off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(endian + "HHI", b, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        total = size * cnt
        if total > 4:
            (vpos,) = struct.unpack_from(endian + "I", b, vpos)
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        vals = list(struct.unpack_from(endian + fmt * cnt, b, vpos))
        tags[tag] = vals
    return tags


def decode_tiff(b: bytes):
    """(w, h, HxWx3 uint8 RGB) for a baseline stripped TIFF, else
    None."""
    try:
        return _decode_tiff_strict(b)
    except Exception:
        return None


def _decode_tiff_strict(b: bytes):
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(endian + "I", b, 4)
    tags = _read_ifd_entries(b, ifd_off, endian)
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    offsets = tags.get(273)
    spp = tags.get(277, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    counts = tags.get(279)
    predictor = tags.get(317, [1])[0]
    colormap = tags.get(320)
    if (
        w == 0
        or h == 0
        or offsets is None
        or counts is None
        or any(x != 8 for x in bits)
        or comp not in (1, 5, 32773)
        or photo not in (0, 1, 2, 3)
        or predictor not in (1, 2)
    ):
        return None
    stride = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = b[off : off + cnt]
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        need = nrows * stride
        if comp == 1:
            raw += chunk[:need]
        elif comp == 5:
            raw += _lzw_decode_tiff(chunk, need)[:need]
        else:
            raw += _packbits_decode(chunk, need)[:need]
    if len(raw) < h * stride:
        raise ValueError("tiff: truncated strips")
    px = np.frombuffer(bytes(raw[: h * stride]), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 2:
        if spp < 3:
            return None
        img = px[:, :, :3]
    elif photo == 3:
        if colormap is None or spp != 1:
            return None
        n = len(colormap) // 3
        cm = np.array(colormap, np.uint32).reshape(3, n).T >> 8  # 16-bit entries
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            return None
        img = cm[idx].astype(np.uint8)
    else:
        g = px[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        img = np.repeat(g[:, :, None], 3, axis=2)
    return int(w), int(h), np.ascontiguousarray(img)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    palette: bool = False,
    rows_per_strip: int = 16,
    big_endian: bool = False,
) -> bytes:
    """HxWx3 RGB or HxW grayscale uint8 -> stripped baseline TIFF."""
    img = np.asarray(img, np.uint8)
    endian = ">" if big_endian else "<"
    h, w = img.shape[:2]
    colormap = None
    if palette:
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        colors, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette needs <= 256 colors")
        plane = inv.reshape(h, w).astype(np.uint8)[:, :, None]
        spp, photo = 1, 3
        n = len(colors)
        cm16 = (colors.astype(np.uint32) << 8 | colors).T  # 16-bit entries
        colormap = cm16.reshape(-1).tolist()
    elif img.ndim == 2:
        plane = img[:, :, None]
        spp, photo = 1, 1
    else:
        plane = img
        spp, photo = 3, 2
    if predictor == 2:
        base = plane.astype(np.int64)
        diff = np.concatenate([base[:, :1], np.diff(base, axis=1)], axis=1)
        plane = (diff % 256).astype(np.uint8)
    stride = w * spp
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = plane[y0 : y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")
    # layout: header(8) + strip data + IFD + out-of-line values
    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*") + b"\x00" * 4
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\x00"
    ifd_off = len(out)
    struct.pack_into(endian + "I", out, 4, ifd_off)

    entries: list[tuple[int, int, int, list[int]]] = []  # tag, type, count, values

    def add(tag, typ, vals):
        entries.append((tag, typ, len(vals), vals))

    n_strips = len(strips)
    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [compression])
    add(262, 3, [photo])
    add(273, 4, strip_offsets)
    add(277, 3, [spp])
    add(278, 4, [rows_per_strip])
    add(279, 4, [len(s) for s in strips])
    if predictor == 2:
        add(317, 3, [2])
    if colormap is not None:
        add(320, 3, colormap)
    entries.sort()
    n = len(entries)
    ifd = bytearray(struct.pack(endian + "H", n))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * n + 4
    sizes = {3: 2, 4: 4}
    fmts = {3: "H", 4: "I"}
    for tag, typ, cnt, vals in entries:
        total = sizes[typ] * cnt
        packed = struct.pack(endian + fmts[typ] * cnt, *vals)
        if total <= 4:
            val_field = packed + b"\x00" * (4 - total)
        else:
            val_field = struct.pack(endian + "I", extra_base + len(extra))
            extra += packed
            if len(extra) & 1:
                extra += b"\x00"
        ifd += struct.pack(endian + "HHI", tag, typ, cnt) + val_field
    ifd += b"\x00" * 4  # next IFD = none
    out += ifd + extra
    return bytes(out)
