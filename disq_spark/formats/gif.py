"""GIF (87a/89a) decode + encode without external libraries.

Single-frame decode for the multimodal pipeline
(``operators/multimodal.try_decode_image``): header + logical screen
descriptor, global/local color tables, interlace, and the variable-width
LSB-first LZW bitstream (clear/end codes, width growth to 12 bits,
deferred-clear tolerant). The encoder emits a non-interlaced GIF89a with
a global color table built from the image's distinct colors (<= 256
required — this is a codec, not a quantizer) and resets the dictionary
at the 12-bit ceiling, the standard encoder behaviour.

Decoder behaviour is pinned by the widely-published 1x1 GIF test vector
and by multi-boundary round-trip property tests (images large enough to
cross the 512/1024/2048/4096 code-width boundaries and force mid-stream
clears) in tests/test_properties.py.

The reference repo has no image handling at all (genomics I/O only);
this module serves SURVEY.md's LLM-data-pipeline multimodal tier, same
as formats/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_WIDTH = 12


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW -> palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            break  # truncated stream: return what decoded
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == end:
            break
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (first code out of range)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond table)")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"GIF LZW stream ended early ({len(out)}/{n_pixels} px)")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder matching _lzw_decode's width/reset conventions."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = end + 1
    emit(clear)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < (1 << _MAX_WIDTH):
            table[wc] = next_code
            next_code += 1
            # the decoder grows its read width when ITS table (one
            # entry behind this one) reaches 2^width; emitting at the
            # old width once more then growing matches it exactly
            if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                width += 1
        else:
            # dictionary full: reset, like every mainstream encoder
            emit(clear)
            table = fresh_table()
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out.reshape(-1)


def decode_gif(b: bytes):
    """(width, height, HxWx3 uint8 RGB) for the FIRST frame, or None if
    not a GIF. Raises ValueError on a corrupt/truncated GIF."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    try:
        return _decode_gif(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt/truncated GIF: {e}") from e


def _decode_gif(b: bytes):
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        _ix, _iy, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = b[pos]
        pos += 1
        chunks = []
        while b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), mcs, iw * ih)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index beyond color table")
        if iflags & 0x40:
            idx = _deinterlace(idx, iw, ih)
        img = table[idx].reshape(ih, iw, 3)
        return int(iw), int(ih), img
    return None


def encode_gif(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (<= 256 distinct colors) or HxW grayscale -> GIF89a.

    A codec, not a quantizer: >256 distinct colors raises ValueError.
    """
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif needs <= 256 distinct colors, got {len(palette)}")
    depth = max(1, (len(palette) - 1).bit_length())
    n = 1 << depth
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (n - len(palette)))
    mcs = max(2, depth)  # spec: min LZW code size >= 2
    data = _lzw_encode(inverse.astype(np.uint8).tobytes(), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal_bytes
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
