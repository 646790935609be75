"""rANS 4x8 entropy decoder (CRAM 3.0 block compression method 4).

Implements the CRAM specification's rans4x8 codec (order-0 and order-1),
the default block compressor of htsjdk-written CRAM 3.0 — four
interleaved 32-bit rANS states, 12-bit normalized frequencies, RLE'd
frequency tables. Decode only (we do not write CRAM).

Layout of a compressed stream:
  order:u8, compressed_size:u32le, uncompressed_size:u32le,
  frequency table, interleaved rANS data (4 x u32le initial states).
"""

from __future__ import annotations

import struct

RANS_L = 1 << 23  # lower renormalization bound
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


class _Cursor:
    __slots__ = ("d", "p")

    def __init__(self, d: bytes, p: int = 0):
        self.d = d
        self.p = p

    def u8(self) -> int:
        v = self.d[self.p]
        self.p += 1
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.d, self.p)[0]
        self.p += 4
        return v


def _read_freq(c: _Cursor) -> int:
    """1-byte freq, or 2-byte when the high bit is set (15-bit value)."""
    f = c.u8()
    if f >= 128:
        f = ((f & 127) << 8) | c.u8()
    return f


def _read_freq_table(c: _Cursor) -> tuple[list[int], list[int], list[int]]:
    """(F, C, lookup) — freqs, cumulative freqs, and a 4096-entry
    slot->symbol table for O(1) symbol resolution."""
    F = [0] * 256
    sym = c.u8()
    last = sym
    rle = 0
    while True:
        F[sym] = _read_freq(c)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            last = sym
            sym = c.u8()
            if sym == last + 1:
                rle = c.u8()
        if sym == 0 and rle == 0:
            # a trailing 0 terminates unless 0 itself carries a freq run
            break
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + F[s]
    lookup = [0] * TOTFREQ
    for s in range(256):
        if F[s]:
            for slot in range(C[s], C[s] + F[s]):
                lookup[slot] = s
    return F, C[:256], lookup


def _read_freq_table_o1(c: _Cursor):
    """Order-1: context -> (F, C, lookup); contexts RLE'd like symbols."""
    tables: dict[int, tuple[list[int], list[int], list[int]]] = {}
    ctx = c.u8()
    last = ctx
    rle = 0
    while True:
        tables[ctx] = _read_freq_table(c)
        if rle > 0:
            rle -= 1
            ctx += 1
        else:
            last = ctx
            ctx = c.u8()
            if ctx == last + 1:
                rle = c.u8()
        if ctx == 0 and rle == 0:
            break
    return tables


def _renorm(state: int, c: _Cursor) -> int:
    while state < RANS_L and c.p < len(c.d):
        state = (state << 8) | c.u8()
    return state


def uncompress(data: bytes) -> bytes:
    """Decode one rans4x8 stream (including its 9-byte header)."""
    order = data[0]
    # compressed size at 1..5, uncompressed at 5..9
    out_sz = struct.unpack_from("<I", data, 5)[0]
    c = _Cursor(data, 9)
    if out_sz == 0:
        return b""
    if order == 0:
        return _uncompress_o0(c, out_sz)
    if order == 1:
        return _uncompress_o1(c, out_sz)
    raise ValueError(f"rANS order {order} unsupported")


def _uncompress_o0(c: _Cursor, out_sz: int) -> bytes:
    F, C, lookup = _read_freq_table(c)
    states = [c.u32() for _ in range(4)]
    out = bytearray(out_sz)
    for i in range(out_sz):
        j = i & 3
        st = states[j]
        m = st & (TOTFREQ - 1)
        s = lookup[m]
        out[i] = s
        st = F[s] * (st >> TF_SHIFT) + m - C[s]
        states[j] = _renorm(st, c)
    return bytes(out)


def _uncompress_o1(c: _Cursor, out_sz: int) -> bytes:
    tables = _read_freq_table_o1(c)
    q = out_sz >> 2
    states = [c.u32() for _ in range(4)]
    out = bytearray(out_sz)
    ctxs = [0, 0, 0, 0]
    for i in range(q):
        for j in range(4):
            F, C, lookup = tables.get(ctxs[j]) or ([0] * 256, [0] * 256, [0] * TOTFREQ)
            st = states[j]
            m = st & (TOTFREQ - 1)
            s = lookup[m]
            out[j * q + i] = s
            st = F[s] * (st >> TF_SHIFT) + m - C[s]
            states[j] = _renorm(st, c)
            ctxs[j] = s
    # tail (out_sz % 4 bytes) continues with state/context 3
    for i in range(4 * q, out_sz):
        F, C, lookup = tables.get(ctxs[3]) or ([0] * 256, [0] * 256, [0] * TOTFREQ)
        st = states[3]
        m = st & (TOTFREQ - 1)
        s = lookup[m]
        out[i] = s
        st = F[s] * (st >> TF_SHIFT) + m - C[s]
        states[3] = _renorm(st, c)
        ctxs[3] = s
    return bytes(out)
