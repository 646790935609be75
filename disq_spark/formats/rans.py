"""rANS 4x8 entropy codec (CRAM 3.0 block compression method 4).

Implements the CRAM specification's rans4x8 codec — four interleaved
32-bit rANS states, 12-bit normalized frequencies, RLE'd frequency
tables. Decode handles order-0 and order-1 (everything htsjdk writes);
encode emits order-0 (``compress``) and order-1 (``compress_o1``,
context = previous byte per quarter — what htsjdk writes for quality
series), used by the CRAM writer for the bulk byte series, closing the
write-side codec-parity gap with htsjdk-written files.

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


def _normalize_freqs(data: bytes) -> list[int]:
    """Symbol counts scaled to sum exactly TOTFREQ (4096), every present
    symbol >= 1 (a present symbol with frequency 0 would be undecodable)."""
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    return _normalize_counts(counts, len(data))


def _normalize_counts(counts: list[int], total: int) -> list[int]:
    F = [0] * 256
    assigned = 0
    for s in range(256):
        if counts[s]:
            F[s] = max(1, (counts[s] * TOTFREQ) // total)
            assigned += F[s]
    diff = TOTFREQ - assigned
    # settle the residual on the most frequent symbols (never below 1)
    order = sorted((s for s in range(256) if F[s]), key=lambda s: -F[s])
    i = 0
    while diff != 0:
        s = order[i % len(order)]
        if diff > 0:
            F[s] += 1
            diff -= 1
        elif F[s] > 1:
            step = min(F[s] - 1, -diff)
            F[s] -= step
            diff += step
        i += 1
    return F


def _write_freq(f: int) -> bytes:
    """Inverse of _read_freq: 1 byte below 128, else high-bit 2-byte."""
    if f < 128:
        return bytes([f])
    return bytes([0x80 | (f >> 8), f & 0xFF])


def _write_freq_table(F: list[int]) -> bytes:
    """Inverse of _read_freq_table: maximal runs of consecutive present
    symbols are RLE'd (the parser REQUIRES the RLE form whenever the next
    present symbol is last+1), terminated by a 0 symbol byte."""
    out = bytearray()
    present = [s for s in range(256) if F[s]]
    i = 0
    while i < len(present):
        j = i
        while j + 1 < len(present) and present[j + 1] == present[j] + 1:
            j += 1
        run = present[i : j + 1]
        out.append(run[0])
        out += _write_freq(F[run[0]])
        if len(run) > 1:
            out.append(run[1])  # == run[0]+1 -> parser reads an RLE count
            out.append(len(run) - 2)
            for s in run[1:]:
                out += _write_freq(F[s])
        i = j + 1
    out.append(0)
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Encode one order-0 rans4x8 stream (including the 9-byte header) —
    the inverse of ``uncompress``. Symbols are pushed in REVERSE order
    (rANS is a stack) into 4 states keyed by position & 3, renormalizing
    into one shared byte stream that is reversed at the end so the
    decoder meets the bytes in pop order; the 4 final states are written
    first as the decoder's initial states."""
    if not data:
        return struct.pack("<BII", 0, 0, 0)
    F = _normalize_freqs(data)
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + F[s]
    table = _write_freq_table(F)
    states = [RANS_L, RANS_L, RANS_L, RANS_L]
    out = bytearray()
    renorm_base = RANS_L >> TF_SHIFT << 8
    for i in range(len(data) - 1, -1, -1):
        s = data[i]
        j = i & 3
        x = states[j]
        f = F[s]
        x_max = renorm_base * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + C[s]
    payload = table + struct.pack("<4I", *states) + bytes(reversed(out))
    return struct.pack("<BII", 0, len(payload), len(data)) + payload


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


def _write_freq_table_o1(tables: dict[int, bytes]) -> bytes:
    """Inverse of _read_freq_table_o1: present contexts ascending, maximal
    consecutive runs RLE'd (ctx byte, table, next-ctx byte, run count, then
    the run's remaining tables back-to-back), terminated by a 0 context."""
    out = bytearray()
    present = sorted(tables)
    i = 0
    while i < len(present):
        j = i
        while j + 1 < len(present) and present[j + 1] == present[j] + 1:
            j += 1
        run = present[i : j + 1]
        out.append(run[0])
        out += tables[run[0]]
        if len(run) > 1:
            out.append(run[1])  # == run[0]+1 -> parser reads an RLE count
            out.append(len(run) - 2)
            for ctx in run[1:]:
                out += tables[ctx]
        i = j + 1
    out.append(0)
    return bytes(out)


def compress_o1(data: bytes) -> bytes:
    """Encode one order-1 rans4x8 stream (including the 9-byte header) —
    the inverse of the order-1 branch of ``uncompress``.

    The buffer is split into 4 quarters of q = len >> 2 bytes (state j
    owns quarter j; the len % 4 tail rides state 3); each byte's context
    is its predecessor within the quarter chain, with context 0 for the
    first byte of every quarter. Per-context frequency tables are
    normalized to 4096 independently. Symbols are pushed in exact reverse
    of the decoder's pop order: tail last-to-first on state 3, then
    i = q-1..0 with j = 3..0, renormalizing into one shared byte stream
    reversed at the end.
    """
    n = len(data)
    if n == 0:
        return struct.pack("<BII", 1, 0, 0)
    q = n >> 2
    # context of byte i: 0 at each quarter start (i == j*q for j<4), else
    # data[i-1]; the tail (i >= 4q) continues quarter 3's chain.
    counts: dict[int, list[int]] = {}
    totals: dict[int, int] = {}

    def _bump(ctx: int, sym: int) -> None:
        row = counts.get(ctx)
        if row is None:
            row = counts[ctx] = [0] * 256
            totals[ctx] = 0
        row[sym] += 1
        totals[ctx] += 1

    starts = {j * q for j in range(4)} if q else {0}
    for i in range(n):
        _bump(0 if i in starts else data[i - 1], data[i])
    F: dict[int, list[int]] = {}
    C: dict[int, list[int]] = {}
    tables: dict[int, bytes] = {}
    for ctx, row in counts.items():
        f = _normalize_counts(row, totals[ctx])
        cum = [0] * 257
        for s in range(256):
            cum[s + 1] = cum[s] + f[s]
        F[ctx] = f
        C[ctx] = cum
        tables[ctx] = _write_freq_table(f)
    states = [RANS_L, RANS_L, RANS_L, RANS_L]
    out = bytearray()
    renorm_base = RANS_L >> TF_SHIFT << 8

    def _push(j: int, ctx: int, s: int) -> None:
        x = states[j]
        f = F[ctx][s]
        x_max = renorm_base * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + C[ctx][s]

    for i in range(n - 1, 4 * q - 1, -1):  # tail, reverse, state 3
        _push(3, 0 if i in starts else data[i - 1], data[i])
    for i in range(q - 1, -1, -1):
        for j in (3, 2, 1, 0):
            p = j * q + i
            _push(j, 0 if i == 0 else data[p - 1], data[p])
    payload = _write_freq_table_o1(tables) + struct.pack("<4I", *states) + bytes(reversed(out))
    return struct.pack("<BII", 1, len(payload), n) + payload
