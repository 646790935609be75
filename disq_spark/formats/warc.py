"""WARC (Web ARChive, ISO 28500) record layer — the container format of
web-crawl corpora (Common Crawl ships .warc.gz), i.e. the actual
ingestion format of LLM pretraining pipelines.

Framing is header-block + Content-Length payload:

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    ...more headers...\\r\\n
    Content-Length: N\\r\\n
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

``.warc.gz`` compresses EVERY RECORD AS ITS OWN GZIP MEMBER (the spec's
recommendation, and what Common Crawl does) — which makes the file
block-splittable exactly like BGZF: any worker can scan forward from an
arbitrary byte offset to the next gzip member whose decompressed head
is ``WARC/``, then stream records member-by-member. The split planner
in sources/warc.py leans on ``find_gzip_member_start`` here the same
way the BAM source leans on the BGZF/record guesser
(reference: PathSplitSource.java / BamRecordGuesser.java — behavioral
parity with the split-snap idea, different format, no code).
"""

from __future__ import annotations

import io
import zlib

from disq_spark import fs as _dfs

_GZ_MAGIC = b"\x1f\x8b\x08"
#: extra bytes read past a snap window so a member boundary in its final
#: bytes has enough compressed input to inflate the 5-byte WARC/ probe
#: (a deflate stream needs at most a few hundred bytes for 5 chars;
#: 64 KiB is comfortably past any header + first-block need)
_GZ_SLACK = 1 << 16


def record_status(buf: bytes, pos: int):
    """Classify buf[pos:]: ('ok', (headers, payload, end_pos)) for a
    complete record, ('short', None) when the bytes so far are a valid
    record PREFIX that extending the buffer could complete (header block
    still open, or payload shorter than Content-Length), ('bad', None)
    when pos can never start a record however much data follows. The
    split-snap needs the three-way answer: 'bad' advances the scan,
    'short' reads more — treating them the same silently drops any
    record larger than the overscan window (ADVICE r6)."""
    if buf[pos : pos + 5] != b"WARC/":
        return "bad", None
    hdr_end = buf.find(b"\r\n\r\n", pos)
    if hdr_end < 0:
        # an unterminated header block could still close with more data
        # — but only if what we have still looks like header lines
        # (CRLF-separated 'k: v'); a binary blob after 'WARC/' is bad.
        tail = buf[pos:]
        return ("short", None) if len(tail) < (1 << 20) else ("bad", None)
    lines = buf[pos:hdr_end].split(b"\r\n")
    headers = {"WARC-Version": lines[0].decode("ascii", "replace")}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("ascii", "replace")] = v.strip().decode(
            "utf-8", "replace"
        )
    try:
        n = int(headers.get("Content-Length", ""))
    except ValueError:
        return "bad", None
    if n < 0:
        # a negative length can never complete — without this it would
        # classify as 'short' forever and pin the buffer-extension loop
        return "bad", None
    body_start = hdr_end + 4
    payload = buf[body_start : body_start + n]
    if len(payload) != n:
        return "short", None
    end = body_start + n
    if buf[end : end + 4] == b"\r\n\r\n":
        end += 4
    return "ok", (headers, payload, end)


def parse_record(buf: bytes, pos: int):
    """One record at pos -> (headers dict, payload bytes, end_pos) or
    None if buf[pos:] does not contain a complete WARC record (see
    record_status for the truncated-vs-invalid distinction)."""
    st, rec = record_status(buf, pos)
    return rec if st == "ok" else None


def parse_records(buf: bytes, start: int = 0, end: int | None = None):
    """All records STARTING in [start, end) — the split-ownership rule
    (a record belongs to the chunk its first byte falls in)."""
    if end is None:
        end = len(buf)
    out = []
    pos = start
    while pos < end:
        rec = parse_record(buf, pos)
        if rec is None:
            break
        headers, payload, nxt = rec
        out.append((headers, payload))
        pos = nxt
    return out


def find_record_start(buf: bytes, pos: int) -> int:
    """Offset of the first record at/after pos in UNCOMPRESSED warc
    bytes (validated by an actual header parse), or -1."""
    while True:
        i = buf.find(b"WARC/", pos)
        if i < 0:
            return -1
        if parse_record(buf, i) is not None:
            return i
        pos = i + 1


def resync_record_start(buf: bytes, pos: int, end: int | None = None) -> int:
    """First ``WARC/`` at/after ``pos`` sitting at a PLAUSIBLE record
    boundary: offset 0 (chunk/member start) or preceded by the
    ``\\r\\n\\r\\n`` record terminator. -1 if none before ``end``.

    This is the corrupt-record resync for the streaming scan loops in
    sources/warc.py — unlike ``find_record_start`` it must accept
    records that are still INCOMPLETE in the buffer (the caller extends
    the read), so it cannot validate by parsing. The boundary check is
    what keeps a bad/truncated record's PAYLOAD from fabricating
    phantom top-level records: warc-in-warc payloads (revisit/metadata
    records embedding full WARC records) exist in real crawls, and a
    raw ``find(b'WARC/')`` would emit them as their own records (r8
    advice). Residual risk, accepted and documented: an embedded record
    located exactly at its parent's payload start IS preceded by the
    parent header's terminator and would still be surfaced — only
    reachable when the parent itself is corrupt, and the alternative
    (dropping everything after any bad record) loses real data."""
    n = len(buf) if end is None else end
    i = pos
    while True:
        i = buf.find(b"WARC/", i)
        if i < 0 or i >= n:
            return -1
        if i == 0 or buf[max(0, i - 4) : i] == b"\r\n\r\n":
            return i
        i += 1


def find_gzip_member_start(path: str, pos: int, limit: int = 1 << 26) -> int:
    """First offset >= pos that starts a gzip member whose decompressed
    head reads ``WARC/`` — the split-snap for .warc.gz (candidates are
    validated by actually inflating a few bytes, BamRecordGuesser
    style). -1 if none within ``limit`` bytes. Callers snapping a
    byte-range chunk MUST pass ``limit >= chunk length`` (the chunk may
    hold no boundary before its last bytes); sources/warc.py passes
    ``max(end - start, 1 << 26)``.

    The read window extends ``_GZ_SLACK`` bytes past ``limit``: a true
    member boundary in the window's FINAL bytes needs compressed input
    beyond it to inflate the 5-byte probe — truncating the read at
    ``limit`` would reject that candidate as a false positive and
    silently drop the chunk's records (candidates are still only
    accepted at offsets < ``limit``)."""
    with _dfs.open_input(path) as f:
        f.seek(pos)
        window = f.read(limit + _GZ_SLACK)
    i = 0
    while True:
        i = window.find(_GZ_MAGIC, i)
        if i < 0 or i >= limit:
            return -1
        try:
            d = zlib.decompressobj(31)
            head = d.decompress(window[i : i + 512], 16)
            if head[:5] == b"WARC/":
                return pos + i
        except zlib.error:
            pass
        i += 1


def iter_gzip_members(path: str, start: int, end: int):
    """Decompressed bytes of every gzip member starting in [start, end)
    of a member-per-record .warc.gz, yielded as (member_offset, data)."""
    with _dfs.open_input(path) as f:
        f.seek(0, io.SEEK_END)
        fsize = f.tell()
        pos = start
        while pos < end and pos < fsize:
            f.seek(pos)
            d = zlib.decompressobj(31)
            out = bytearray()
            consumed = 0
            while not d.eof:
                chunk = f.read(1 << 20)
                if not chunk:
                    raise ValueError("warc.gz: truncated gzip member")
                out += d.decompress(chunk)
                consumed += len(chunk) - len(d.unused_data)
                if d.eof:
                    break
            yield pos, bytes(out)
            pos += consumed


def build_warc(records, gzip_members: bool = True) -> bytes:
    """records = [(headers dict, payload bytes)] -> warc / warc.gz
    bytes (one gzip member per record when gzip_members)."""
    out = bytearray()
    for headers, payload in records:
        h = dict(headers)
        h["Content-Length"] = str(len(payload))
        block = bytearray(b"WARC/1.0\r\n")
        for k, v in h.items():
            if k == "WARC-Version":
                continue
            block += f"{k}: {v}\r\n".encode()
        block += b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(bytes(block)) + co.flush()
        else:
            out += block
    return bytes(out)
