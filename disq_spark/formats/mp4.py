"""MP4 / ISO-BMFF demux in stdlib struct — no ffmpeg.

Video at 100 TB is a DEMUX problem long before it is a codec problem:
frame sampling, keyframe extraction, and duration/codec profiling all
read the ISO base-media sample tables (moov/trak/mdia/minf/stbl), not
the bitstream. This parses those tables for real — box tree (including
64-bit largesize), track headers, and the stts/stss/stsz/stsc/stco/co64
chain — and resolves every sample to its absolute (offset, size,
keyframe, dts) in the file, which is exactly what a distributed
frame-sampling pipeline needs to slice payload bytes per frame. The
frame PAYLOADS remain undecodable without a codec library (H.264/H.265
NAL units etc.) — decode stays honestly stubbed in
operators/multimodal.py; the demux layer here is complete.

The test encoder builds minimal valid single-video-track files
(ftyp + mdat + moov with full sample tables, multi-chunk stsc runs,
explicit keyframe lists), so the offset arithmetic round-trips against
known ground truth.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


def _boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield typ, body, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, path: list[bytes]):
    """All boxes matching the type path, as (body_start, box_end)."""
    if not path:
        yield start, end
        return
    for typ, body, box_end in _boxes(b, start, end):
        if typ == path[0]:
            yield from _find(b, body, box_end, path[1:])


def _full(b: bytes, body: int) -> tuple[int, int]:
    """(version, first-payload-offset) of a full box."""
    return b[body], body + 4


def parse_mp4(b: bytes):
    """Track/duration metadata, or None if not ISO-BMFF. Each track:
    {id, kind, codec, width, height, timescale, duration_s, n_samples,
    n_keyframes}."""
    try:
        return _parse_mp4_strict(b)
    except Exception:
        return None


def _looks_bmff(b: bytes) -> bool:
    return len(b) >= 12 and b[4:8] in (b"ftyp", b"moov", b"mdat", b"free", b"styp")


def _parse_mp4_strict(b: bytes):
    if not _looks_bmff(b):
        return None
    tracks = []
    movie_ts = None
    movie_dur = None
    for mv_s, mv_e in _find(b, 0, len(b), [b"moov"]):
        for typ, body, box_end in _boxes(b, mv_s, mv_e):
            if typ == b"mvhd":
                ver, p = _full(b, body)
                if ver == 1:
                    movie_ts, movie_dur = struct.unpack_from(">IQ", b, p + 16)
                else:
                    movie_ts, movie_dur = struct.unpack_from(">II", b, p + 8)
            elif typ == b"trak":
                tracks.append(_parse_track(b, body, box_end))
    if movie_ts is None or not tracks:
        return None
    return {
        "duration_s": round(movie_dur / movie_ts, 6) if movie_ts else None,
        "timescale": movie_ts,
        "tracks": tracks,
    }


def _parse_track(b: bytes, start: int, end: int):
    info = {
        "id": None, "kind": None, "codec": None, "width": None,
        "height": None, "timescale": None, "duration_s": None,
        "n_samples": 0, "n_keyframes": None,
    }
    for typ, body, box_end in _boxes(b, start, end):
        if typ == b"tkhd":
            ver, p = _full(b, body)
            if ver == 1:
                info["id"] = struct.unpack_from(">I", b, p + 16)[0]
                p2 = p + 16 + 4 + 4 + 8
            else:
                info["id"] = struct.unpack_from(">I", b, p + 8)[0]
                p2 = p + 8 + 4 + 4 + 4
            # width/height: 16.16 fixed, last 8 bytes of tkhd
            w_fx, h_fx = struct.unpack_from(">II", b, box_end - 8)
            info["width"] = w_fx >> 16
            info["height"] = h_fx >> 16
        elif typ == b"mdia":
            for t2, b2, e2 in _boxes(b, body, box_end):
                if t2 == b"mdhd":
                    ver, p = _full(b, b2)
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", b, p + 16)
                    else:
                        ts, dur = struct.unpack_from(">II", b, p + 8)
                    info["timescale"] = ts
                    info["duration_s"] = round(dur / ts, 6) if ts else None
                elif t2 == b"hdlr":
                    handler = b[b2 + 8 : b2 + 12]
                    info["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                        handler, handler.decode("ascii", "replace")
                    )
                elif t2 == b"minf":
                    for t3, b3, e3 in _boxes(b, b2, e2):
                        if t3 == b"stbl":
                            for t4, b4, e4 in _boxes(b, b3, e3):
                                if t4 == b"stsd":
                                    _, p = _full(b, b4)
                                    n = struct.unpack_from(">I", b, p)[0]
                                    if n >= 1:
                                        info["codec"] = b[p + 8 : p + 12].decode(
                                            "ascii", "replace"
                                        )
                                elif t4 == b"stsz":
                                    _, p = _full(b, b4)
                                    info["n_samples"] = struct.unpack_from(
                                        ">I", b, p + 4
                                    )[0]
                                elif t4 == b"stss":
                                    _, p = _full(b, b4)
                                    info["n_keyframes"] = struct.unpack_from(
                                        ">I", b, p
                                    )[0]
    return info


def sample_table(b: bytes, track_id: int | None = None):
    """[(offset, size, is_keyframe, dts)] for every sample of the
    track (first video track by default) — the real per-frame byte
    ranges a frame-sampling pipeline slices. Raises on non-BMFF."""
    if not _looks_bmff(b):
        raise ValueError("not an ISO-BMFF payload")
    for mv_s, mv_e in _find(b, 0, len(b), [b"moov"]):
        for typ, trak_body, trak_end in _boxes(b, mv_s, mv_e):
            if typ != b"trak":
                continue
            t = _parse_track(b, trak_body, trak_end)
            if track_id is not None and t["id"] != track_id:
                continue
            if track_id is None and t["kind"] != "video":
                continue
            return _samples_of(b, trak_body, trak_end)
    raise ValueError("mp4: requested track not found")


def _samples_of(b: bytes, trak_s: int, trak_e: int):
    stsz = stsc = stco = stts = stss = None
    co64 = False
    for s, e in _find(b, trak_s, trak_e, [b"mdia", b"minf", b"stbl"]):
        for typ, body, box_end in _boxes(b, s, e):
            _, p = _full(b, body)
            if typ == b"stsz":
                fixed, n = struct.unpack_from(">II", b, p)
                if fixed:
                    stsz = [fixed] * n
                else:
                    stsz = list(struct.unpack_from(f">{n}I", b, p + 8))
            elif typ == b"stsc":
                (n,) = struct.unpack_from(">I", b, p)
                stsc = [
                    struct.unpack_from(">III", b, p + 4 + 12 * i) for i in range(n)
                ]
            elif typ in (b"stco", b"co64"):
                (n,) = struct.unpack_from(">I", b, p)
                co64 = typ == b"co64"
                fmt = "Q" if co64 else "I"
                stco = list(struct.unpack_from(f">{n}{fmt}", b, p + 4))
            elif typ == b"stts":
                (n,) = struct.unpack_from(">I", b, p)
                stts = [struct.unpack_from(">II", b, p + 4 + 8 * i) for i in range(n)]
            elif typ == b"stss":
                (n,) = struct.unpack_from(">I", b, p)
                stss = set(struct.unpack_from(f">{n}I", b, p + 4))
    if stsz is None or stsc is None or stco is None:
        raise ValueError("mp4: incomplete sample tables")
    # expand stsc: samples-per-chunk for every chunk
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(stco)
        per_chunk.extend([spc] * (last - first + 1))
    # decoding timestamps from stts runs
    dts = []
    t = 0
    for count, delta in stts or [(len(stsz), 1)]:
        for _ in range(count):
            dts.append(t)
            t += delta
    out = []
    si = 0
    for ci, chunk_off in enumerate(stco):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(stsz):
                break
            key = (si + 1) in stss if stss is not None else True
            out.append((off, stsz[si], key, dts[si] if si < len(dts) else 0))
            off += stsz[si]
            si += 1
    if si != len(stsz):
        raise ValueError("mp4: sample tables disagree on sample count")
    return out


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _fullbox(typ: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(typ, bytes([version, 0, 0, 0]) + payload)


def encode_mp4(
    frame_sizes: list[int],
    keyframes: list[int],
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    frame_delta: int = 40,
    samples_per_chunk: int = 5,
    frame_fill: bytes = b"\xAA",
) -> bytes:
    """Minimal single-video-track MP4: mdat holds fake frame payloads
    (frame i = frame_sizes[i] repeats of frame_fill[i % len]), moov
    carries complete sample tables. keyframes are 1-based sample
    numbers, matching stss semantics."""
    n = len(frame_sizes)
    frames = [
        bytes([frame_fill[i % len(frame_fill)]]) * frame_sizes[i] for i in range(n)
    ]
    mdat_payload = b"".join(frames)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    mdat_pos = len(ftyp)
    mdat = _box(b"mdat", mdat_payload)
    data_base = mdat_pos + 8
    # chunks of samples_per_chunk
    chunk_offsets = []
    off = data_base
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(frame_sizes[i : i + samples_per_chunk])
    duration = n * frame_delta
    mvhd = _fullbox(
        b"mvhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _fullbox(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        version=0,
    )
    mdhd = _fullbox(
        b"mdhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fullbox(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"disq\x00")
    stsd = _fullbox(
        b"stsd",
        struct.pack(">I", 1)
        + _box(
            b"avc1",
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + b"\x00" * 4
            + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 0x18, -1),
        ),
    )
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, frame_delta))
    stss = _fullbox(
        b"stss",
        struct.pack(f">I{len(keyframes)}I", len(keyframes), *keyframes),
    )
    n_chunks = len(chunk_offsets)
    stsc_entries = [(1, samples_per_chunk, 1)]
    tail = n % samples_per_chunk
    if tail and n_chunks > 1:
        stsc_entries.append((n_chunks, tail, 1))
    stsc = _fullbox(
        b"stsc",
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _fullbox(
        b"stsz", struct.pack(f">II{n}I", 0, n, *frame_sizes)
    )
    stco = _fullbox(
        b"stco",
        struct.pack(f">I{n_chunks}I", n_chunks, *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), version=0)
    url = struct.pack(">I", 12) + b"url " + bytes([0, 0, 0, 1])  # self-contained
    dinf = _box(b"dinf", _fullbox(b"dref", struct.pack(">I", 1) + url))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
