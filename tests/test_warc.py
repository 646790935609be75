"""WARC reader: split matrix (every record exactly once at any split
size, gz and plain), the genomics-source test contract applied to the
web-crawl ingestion format."""

import numpy as np
import pytest

from disq_spark.formats.warc import (
    build_warc,
    find_gzip_member_start,
    find_record_start,
    parse_records,
)
from disq_spark.sources.warc import read_warc


def _make_records(n, rng):
    recs = []
    for i in range(n):
        payload = bytes(rng.integers(32, 127, int(rng.integers(10, 4000)), dtype=np.uint8))
        recs.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i:08d}>",
                    "WARC-Date": "2026-08-15T00:00:00Z",
                    "WARC-Target-URI": f"https://example.org/page/{i}",
                    "Content-Type": "text/html",
                },
                payload,
            )
        )
    return recs


@pytest.mark.parametrize("gz", [True, False])
def test_warc_split_matrix(spark, tmp_path, gz):
    rng = np.random.default_rng(42)
    recs = _make_records(60, rng)
    path = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    with open(path, "wb") as f:
        f.write(build_warc(recs, gzip_members=gz))

    want = {f"<urn:uuid:{i:08d}>": recs[i][1] for i in range(60)}
    import os

    size = os.path.getsize(path)
    for split in (size + 1, size // 3, 4096, 700):
        got = {
            r.record_id: bytes(r.payload)
            for r in read_warc(spark, path, split_size=split).collect()
        }
        assert got == want, f"split={split}"


def test_warc_record_layer():
    rng = np.random.default_rng(3)
    recs = _make_records(5, rng)
    raw = build_warc(recs, gzip_members=False)
    back = parse_records(raw)
    assert len(back) == 5
    assert [h["WARC-Target-URI"] for h, _ in back] == [
        f"https://example.org/page/{i}" for i in range(5)
    ]
    assert all(p == recs[i][1] for i, (_, p) in enumerate(back))
    # snap from mid-record lands on the NEXT record
    second = raw.find(b"WARC/1.0", 5)
    assert find_record_start(raw, 5) == second
    # payload containing the magic is not a false record start
    trap = _make_records(1, rng)
    trap[0] = (trap[0][0], b"xxWARC/yy no headers here")
    raw2 = build_warc(trap + recs[:1], gzip_members=False)
    inner = raw2.find(b"WARC/yy")
    nxt = find_record_start(raw2, inner)
    assert raw2[nxt : nxt + 5] == b"WARC/" and nxt > inner


def test_warc_gz_member_snap(tmp_path):
    rng = np.random.default_rng(7)
    recs = _make_records(10, rng)
    path = str(tmp_path / "m.warc.gz")
    data = build_warc(recs, gzip_members=True)
    with open(path, "wb") as f:
        f.write(data)
    # from offset 1, the snap must find the SECOND member (not 0)
    s = find_gzip_member_start(path, 1)
    assert 0 < s < len(data)
    from disq_spark.formats.warc import iter_gzip_members

    offs = [off for off, _ in iter_gzip_members(path, 0, len(data))]
    assert s == offs[1]


def test_warc_gz_snap_boundary_in_window_tail(tmp_path):
    """A member boundary in the snap window's FINAL bytes: its
    compressed data extends past ``limit``, so validating by inflating
    from a window truncated AT limit rejects the true boundary and
    silently drops the chunk (exactly-once violation). The slack read
    must accept it; offsets at/after limit must still be rejected."""
    rng = np.random.default_rng(11)
    recs = _make_records(6, rng)
    path = str(tmp_path / "tail.warc.gz")
    data = build_warc(recs, gzip_members=True)
    with open(path, "wb") as f:
        f.write(data)
    from disq_spark.formats.warc import iter_gzip_members

    offs = [off for off, _ in iter_gzip_members(path, 0, len(data))]
    second = offs[1]
    # from pos=1: candidate at relative second-1; limit leaves only 10
    # bytes of the member inside the window — not enough to inflate the
    # 5-byte probe without the slack
    s = find_gzip_member_start(path, 1, limit=(second - 1) + 10)
    assert s == second
    # a boundary AT/after limit stays out of this chunk's snap
    assert find_gzip_member_start(path, 1, limit=second - 1) == -1


def test_warc_multifile_directory_and_glob(spark, tmp_path):
    """Common Crawl shape: a directory of .warc.gz shards must read as
    one corpus (lexicographic file order, hidden/_ files skipped), with
    every record exactly once at any split size — the multi-file
    contract the genomics sources already test (resolve_paths)."""
    rng = np.random.default_rng(11)
    shard_recs = [_make_records(n, rng) for n in (7, 13, 5)]
    for i, recs in enumerate(shard_recs):
        # re-key ids so shards don't collide
        recs[:] = [
            ({**h, "WARC-Record-ID": f"<urn:shard{i}:{j}>"}, p)
            for j, (h, p) in enumerate(recs)
        ]
        with open(tmp_path / f"part-{i}.warc.gz", "wb") as f:
            f.write(build_warc(recs, gzip_members=True))
    # hidden + wrong-extension files must be ignored
    (tmp_path / "._junk.warc.gz").write_bytes(b"not a warc")
    (tmp_path / "notes.txt").write_bytes(b"readme")

    want = {
        f"<urn:shard{i}:{j}>": recs[j][1]
        for i, recs in enumerate(shard_recs)
        for j in range(len(recs))
    }
    for split in (1 << 20, 700):
        got = {
            r.record_id: bytes(r.payload)
            for r in read_warc(spark, str(tmp_path), split_size=split).collect()
        }
        assert got == want, f"split={split}"
    # glob form resolves the same shard set
    got_glob = {
        r.record_id: bytes(r.payload)
        for r in read_warc(spark, str(tmp_path / "part-*.warc.gz"), split_size=900).collect()
    }
    assert got_glob == want


def test_warc_sharded_memory_fs():
    """The planner + kernel must run entirely through the fs registry:
    a sharded corpus on memory:// (non-local scheme) planned at 4 KB
    splits and decoded with the same kernel body Spark's tasks run.
    (The in-process memory store is per-Python-process, so the kernel is
    driven serially here — every other scheme dispatches identically on
    driver and executor workers; this is the same driver-side pattern as
    tests/test_fs.py's BAM-on-memory round-trip.)"""
    from disq_spark import fs
    from disq_spark.sources.warc import decode_warc_chunks, plan_warc_chunks

    rng = np.random.default_rng(23)
    want = {}
    for i in range(3):
        recs = _make_records(9, rng)
        recs = [
            ({**h, "WARC-Record-ID": f"<urn:mem{i}:{j}>"}, p)
            for j, (h, p) in enumerate(recs)
        ]
        with fs.open_output(f"memory://crawl/part-{i}.warc.gz") as f:
            f.write(build_warc(recs, gzip_members=True))
        want.update({h["WARC-Record-ID"]: p for h, p in recs})

    chunks = plan_warc_chunks("memory://crawl", split_size=4096)
    assert len(chunks) > 3 and all(p.startswith("memory://") for p, *_ in chunks)
    got = {}
    for pdf in decode_warc_chunks(chunks):
        for rid, payload in zip(pdf["record_id"], pdf["payload"]):
            assert rid not in got, f"duplicate {rid}"
            got[rid] = bytes(payload)
    assert got == want
    fs.rmtree("memory://crawl")


def test_warc_gz_snap_window_covers_chunk(tmp_path, monkeypatch):
    """ADVICE r6: the gz split-snap must search a window >= the chunk
    length — a fixed 64 MB window under split_size > 64 MB silently
    drops every record in the chunk. Contract-checked by capturing the
    limit the kernel passes (a real >64 MB incompressible fixture would
    cost minutes per run)."""
    import disq_spark.sources.warc as W

    rng = np.random.default_rng(5)
    recs = _make_records(4, rng)
    path = str(tmp_path / "w.warc.gz")
    with open(path, "wb") as f:
        f.write(build_warc(recs, gzip_members=True))
    size = len(build_warc(recs, gzip_members=True))

    seen = {}
    real = W.find_gzip_member_start

    def spy(p, pos, limit=1 << 26):
        seen["limit"] = limit
        return real(p, pos, limit)

    monkeypatch.setattr(W, "find_gzip_member_start", spy)
    fake_end = 200 * 1024 * 1024  # pretend a 200 MB chunk
    list(W.decode_warc_chunks([(path, 1, fake_end, True)]))
    assert seen["limit"] >= fake_end - 1


def test_warc_plain_oversize_record(spark, tmp_path, monkeypatch):
    """ADVICE r6: a plain-warc record larger than the overscan window
    must still be (a) snapped to — a candidate failing only on
    truncation extends the buffer instead of being skipped — and (b)
    fully read. Overscan shrunk to 2 KB so 8-16 KB records exercise
    both loops."""
    import disq_spark.sources.warc as W

    monkeypatch.setattr(W, "_OVERSCAN", 2048)
    rng = np.random.default_rng(17)
    recs = []
    for i in range(8):
        payload = bytes(rng.integers(32, 127, 8000 + 1000 * i, dtype=np.uint8))
        recs.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:big:{i}>",
                    "WARC-Target-URI": f"https://example.org/big/{i}",
                    "Content-Type": "application/octet-stream",
                },
                payload,
            )
        )
    path = str(tmp_path / "big.warc")
    data = build_warc(recs, gzip_members=False)
    with open(path, "wb") as f:
        f.write(data)
    want = {f"<urn:big:{i}>": recs[i][1] for i in range(8)}
    for split in (1000, 3000, len(data) + 1):
        got = {}
        for pdf in W.decode_warc_chunks(
            W.plan_warc_chunks(path, split_size=split)
        ):
            for rid, payload in zip(pdf["record_id"], pdf["payload"]):
                assert rid not in got, f"duplicate {rid} at split={split}"
                got[rid] = bytes(payload)
        assert got == want, f"split={split}"


# -- hostile-input hardening (r8): malformed WARC framing ---------------------


def _rec_bytes(headers: dict, payload: bytes) -> bytes:
    lines = ["WARC/1.0"] + [f"{k}: {v}" for k, v in headers.items()]
    return ("\r\n".join(lines) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _valid(i: int, payload: bytes = b"ok-payload") -> bytes:
    return _rec_bytes(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{i:08d}>",
            "Content-Length": str(len(payload)),
        },
        payload,
    )


def test_warc_negative_content_length_is_bad_not_short():
    """A negative Content-Length can never complete: it must classify
    'bad' (advance the scan), not 'short' (extend the buffer forever —
    the hang mode this guards against)."""
    from disq_spark.formats.warc import record_status

    bad = _rec_bytes({"Content-Length": "-7"}, b"")
    st, rec = record_status(bad, 0)
    assert st == "bad" and rec is None
    # recovery: a valid record after the poisoned one is still found
    buf = bad + _valid(1)
    pos = find_record_start(buf, 1)  # skip the bad record's own 'WARC/'
    assert pos >= 0
    recs = parse_records(buf, pos)
    assert len(recs) == 1 and recs[0][1] == b"ok-payload"


def test_warc_nonnumeric_content_length_recovers():
    from disq_spark.formats.warc import record_status

    for cl in ("abc", "12abc", "1e3", "", "0x10"):
        bad = _rec_bytes({"Content-Length": cl}, b"xx")
        assert record_status(bad, 0)[0] == "bad", cl
    buf = _rec_bytes({"Content-Length": "zzz"}, b"") + _valid(2)
    pos = find_record_start(buf, 1)
    assert parse_records(buf, pos)[0][1] == b"ok-payload"


def test_warc_lf_only_headers_not_a_record():
    """LF-only framing (no CRLF CRLF terminator) is spec-invalid: the
    classifier reports 'short' while the buffer is small (more data
    could still close the block) and 'bad' once a binary-blob-sized
    tail rules a header block out — never a parse, never a hang."""
    from disq_spark.formats.warc import record_status

    lf_only = b"WARC/1.0\nContent-Length: 2\n\nhi"
    st, _ = record_status(lf_only, 0)
    assert st == "short"  # could still be a prefix of CRLF framing
    st2, _ = record_status(b"WARC/" + b"\x00" * (1 << 20) + b"x", 0)
    assert st2 == "bad"  # oversized unterminated block: scan advances


def test_warc_headerline_without_colon_no_crash():
    raw = (
        b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:1>\r\n"
        b"garbage line no colon\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    recs = parse_records(raw)
    assert len(recs) == 1 and recs[0][1] == b"hi"
    assert recs[0][0]["garbage line no colon"] == ""


def test_warc_duplicate_header_last_wins():
    raw = (
        b"WARC/1.0\r\nContent-Length: 99\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    recs = parse_records(raw)
    assert len(recs) == 1 and recs[0][1] == b"hi"


def test_warc_truncated_tail_drops_only_last():
    """Content-Length pointing past EOF: earlier records parse, the
    truncated tail is 'short' (a resumable prefix), not an error."""
    from disq_spark.formats.warc import record_status

    buf = _valid(1) + _rec_bytes({"Content-Length": "100000"}, b"only-a-bit")
    recs = parse_records(buf)
    assert len(recs) == 1 and recs[0][1] == b"ok-payload"
    st, _ = record_status(buf, len(_valid(1)))
    assert st == "short"


def test_warc_huge_content_length_no_allocation_blowup():
    from disq_spark.formats.warc import record_status

    st, _ = record_status(_rec_bytes({"Content-Length": str(1 << 60)}, b"x"), 0)
    assert st == "short"  # classified from lengths, no 2^60 allocation


def test_warc_malformed_mix_end_to_end(spark, tmp_path):
    """A .warc file with a poisoned record between two valid ones: the
    reader must surface both valid records and not loop/crash on the
    bad framing."""
    buf = (
        _valid(1)
        + _rec_bytes({"Content-Length": "-1"}, b"")
        + _valid(2)
    )
    p = tmp_path / "mixed.warc"
    p.write_bytes(buf)
    rows = read_warc(spark, str(p)).collect()
    ids = sorted(r.record_id for r in rows)
    assert ids == ["<urn:uuid:00000001>", "<urn:uuid:00000002>"]


def test_warc_gz_malformed_member_resync(spark, tmp_path):
    """Same poisoned-record recovery inside a gzip member: a bad
    record between two valid ones in ONE member must not drop the
    member tail."""
    import gzip

    member = _valid(1) + _rec_bytes({"Content-Length": "-1"}, b"") + _valid(2)
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(gzip.compress(member))
    rows = read_warc(spark, str(p)).collect()
    assert sorted(r.record_id for r in rows) == [
        "<urn:uuid:00000001>",
        "<urn:uuid:00000002>",
    ]


# -- property fuzz: the record classifier must be total and consistent --------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(0, 64))
def test_warc_record_status_total_on_arbitrary_bytes(junk, pos):
    """record_status never raises on arbitrary bytes at arbitrary
    offsets and always returns one of the three verdicts; an 'ok'
    verdict's payload length must equal its Content-Length."""
    from disq_spark.formats.warc import record_status

    st_, rec = record_status(junk, min(pos, len(junk)))
    assert st_ in ("ok", "short", "bad")
    if st_ == "ok":
        headers, payload, end = rec
        assert len(payload) == int(headers["Content-Length"])
        assert end <= len(junk)


@settings(max_examples=100, deadline=None)
@given(
    st.binary(min_size=0, max_size=120),
    st.binary(min_size=0, max_size=120),
    st.text(alphabet="0123456789-x ", min_size=0, max_size=6),
)
def test_warc_parse_recovers_valid_record_after_junk(pre, mid, cl):
    """A valid record is always recovered from find_record_start
    regardless of leading junk, a poisoned record (fuzzed
    Content-Length), and junk between records."""
    poisoned = (
        b"WARC/1.0\r\nContent-Length: " + cl.encode() + b"\r\n\r\n"
    )
    buf = pre + poisoned + mid + _valid(7)
    # scan from 0: must find SOME record start eventually, and parsing
    # from the true record's offset always yields it
    true_off = len(buf) - len(_valid(7))
    recs = parse_records(buf, true_off)
    assert len(recs) == 1 and recs[0][1] == b"ok-payload"


def test_warc_resync_no_phantom_record_from_bad_payload(spark, tmp_path):
    """A poisoned record whose payload bytes embed a COMPLETE valid WARC
    record mid-payload (warc-in-warc — revisit/metadata payloads exist
    in real crawls) must not have that embedded record fabricated as a
    top-level record during resync: the scan resumes only at a
    plausible record boundary (preceded by CRLFCRLF). The genuine next
    record is still recovered."""
    embedded = _valid(55)
    # CL=-1 -> 'bad'; the junk prefix keeps the embedded record off any
    # plausible boundary. The embedded record's own trailing CRLFCRLF
    # then forms the boundary for the genuine record 2.
    bad_outer = (
        b"WARC/1.0\r\nContent-Length: -1\r\n\r\n" + b"JUNKJUNK" + embedded
    )
    buf = _valid(1) + bad_outer + _valid(2)
    p = tmp_path / "warcinwarc.warc"
    p.write_bytes(buf)
    ids = sorted(r.record_id for r in read_warc(spark, str(p)).collect())
    assert ids == ["<urn:uuid:00000001>", "<urn:uuid:00000002>"]


def test_warc_gz_resync_no_phantom_record_from_bad_payload(spark, tmp_path):
    """Same phantom guard inside a gzip member."""
    import gzip

    member = (
        _valid(1)
        + b"WARC/1.0\r\nContent-Length: -1\r\n\r\n"
        + b"JUNKJUNK"
        + _valid(55)
        + _valid(2)
    )
    p = tmp_path / "warcinwarc.warc.gz"
    p.write_bytes(gzip.compress(member))
    ids = sorted(r.record_id for r in read_warc(spark, str(p)).collect())
    assert ids == ["<urn:uuid:00000001>", "<urn:uuid:00000002>"]


def test_warc_resync_boundary_helper():
    from disq_spark.formats.warc import resync_record_start

    buf = b"junkWARC/xxx\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    # offset 0 is plausible (member/chunk start)
    assert resync_record_start(b"WARC/1.0\r\n", 0) == 0
    # the first WARC/ (preceded by 'junk') is implausible; the second
    # (preceded by CRLFCRLF) is the resync point
    want = buf.find(b"WARC/1.0")
    assert resync_record_start(buf, 1) == want
    # end bound respected
    assert resync_record_start(buf, 1, end=want) == -1
    assert resync_record_start(b"no magic here", 0) == -1
