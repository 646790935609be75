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
