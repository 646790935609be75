"""CRAM planning layer (decode is stubbed — see sources/cram_source.py)."""

import os

import pytest

from disq_spark.formats.cram import (
    plan_cram_containers,
    read_crai,
    read_itf8,
    read_ltf8,
    scan_containers,
)
from disq_spark.sources.cram_source import plan_cram, read_cram


def test_itf8_roundtrip_points():
    # spot values across the encoding tiers
    assert read_itf8(bytes([0x05]), 0) == (5, 1)
    assert read_itf8(bytes([0x80 | 0x01, 0x02]), 0) == (0x0102, 2)
    assert read_itf8(bytes([0xC0 | 0x01, 0x02, 0x03]), 0) == (0x010203, 3)
    # 5-byte negative (-1)
    v, n = read_itf8(bytes([0xFF, 0xFF, 0xFF, 0xFF, 0x0F]), 0)
    assert v == -1 and n == 5
    assert read_ltf8(bytes([0x7F]), 0) == (0x7F, 1)


def test_scan_containers_full_coverage(fixtures_dir):
    for name in ("valid.cram", "valid_no_index.cram"):
        p = os.path.join(fixtures_dir, name)
        cs = scan_containers(p)
        assert cs[-1].end == os.path.getsize(p)
        assert cs[-1].is_eof
        assert sum(c.n_records for c in cs) == 8
        for a, b in zip(cs, cs[1:]):
            assert a.end == b.offset


def test_crai_offsets_match_scan(fixtures_dir):
    p = os.path.join(fixtures_dir, "valid.cram")
    offsets = {c.offset for c in scan_containers(p)}
    for entry in read_crai(p + ".crai"):
        assert entry[3] in offsets


def test_plan_prefers_crai(fixtures_dir):
    plan = plan_cram(os.path.join(fixtures_dir, "valid.cram"), split_size=1000)
    assert plan  # (path, start, end) triples from the index
    assert all(s < e for _p, s, e in plan)
    plan2 = plan_cram_containers(
        os.path.join(fixtures_dir, "valid_no_index.cram"), split_size=1000
    )
    assert plan2


def test_read_cram_stub_contract(spark, fixtures_dir):
    with pytest.raises(NotImplementedError) as ei:
        read_cram(spark, os.path.join(fixtures_dir, "valid.cram"))
    assert "container-aligned splits" in str(ei.value)


def test_bigger_real_file(fixtures_dir):
    p = os.path.join(fixtures_dir, "CEUTrio.HiSeq.WGS.b37.NA12878.20.21.10m-10m100.cram")
    cs = scan_containers(p)
    assert sum(c.n_records for c in cs) == 654
    assert cs[-1].end == os.path.getsize(p)
