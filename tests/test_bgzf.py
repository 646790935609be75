"""BGZF layer: block discovery, split realignment, round-trip, sniffing.

Models BgzfBlockSourceTest.testFindAllBlocks and the codec tests."""

import gzip
import os

import pytest

from disq_spark.formats import bgzf


def test_scan_all_blocks_covers_file(fixtures_dir):
    path = os.path.join(fixtures_dir, "test.vcf.bgz")
    size = os.path.getsize(path)
    blocks = list(bgzf.scan_blocks(path))
    assert blocks
    # contiguous, non-overlapping, covering the whole file
    pos = 0
    for b in blocks:
        assert b.pos == pos
        pos = b.end
    assert pos == size
    # last block is the EOF terminator (empty payload)
    assert blocks[-1].u_size == 0


def test_split_realignment_no_dup_no_loss(fixtures_dir):
    """Any byte-split partition of the file must see each block exactly
    once (BamSourceTest.testPathChunksDontOverlap analog for BGZF)."""
    path = os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz")
    all_blocks = [b.pos for b in bgzf.scan_blocks(path)]
    size = os.path.getsize(path)
    for split in (1024, 4096, 76458, 100_000):
        seen = []
        start = 0
        while start < size:
            end = min(start + split, size)
            seen.extend(b.pos for b in bgzf.scan_blocks(path, start, end))
            start = end
        assert seen == all_blocks, f"split={split}"


def test_decompressed_equals_gzip_module(fixtures_dir):
    path = os.path.join(fixtures_dir, "test.vcf.bgz")
    ours = bgzf.read_range(path, 0, os.path.getsize(path))
    with gzip.open(path, "rb") as f:
        ref = f.read()
    assert ours == ref


def test_roundtrip_write(tmp_path):
    payload = (b"line-%d with some repetitive content\n" % 7) * 20000  # > 1 block
    out = tmp_path / "x.bgz"
    with open(out, "wb") as f:
        w = bgzf.BgzfWriter(f, terminate=True)
        w.write(payload)
        w.close()
    # readable by the stock gzip module (BGZF is valid multi-member gzip)
    with gzip.open(out, "rb") as f:
        assert f.read() == payload
    # our scanner agrees and sees > 1 block + terminator
    blocks = list(bgzf.scan_blocks(str(out)))
    assert len(blocks) >= 3
    assert blocks[-1].u_size == 0
    assert bgzf.read_range(str(out), 0, os.path.getsize(out)) == payload


def test_terminatorless_parts_concat_legal(tmp_path):
    """Parts without terminators + one terminator == legal BGZF whole."""
    a, b = b"A" * 100_000, b"B" * 50_000
    out = tmp_path / "joined.bgz"
    with open(out, "wb") as f:
        for chunk in (a, b):
            w = bgzf.BgzfWriter(f, terminate=False)
            w.write(chunk)
            w.close()
        f.write(bgzf.EOF_BLOCK)
    with gzip.open(out, "rb") as f:
        assert f.read() == a + b


def test_sniffing(fixtures_dir, tmp_path):
    assert bgzf.is_bgzf(os.path.join(fixtures_dir, "test.vcf.bgz"))
    assert bgzf.is_bgzf(os.path.join(fixtures_dir, "test.vcf.bgzf.gz"))
    # true-gzip VCF is gzip but NOT bgzf (BGZFEnhancedGzipCodec sniff)
    true_gz = os.path.join(fixtures_dir, "test.vcf.gz")
    assert bgzf.is_gzip(true_gz)
    assert not bgzf.is_bgzf(true_gz)
    plain = tmp_path / "p.txt"
    plain.write_text("hello")
    assert not bgzf.is_gzip(str(plain))


def test_virtual_offset_tracking(tmp_path):
    with open(tmp_path / "v.bgz", "wb") as f:
        w = bgzf.BgzfWriter(f, terminate=False)
        assert w.virtual_offset == 0
        w.write(b"x" * 10)
        assert w.virtual_offset == 10  # still buffered: coffset 0, uoffset 10
        w.write(b"y" * bgzf.MAX_PAYLOAD)
        voff = w.virtual_offset
        assert (voff >> 16) > 0  # a block was flushed
        w.close()


def test_invalid_block_rejected(tmp_path):
    bad = tmp_path / "bad.bgz"
    bad.write_bytes(b"\x1f\x8b\x08\x04" + b"\x00" * 40)
    with pytest.raises(ValueError):
        with open(bad, "rb") as f:
            bgzf.decompress_block(f, 0)
