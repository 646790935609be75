"""Tabix split pruning: parity with TribbleIndexIntervalFiltering
(pruned read == full read + filter; fewer splits scanned)."""

import gzip
import os

from disq_spark.formats.tabix import chunks_for_interval, read_tbi, split_overlaps_intervals
from disq_spark.functions.intervals import Interval, overlaps
from disq_spark.sources.variants import read_vcf


def _contig_of(fixtures_dir):
    with gzip.open(os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz"), "rt") as f:
        for line in f:
            if not line.startswith("#"):
                return line.split("\t", 1)[0]


def test_read_tbi(fixtures_dir):
    idx = read_tbi(os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz.tbi"))
    assert idx.names
    contig = _contig_of(fixtures_dir)
    assert contig in idx.names
    chunks = chunks_for_interval(idx, contig, 1, 10_000_000)
    assert chunks
    assert chunks_for_interval(idx, "no_such_contig", 1, 100) == []


def test_pruned_read_equals_filtered_read(spark, fixtures_dir):
    path = os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz")
    contig = _contig_of(fixtures_dir)
    ivs = [Interval(contig, 800_000, 900_000)]

    full, _ = read_vcf(spark, path, split_size=64 * 1024)
    expect = full.filter(overlaps(ivs)).count()

    pruned, _ = read_vcf(spark, path, split_size=64 * 1024, intervals=ivs)
    assert pruned.count() == expect
    assert expect > 0

    # pruning actually dropped splits: the planned partition count must be
    # smaller than the unpruned plan for a narrow interval
    assert pruned.rdd.getNumPartitions() < full.rdd.getNumPartitions()


def test_split_overlap_primitive(fixtures_dir):
    path = os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz")
    idx = read_tbi(path + ".tbi")
    contig = _contig_of(fixtures_dir)
    size = os.path.getsize(path)
    triples = [(contig, 1, 5_000_000_000)]
    # the whole file overlaps a whole-contig interval
    assert split_overlaps_intervals(idx, 0, size, triples)
    # a range past EOF cannot
    assert not split_overlaps_intervals(idx, size + 10, size + 20, [(contig, 1, 2)])


# ---------------------------------------------------------------------------
# distributed .tbi write + merge (HeaderlessVcfOutputFormat + TbiMerger
# analog of TbiMergingTest.java: distributed merge == serial single-pass
# build of the final file, and the index actually works for pruning)
# ---------------------------------------------------------------------------
def _serial_tbi(path):
    """Ground-truth tabix index: single pass over the finished BGZF VCF."""
    from disq_spark.formats import bgzf
    from disq_spark.formats.tabix import TbiBuilder

    b = TbiBuilder()
    blocks = list(bgzf.scan_blocks(path))
    # walk records with exact virtual offsets (line by line across blocks)
    with open(path, "rb") as f:
        carry = b""
        carry_voff = None
        for blk in blocks:
            data = bgzf.decompress_block(f, blk.pos)
            off = 0
            while True:
                nl = data.find(b"\n", off)
                if nl < 0:
                    if off < len(data):
                        if not carry:
                            carry_voff = (blk.pos << 16) | off
                        carry += data[off:]
                    break
                if carry:
                    line = carry + data[off : nl + 1]
                    v_start = carry_voff
                    carry = b""
                else:
                    line = data[off : nl + 1]
                    v_start = (blk.pos << 16) | off
                nxt = nl + 1
                v_end = (blk.end << 16) if nxt >= len(data) else ((blk.pos << 16) | nxt)
                if not line.startswith(b"#"):
                    fld = line.split(b"\t", 4)
                    contig, pos, ref = fld[0].decode(), int(fld[1]), fld[3].decode()
                    b.add(contig, pos, pos + len(ref) - 1, v_start, v_end)
                off = nxt
    return b.build()


def test_written_tbi_matches_serial_build(spark, fixtures_dir, tmp_path):
    from disq_spark.formats.tabix import read_tbi as _read
    from disq_spark.sinks.variants import write_vcf

    src = os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz")
    df, header = read_vcf(spark, src, split_size=64 * 1024)  # multi-partition
    out = str(tmp_path / "out.vcf.bgz")
    write_vcf(df, header, out, write_tbi=True)
    assert os.path.exists(out + ".tbi")

    merged = _read(out + ".tbi")
    serial = _serial_tbi(out)
    assert merged.names == serial.names
    assert merged.bins == serial.bins
    # merged came off disk (absent == 0); serial is in-memory (-1)
    assert merged.linear == [[max(v, 0) for v in lin] for lin in serial.linear]


def test_written_tbi_prunes_correctly(spark, fixtures_dir, tmp_path):
    from disq_spark.sinks.variants import write_vcf

    src = os.path.join(fixtures_dir, "HiSeq.10000.vcf.bgz")
    df, header = read_vcf(spark, src, split_size=64 * 1024)
    out = str(tmp_path / "q.vcf.bgz")
    write_vcf(df, header, out, write_tbi=True)

    contig = _contig_of(fixtures_dir)
    ivs = [Interval(contig, 800_000, 900_000)]
    full, _ = read_vcf(spark, out, split_size=64 * 1024)
    expect = sorted(
        map(tuple, full.filter(overlaps(ivs)).select("contig", "start", "ref").collect())
    )
    pruned, _ = read_vcf(spark, out, split_size=64 * 1024, intervals=ivs)
    got = sorted(map(tuple, pruned.select("contig", "start", "ref").collect()))
    assert got == expect and len(got) > 0
    assert pruned.rdd.getNumPartitions() < full.rdd.getNumPartitions()
