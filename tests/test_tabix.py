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
