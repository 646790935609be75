"""Genomics I/O throughput: replicate the reference fixture to ~200k
records, write a single-file BAM (with .sbi/.bai), read it back across
many partitions. Prints one JSON line with records/sec. Not part of the
driver's bench.py contract — numbers recorded in BASELINE.md.

Usage: python tools/bench_genomics.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from disq_spark.session import get_session  # noqa: E402
from disq_spark.sinks.bam import write_bam  # noqa: E402
from disq_spark.sources.bam_source import read_bam  # noqa: E402

FIXTURE = "/root/reference/src/test/resources/1-with-splitting-index.bam"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spark = get_session("bench_genomics")
    base, header = read_bam(spark, FIXTURE, split_size=200_000)
    base = base.cache()
    n_base = base.count()

    big = None
    for i in range(factor):
        part = base.withColumn("name", F.concat(F.col("name"), F.lit(f"_{i}")))
        big = part if big is None else big.unionByName(part)
    big = big.repartition(32).cache()
    n = big.count()

    tmp = tempfile.mkdtemp()
    # warm the Python worker pool (first mapInPandas pays worker spawn)
    write_bam(base, header, os.path.join(tmp, "warmup.bam"), write_sbi=False, write_bai=False)

    out = os.path.join(tmp, "big.bam")
    t0 = time.time()
    write_bam(big, header, out, write_bai=True)
    t_write = time.time() - t0
    size_mb = os.path.getsize(out) / 1e6

    t0 = time.time()
    df2, _ = read_bam(spark, out, split_size=1024 * 1024)
    n2 = df2.count()
    t_read = time.time() - t0
    assert n2 == n, (n2, n)

    # raw-tags scan (lazy aux decode — the scale path): tags carried as
    # undecoded byte spans, full rows otherwise
    t0 = time.time()
    df_raw, _ = read_bam(spark, out, split_size=1024 * 1024, tags="raw")
    n3 = df_raw.count()
    t_read_raw = time.time() - t0
    assert n3 == n, (n3, n)

    # narrow aggregation over the decoded frame (the common analytic shape)
    t0 = time.time()
    df2.groupBy("contig").agg(F.count("*"), F.avg("mapq")).collect()
    t_agg = time.time() - t0

    # VCF path: splittable BGZF scan of the 10k-variant fixture
    from disq_spark.sources.variants import read_vcf

    t0 = time.time()
    vdf, _vh = read_vcf(
        spark,
        "/root/reference/src/test/resources/HiSeq.10000.vcf.bgz",
        split_size=64 * 1024,
    )
    nv = vdf.count()
    t_vcf = time.time() - t0

    # CRAM path: v3 + rANS decode of the GATK fixture
    from disq_spark.sources.cram_source import read_cram

    t0 = time.time()
    cdf, _ch = read_cram(
        spark,
        "/root/reference/src/test/resources/CEUTrio.HiSeq.WGS.b37.NA12878.20.21.10m-10m100.cram",
        missing_ref_as_n=True,
    )
    nc = cdf.count()
    t_cram = time.time() - t0

    # FASTQ: write a sizable file from the reads, then timed scan
    from disq_spark.sources.fastq import read_fastq, write_fastq

    fq_df = big.filter(F.col("seq").isNotNull() & F.col("qual").isNotNull()).select(
        F.col("name"), F.lit(None).cast("string").alias("comment"), "seq", "qual"
    )
    fq_path = os.path.join(tmp, "big.fastq")
    write_fastq(fq_df, fq_path)
    nf_expect = fq_df.count()
    t0 = time.time()
    nf = read_fastq(spark, fq_path, split_size=4 * 1024 * 1024).count()
    t_fastq = time.time() - t0
    assert nf == nf_expect, (nf, nf_expect)

    print(
        json.dumps(
            {
                "records": n,
                "bam_mb": round(size_mb, 1),
                "write_s": round(t_write, 2),
                "write_rec_per_s": int(n / t_write),
                "read_s": round(t_read, 2),
                "read_rec_per_s": int(n / t_read),
                "read_raw_tags_s": round(t_read_raw, 2),
                "read_raw_tags_rec_per_s": int(n / t_read_raw),
                "agg_s": round(t_agg, 2),
                "n_base": n_base,
                "vcf_records": nv,
                "vcf_s": round(t_vcf, 2),
                "cram_records": nc,
                "cram_s": round(t_cram, 2),
                "fastq_records": nf,
                "fastq_s": round(t_fastq, 2),
                "fastq_rec_per_s": int(nf / t_fastq),
            }
        )
    )


if __name__ == "__main__":
    main()
