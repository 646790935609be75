"""Genomic relational operators the reference lacks (SURVEY.md §7 M6 —
capability upgrades over disq-bio/disq, which only does I/O):

- interval_join: distributed overlap join via genome binning. Both sides
  explode to fixed-width bins, equi-join on (contig, bin) — a hash
  shuffle Catalyst handles — then a residual overlap filter. The
  classic duplicate-match problem (a pair overlapping in k bins matches
  k times) is solved with the standard assign-to-one-bin trick: a pair
  is kept only in bin max(floor(l.start/W), floor(r.start/W)).
  At 100 TB this is THE way to do reads-x-targets joins: shuffle is
  proportional to data + interval density, never O(n*m).
- coordinate_sort: repartitionByRange on (contig rank, start) +
  sortWithinPartitions — a total order with no single-reducer
  bottleneck ("This library does not do any sorting" README.md:148 —
  we do).
- mark_duplicates: simplified Picard semantics — group fragments by
  (library?, contig, start, strand, mate position), keep the highest
  base-quality-sum record, flag the rest 0x400.
- pair_reads: queryname pair atomicity via a name shuffle — the
  reference documents this as an unimplemented goal (README.md:39,162-166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from disq_spark.headers import SamHeader
from disq_spark.schemas import FLAG_DUPLICATE, FLAG_REVERSE, FLAG_SECONDARY, FLAG_SUPPLEMENTARY, FLAG_UNMAPPED

DEFAULT_BIN_SIZE = 10_000


def _binned(df: DataFrame, start: str, end: str, bin_size: int, side: str) -> DataFrame:
    return df.withColumn(
        f"__bin_{side}",
        F.explode(
            F.sequence(
                (F.col(start) / bin_size).cast("long"), (F.col(end) / bin_size).cast("long")
            )
        ),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    contig: str = "contig",
    start: str = "start",
    end: str = "end",
    right_prefix: str = "r_",
    bin_size: int = DEFAULT_BIN_SIZE,
) -> DataFrame:
    """Overlap (inner) join on 1-based closed intervals.

    ``right`` columns are prefixed with ``right_prefix`` in the output.
    """
    r = right
    for c in r.columns:
        r = r.withColumnRenamed(c, right_prefix + c)
    rc, rs, re_ = right_prefix + contig, right_prefix + start, right_prefix + end

    lb = _binned(left, start, end, bin_size, "l")
    rb = _binned(r, rs, re_, bin_size, "r")
    joined = lb.join(
        rb,
        (F.col(contig) == F.col(rc)) & (F.col("__bin_l") == F.col("__bin_r")),
        "inner",
    )
    anchor = F.greatest(
        (F.col(start) / bin_size).cast("long"), (F.col(rs) / bin_size).cast("long")
    )
    return (
        joined.filter(
            (F.col(start) <= F.col(re_))
            & (F.col(end) >= F.col(rs))
            & (F.col("__bin_l") == anchor)
        )
        .drop("__bin_l", "__bin_r")
    )


def coordinate_sort(df: DataFrame, header: SamHeader, num_partitions: int | None = None) -> DataFrame:
    """Total coordinate order (sequence-dictionary contig rank, start),
    unplaced reads last — htsjdk coordinate sort semantics."""
    order = header.contig_index()
    mapping = F.create_map(*[F.lit(x) for kv in order.items() for x in kv])
    rank = F.when(F.col("contig").isNull(), F.lit(2**31 - 1)).otherwise(mapping[F.col("contig")])
    with_rank = df.withColumn("__rank", rank)
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        with_rank.repartitionByRange(int(n), "__rank", "start")
        .sortWithinPartitions("__rank", "start")
        .drop("__rank")
    )


def mark_duplicates(df: DataFrame) -> DataFrame:
    """Flag duplicate fragments (bit 0x400) keeping the best per position.

    Key: (contig, start, orientation, mate_contig, mate_start); score:
    sum of phred qualities >= 15 (Picard's DUPLICATE_SCORING default
    approximated column-side); secondary/supplementary/unmapped records
    are passed through unexamined, like Picard.
    """
    exempt = (
        (F.col("flags").bitwiseAND(FLAG_UNMAPPED) != 0)
        | (F.col("flags").bitwiseAND(FLAG_SECONDARY) != 0)
        | (F.col("flags").bitwiseAND(FLAG_SUPPLEMENTARY) != 0)
    )
    qual_score = F.when(F.col("qual").isNull(), F.lit(0)).otherwise(
        F.aggregate(
            F.transform(
                F.split(F.col("qual"), ""),
                lambda c: F.when(F.ascii(c) - 33 >= 15, F.ascii(c) - 33).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
    )
    strand = F.col("flags").bitwiseAND(FLAG_REVERSE)
    w = W.partitionBy("contig", "start", strand, "mate_contig", "mate_start").orderBy(
        F.desc("__score"), F.asc("name")
    )
    scored = df.withColumn("__score", qual_score).withColumn(
        "__rn", F.when(exempt, F.lit(1)).otherwise(F.row_number().over(w))
    )
    return scored.withColumn(
        "flags",
        F.when(
            ~exempt & (F.col("__rn") > 1),
            F.col("flags").bitwiseOR(FLAG_DUPLICATE),
        ).otherwise(F.col("flags")),
    ).drop("__score", "__rn")


def pair_reads(df: DataFrame) -> DataFrame:
    """Group primary alignments by queryname: one row per template with a
    ``reads`` array — the pair-atomicity guarantee the reference lists as
    unimplemented (README.md:39). A single hash shuffle on name."""
    primary = df.filter(
        (F.col("flags").bitwiseAND(FLAG_SECONDARY) == 0)
        & (F.col("flags").bitwiseAND(FLAG_SUPPLEMENTARY) == 0)
    )
    return primary.groupBy("name").agg(
        F.sort_array(
            F.collect_list(F.struct("flags", "contig", "start", "end", "cigar", "seq", "qual"))
        ).alias("reads"),
        F.count("*").alias("n_reads"),
    )
