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


def coverage_bins(
    df: DataFrame,
    bin_size: int = 10_000,
    contig: str = "contig",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Binned read-depth: (contig, bin, bin_start, n_reads, mean_depth).

    Each mapped read explodes to the fixed-width genome bins it overlaps
    (span/bin_size + 1 rows — bounded, never per-base), then one
    groupBy with map-side partial aggregation: n_reads = reads touching
    the bin, mean_depth = sum of per-read overlap bases / bin_size.
    The scale shape of samtools-depth: shuffle volume is reads x
    bins-per-read, output is genome/bin_size rows.

    Bin b covers 1-based positions [b*bin_size + 1, (b+1)*bin_size].
    """
    bs = bin_size
    c, s, e = F.col(contig), F.col(start), F.col(end)
    binned = (
        df.filter(c.isNotNull() & s.isNotNull() & e.isNotNull())
        .withColumn("bin", F.explode(F.sequence(((s - 1) / bs).cast("long"), ((e - 1) / bs).cast("long"))))
    )
    b = F.col("bin")
    overlap = F.least(e, (b + 1) * bs) - F.greatest(s, b * bs + 1) + 1
    return (
        binned.groupBy(c.alias("contig"), b.alias("bin"))
        .agg(
            F.count("*").alias("n_reads"),
            F.sum(overlap).alias("covered_bases"),
        )
        .select(
            "contig",
            "bin",
            (F.col("bin") * bs + 1).alias("bin_start"),
            "n_reads",
            F.round(F.col("covered_bases") / float(bs), 4).alias("mean_depth"),
        )
    )


def coverage_depth(
    df: DataFrame,
    contig: str = "contig",
    start: str = "start",
    end: str = "end",
    chunk_size: int = 1 << 20,
) -> DataFrame:
    """Exact per-base depth as run-length segments:
    (contig, pos, next_pos, depth) — depth holds for [pos, next_pos).

    Difference-array + DISTRIBUTED prefix sum. The naive formulation
    (one window per contig) serializes each chromosome onto a single
    reducer — at 100 TB a whole-genome depth pass would run on ~24
    tasks. Instead, the classic two-level scan:

      1. events: +1 at read start, -1 past read end, pre-summed per
         (contig, pos) — map-side partial agg.
      2. within-chunk prefix sum: window over (contig, chunk) where
         chunk = pos div chunk_size — parallelism = genome/chunk_size.
      3. chunk metadata: per-chunk delta totals + first event position
         (tiny: one row per chunk with events) — prefix-summed / lead'd
         per contig, the only per-contig serial step, over
         ~genome/chunk_size rows, then broadcast-joined back.
      4. depth = within-chunk sum + exclusive chunk offset; next_pos =
         lead within chunk, falling back to the next chunk's first
         event at chunk boundaries.

    Output rows = distinct event positions (2x reads worst case), run-
    length encoded — including the depth-0 segments between covered
    regions (next_pos NULL only at each contig's final event).
    """
    c, s, e = F.col(contig), F.col(start), F.col(end)
    mapped = df.filter(c.isNotNull() & s.isNotNull() & e.isNotNull())
    events = (
        mapped.select(c.alias("contig"), s.alias("pos"), F.lit(1).alias("delta"))
        .union(mapped.select(c.alias("contig"), (e + 1).alias("pos"), F.lit(-1).alias("delta")))
        .groupBy("contig", "pos")
        .agg(F.sum("delta").alias("delta"))
        .withColumn("chunk", (F.col("pos") / chunk_size).cast("long"))
    )
    win = W.partitionBy("contig", "chunk").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    within = events.withColumn("within", F.sum("delta").over(win))
    meta = events.groupBy("contig", "chunk").agg(
        F.sum("delta").alias("chunk_total"), F.min("pos").alias("first_pos")
    )
    offw = W.partitionBy("contig").orderBy("chunk").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    leadw = W.partitionBy("contig").orderBy("chunk")
    meta = meta.select(
        "contig",
        "chunk",
        (F.sum("chunk_total").over(offw) - F.col("chunk_total")).alias("offset"),
        F.lead("first_pos").over(leadw).alias("next_chunk_first"),
    )
    nextw = W.partitionBy("contig", "chunk").orderBy("pos")
    return (
        within.join(F.broadcast(meta), ["contig", "chunk"])
        .withColumn("depth", (F.col("within") + F.col("offset")).cast("long"))
        .withColumn(
            "next_pos", F.coalesce(F.lead("pos").over(nextw), F.col("next_chunk_first"))
        )
        .select("contig", "pos", "next_pos", "depth")
    )


def callable_loci(
    depth_segments: DataFrame,
    min_depth: int = 4,
    max_depth: int | None = None,
) -> DataFrame:
    """Merge run-length depth segments (coverage_depth output) into
    maximal 'callable' intervals where min_depth <= depth (<= max_depth):
    (contig, start, end, span) — the GATK CallableLoci analog.

    Gap-and-islands with one window pass per contig: a new island starts
    wherever the previous qualifying segment doesn't touch this one
    (prev_end != start); island id = running count of starts; one
    groupBy merges each island. Segments are 2x reads rows at worst, so
    the window input is event-sized, not base-sized.
    """
    q = depth_segments.filter(
        F.col("next_pos").isNotNull() & (F.col("depth") >= min_depth)
    )
    if max_depth is not None:
        q = q.filter(F.col("depth") <= max_depth)
    w = W.partitionBy("contig").orderBy("pos")
    islands = q.withColumn(
        "new_island",
        (F.coalesce(F.lag("next_pos").over(w), F.lit(-1)) != F.col("pos")).cast("long"),
    ).withColumn("island", F.sum("new_island").over(w))
    return (
        islands.groupBy("contig", "island")
        .agg(
            F.min("pos").alias("start"),
            (F.max("next_pos") - 1).alias("end"),
        )
        .select(
            "contig", "start", "end", (F.col("end") - F.col("start") + 1).alias("span")
        )
    )


def downsample_reads(df: DataFrame, fraction: float, seed: str = "") -> DataFrame:
    """samtools ``view -s`` analog: keep ~``fraction`` of templates,
    selected by a hash of the read *name* — both mates of a pair and all
    secondary/supplementary records of a template are kept or dropped
    together, under any partitioning, retry, or engine (the property
    per-record RNG sampling cannot give). A pure scan-time filter: no
    shuffle, no state.
    """
    from disq_spark.operators.sampling import uniform_sql

    return df.filter(F.expr(uniform_sql("name", seed)) < fraction)
