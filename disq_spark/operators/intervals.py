"""Distributed interval algebra over (contig, start, end) tables —
bedtools merge / intersect / subtract / complement / jaccard analogs.

All set operations use GENOME-SPACE (merged) semantics: inputs are
treated as position sets, exactly what bedtools produces when its
inputs are merged (bedtools itself recommends `merge` before set ops;
per-record bookkeeping variants can be layered with ``interval_join``).
Coordinates are 1-based inclusive, the convention of the reads/variants
frames (BED's half-open 0-based form is converted by ``sources.bed``).

Scale shape: every operation is one event RLE — the same chunked
two-level prefix sum as ``operators.genomics.coverage_depth``, so no
per-contig single reducer on the event pass — followed by a
gap-and-islands merge over QUALIFYING segments only (2x interval rows
at worst, BED-sized not genome-sized). Reference parity: the reference
engine has no interval algebra (it defers to htsjdk's IntervalList in
tests); these are the downstream layer re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _events(df: DataFrame, da: int, db: int) -> DataFrame:
    return df.select(
        F.col("contig"),
        F.col("start").alias("pos"),
        F.lit(da).alias("da"),
        F.lit(db).alias("db"),
    ).union(
        df.select(
            F.col("contig"),
            (F.col("end") + 1).alias("pos"),
            F.lit(-da).alias("da"),
            F.lit(-db).alias("db"),
        )
    )


def dual_depth_segments(
    a: DataFrame, b: DataFrame, chunk_size: int = 1 << 20
) -> DataFrame:
    """Run-length segments (contig, pos, next_pos, depth_a, depth_b)
    over the union of both inputs' boundary positions. Chunked
    two-level prefix sum (within-chunk window + broadcast chunk
    offsets), two counters in one pass."""
    events = (
        _events(a, 1, 0)
        .union(_events(b, 0, 1))
        .groupBy("contig", "pos")
        .agg(F.sum("da").alias("da"), F.sum("db").alias("db"))
        .withColumn("chunk", (F.col("pos") / chunk_size).cast("long"))
    )
    win = W.partitionBy("contig", "chunk").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    within = events.withColumn("wa", F.sum("da").over(win)).withColumn(
        "wb", F.sum("db").over(win)
    )
    meta = events.groupBy("contig", "chunk").agg(
        F.sum("da").alias("ta"),
        F.sum("db").alias("tb"),
        F.min("pos").alias("first_pos"),
    )
    offw = W.partitionBy("contig").orderBy("chunk").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    leadw = W.partitionBy("contig").orderBy("chunk")
    meta = meta.select(
        "contig",
        "chunk",
        (F.sum("ta").over(offw) - F.col("ta")).alias("oa"),
        (F.sum("tb").over(offw) - F.col("tb")).alias("ob"),
        F.lead("first_pos").over(leadw).alias("next_chunk_first"),
    )
    nextw = W.partitionBy("contig", "chunk").orderBy("pos")
    return (
        within.join(F.broadcast(meta), ["contig", "chunk"])
        .withColumn("depth_a", (F.col("wa") + F.col("oa")).cast("long"))
        .withColumn("depth_b", (F.col("wb") + F.col("ob")).cast("long"))
        .withColumn(
            "next_pos",
            F.coalesce(F.lead("pos").over(nextw), F.col("next_chunk_first")),
        )
        .select("contig", "pos", "next_pos", "depth_a", "depth_b")
    )


def _islands(segments: DataFrame, keep) -> DataFrame:
    """Merge touching qualifying segments into maximal intervals."""
    q = segments.filter(F.col("next_pos").isNotNull() & keep)
    w = W.partitionBy("contig").orderBy("pos")
    isl = q.withColumn(
        "new_island",
        (F.coalesce(F.lag("next_pos").over(w), F.lit(-1)) != F.col("pos")).cast(
            "long"
        ),
    ).withColumn("island", F.sum("new_island").over(w))
    return (
        isl.groupBy("contig", "island")
        .agg(F.min("pos").alias("start"), (F.max("next_pos") - 1).alias("end"))
        .select(
            "contig",
            "start",
            "end",
            (F.col("end") - F.col("start") + 1).alias("span"),
        )
    )


def merge_intervals_table(df: DataFrame) -> DataFrame:
    """bedtools merge: maximal intervals covering the input's position
    set (book-ended intervals coalesce, as bedtools' default -d 0)."""
    empty = df.sparkSession.createDataFrame(
        [], "contig string, start long, end long"
    )
    segs = dual_depth_segments(df, empty)
    return _islands(segs, F.col("depth_a") > 0)


def intersect_intervals(a: DataFrame, b: DataFrame) -> DataFrame:
    """bedtools intersect (genome-space): positions covered by both."""
    segs = dual_depth_segments(a, b)
    return _islands(segs, (F.col("depth_a") > 0) & (F.col("depth_b") > 0))


def subtract_intervals(a: DataFrame, b: DataFrame) -> DataFrame:
    """bedtools subtract (genome-space): positions of A not in B."""
    segs = dual_depth_segments(a, b)
    return _islands(segs, (F.col("depth_a") > 0) & (F.col("depth_b") == 0))


def complement_intervals(
    df: DataFrame, refs: list[tuple[str, int]]
) -> DataFrame:
    """bedtools complement: genome minus the input's position set."""
    ref_df = df.sparkSession.createDataFrame(
        [(n, 1, int(ln)) for n, ln in refs], "contig string, start long, end long"
    )
    return subtract_intervals(ref_df, df)


def jaccard_intervals(a: DataFrame, b: DataFrame) -> DataFrame:
    """bedtools jaccard: one row (intersection_bp, union_bp, jaccard,
    n_intersections) over the two position sets."""
    segs = dual_depth_segments(a, b).filter(F.col("next_pos").isNotNull())
    span = F.col("next_pos") - F.col("pos")
    both = (F.col("depth_a") > 0) & (F.col("depth_b") > 0)
    either = (F.col("depth_a") > 0) | (F.col("depth_b") > 0)
    inter = _islands(segs, both)
    n_inter = inter.agg(F.count("*").alias("n")).select("n")
    sums = segs.agg(
        F.sum(F.when(both, span).otherwise(0)).alias("intersection_bp"),
        F.sum(F.when(either, span).otherwise(0)).alias("union_bp"),
    )
    return (
        sums.crossJoin(F.broadcast(n_inter))
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection_bp")
                / F.nullif(F.col("union_bp"), F.lit(0)),
                6,
            ),
        )
        .select(
            "intersection_bp", "union_bp", "jaccard", F.col("n").alias("n_intersections")
        )
    )


def interval_algebra_summary(
    a: DataFrame,
    b: DataFrame,
    refs: list[tuple[str, int]],
    chunk_size: int = 1 << 20,
) -> DataFrame:
    """The five-op algebra summary — (op, n_intervals, total_bp) rows for
    merge(a) / intersect(a,b) / subtract(a,b) / complement(a,refs) plus
    the jaccard(a,b) row carrying (intersection_bp, union_bp) — computed
    in ONE event-RLE pass instead of a 6-branch union of the individual
    operators (r12, guide §2.4/§2.6).

    Why it is equivalent: every op is an island count / span sum over
    the SAME run-length segment table, just under a different depth
    predicate — merge: depth_a>0; intersect: a>0 AND b>0; subtract:
    a>0 AND b=0; complement: depth_ref>0 AND a=0; jaccard: span sums
    under both/either. Adding the other inputs' boundary positions only
    SPLITS runs into adjacent segments, which the gap-and-islands merge
    re-joins, so one tri-depth segment table (a, b, reference) serves
    all five predicates. Island starts are counted with an unfiltered
    lag: segments tile each contig contiguously (next_pos = the next
    event position), so "new island" is exactly "this segment qualifies
    and its immediate predecessor does not" — the same breaks
    ``_islands``'s filtered lag produces. The expensive input (``a`` is
    a decoded BAM in the gate) enters through a single explode-based
    event subtree, so the decode appears once per physical consumer of
    the event table — the segment pass and the broadcast chunk-offset
    (``meta``) side, 2 subtrees total where the 6-branch union carried
    24 (plans/r12) — without a cache (the naive fix — persisting the
    decoded table — measured NEGATIVE in r11 §4.6: AQE serializes
    cached query stages the union overlapped).

    Differs from composing the individual operators only on EMPTY
    inputs: the jaccard sums return 0 (not null) whenever any boundary
    exists, and null only when all inputs are empty.
    """
    spark = a.sparkSession
    zero = F.lit(0)
    # single-subtree events for the expensive input: explode, not union
    a_ev = a.select(
        "contig",
        F.explode(
            F.array(
                F.struct(F.col("start").alias("pos"), F.lit(1).alias("d")),
                F.struct((F.col("end") + 1).alias("pos"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select(
        "contig",
        F.col("e.pos").alias("pos"),
        F.col("e.d").alias("da"),
        zero.alias("db"),
        zero.alias("dr"),
    )
    ref_df = spark.createDataFrame(
        [(n, 1, int(ln)) for n, ln in refs], "contig string, start long, end long"
    )

    def _ev(df: DataFrame, col: str) -> DataFrame:
        lo = df.select(
            "contig", F.col("start").alias("pos"), F.lit(1).alias(col)
        ).union(
            df.select("contig", (F.col("end") + 1).alias("pos"), F.lit(-1).alias(col))
        )
        others = [c for c in ("da", "db", "dr") if c != col]
        return lo.select(
            "contig", "pos", *[zero.alias(c) for c in others], F.col(col)
        ).select("contig", "pos", "da", "db", "dr")

    events = (
        a_ev.unionByName(_ev(b, "db"))
        .unionByName(_ev(ref_df, "dr"))
        .groupBy("contig", "pos")
        .agg(F.sum("da").alias("da"), F.sum("db").alias("db"), F.sum("dr").alias("dr"))
        .withColumn("chunk", (F.col("pos") / chunk_size).cast("long"))
    )
    # chunked two-level prefix sum, as dual_depth_segments, 3 counters
    win = W.partitionBy("contig", "chunk").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    within = (
        events.withColumn("wa", F.sum("da").over(win))
        .withColumn("wb", F.sum("db").over(win))
        .withColumn("wr", F.sum("dr").over(win))
    )
    meta = events.groupBy("contig", "chunk").agg(
        F.sum("da").alias("ta"),
        F.sum("db").alias("tb"),
        F.sum("dr").alias("tr"),
        F.min("pos").alias("first_pos"),
    )
    offw = W.partitionBy("contig").orderBy("chunk").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    leadw = W.partitionBy("contig").orderBy("chunk")
    meta = meta.select(
        "contig",
        "chunk",
        (F.sum("ta").over(offw) - F.col("ta")).alias("oa"),
        (F.sum("tb").over(offw) - F.col("tb")).alias("ob"),
        (F.sum("tr").over(offw) - F.col("tr")).alias("or_"),
        F.lead("first_pos").over(leadw).alias("next_chunk_first"),
    )
    nextw = W.partitionBy("contig", "chunk").orderBy("pos")
    segs = (
        within.join(F.broadcast(meta), ["contig", "chunk"])
        .withColumn("depth_a", (F.col("wa") + F.col("oa")).cast("long"))
        .withColumn("depth_b", (F.col("wb") + F.col("ob")).cast("long"))
        .withColumn("depth_r", (F.col("wr") + F.col("or_")).cast("long"))
        .withColumn(
            "next_pos",
            F.coalesce(F.lead("pos").over(nextw), F.col("next_chunk_first")),
        )
        .select("contig", "pos", "next_pos", "depth_a", "depth_b", "depth_r")
    )
    valid = F.col("next_pos").isNotNull()
    span = F.col("next_pos") - F.col("pos")
    in_a, in_b, in_r = (
        F.col("depth_a") > 0,
        F.col("depth_b") > 0,
        F.col("depth_r") > 0,
    )
    preds = {
        "merge": valid & in_a,
        "intersect": valid & in_a & in_b,
        "subtract": valid & in_a & ~in_b,
        "complement": valid & in_r & ~in_a,
    }
    flagged = segs.select(
        "contig",
        "pos",
        span.alias("span"),
        valid.alias("valid"),
        (in_a & in_b).alias("both"),
        (in_a | in_b).alias("either"),
        *[p.alias(f"q_{k}") for k, p in preds.items()],
    )
    lagw = W.partitionBy("contig").orderBy("pos")
    for k in preds:
        flagged = flagged.withColumn(
            f"new_{k}",
            F.col(f"q_{k}")
            & ~F.coalesce(F.lag(f"q_{k}").over(lagw), F.lit(False)),
        )
    aggs = []
    for k in preds:
        aggs.append(F.count(F.when(F.col(f"new_{k}"), 1)).alias(f"n_{k}"))
        aggs.append(F.sum(F.when(F.col(f"q_{k}"), F.col("span"))).alias(f"bp_{k}"))
    aggs.append(
        F.sum(
            F.when(F.col("valid"), F.when(F.col("both"), F.col("span")).otherwise(0))
        ).alias("j_inter")
    )
    aggs.append(
        F.sum(
            F.when(F.col("valid"), F.when(F.col("either"), F.col("span")).otherwise(0))
        ).alias("j_union")
    )
    one = flagged.agg(*aggs)
    return one.select(
        F.expr(
            "stack(5, "
            "'merge', n_merge, bp_merge, "
            "'intersect', n_intersect, bp_intersect, "
            "'subtract', n_subtract, bp_subtract, "
            "'complement', n_complement, bp_complement, "
            "'jaccard', j_inter, j_union"
            ") AS (op, n_intervals, total_bp)"
        )
    )


def liftover(
    df: DataFrame,
    chain: DataFrame,
    revcomp_alleles: bool = True,
) -> DataFrame:
    """Coordinate liftover (Picard LiftoverVcf / CrossMap analog) over
    an alignment-block table ``chain`` with columns (src_contig,
    src_start, src_end, dst_contig, dst_start, strand) -- the flattened
    form of a UCSC chain's ungapped blocks, 1-based inclusive.

    A record lifts iff one block fully contains its [start, end]
    (partial overlaps are rejected, matching LiftoverVcf's
    NoTarget/IndelStraddlesMultipleIntervals behavior). '+' blocks
    translate by offset; '-' blocks flip the interval around the block
    and, when ``revcomp_alleles`` and ref/alts columns exist,
    reverse-complement the alleles (symbolic alleles pass through).
    Output: the input columns with contig/start/end rewritten, plus
    ``lifted`` (false rows keep their original coordinates -- filter on
    the flag for the two LiftoverVcf output files).

    Chains are metadata-sized (even hg19->hg38 is ~10^6 blocks), so the
    join broadcasts; the fact table never shuffles.
    """
    c = chain.select(
        F.col("src_contig").alias("contig"),
        "src_start",
        "src_end",
        "dst_contig",
        "dst_start",
        "strand",
    )
    bc = F.broadcast(c)
    j = df.join(
        bc,
        (df["contig"] == bc["contig"])
        & (df["start"] >= bc["src_start"])
        & (df["end"] <= bc["src_end"]),
        "left",
    ).drop(bc["contig"])
    fwd = F.col("strand") == "+"
    new_start = F.when(
        fwd, F.col("dst_start") + (F.col("start") - F.col("src_start"))
    ).otherwise(F.col("dst_start") + (F.col("src_end") - F.col("end")))
    new_end = new_start + (F.col("end") - F.col("start"))
    lifted = F.col("dst_contig").isNotNull()
    out = (
        j.withColumn("lifted", lifted)
        .withColumn("__ns", new_start)
        .withColumn("__ne", new_end)
        .withColumn(
            "contig", F.when(lifted, F.col("dst_contig")).otherwise(F.col("contig"))
        )
        .withColumn("start", F.when(lifted, F.col("__ns")).otherwise(F.col("start")))
        .withColumn("end", F.when(lifted, F.col("__ne")).otherwise(F.col("end")))
    )
    rc = "reverse(translate(upper({0}), 'ACGTN', 'TGCAN'))"
    if revcomp_alleles and "ref" in df.columns:
        flip = lifted & ~fwd
        out = out.withColumn(
            "ref", F.when(flip, F.expr(rc.format("ref"))).otherwise(F.col("ref"))
        )
        if "alts" in df.columns:
            out = out.withColumn(
                "alts",
                F.when(
                    flip,
                    F.expr(
                        "transform(alts, a -> case when a like '<%' then a else "
                        + rc.format("a")
                        + " end)"
                    ),
                ).otherwise(F.col("alts")),
            )
    return out.drop(
        "src_start", "src_end", "dst_contig", "dst_start", "strand", "__ns", "__ne"
    )
