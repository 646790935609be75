"""Variant QC aggregates over the VCF frame (`sources.variants.read_vcf`).

bcftools-stats analogs expressed as pure column expressions — no Python
in the row path, one map-side-combinable aggregation each. These are
the summary passes a joint-calling pipeline runs over every produced
VCF; at 100 TB they are a single scan + tiny shuffle (#groups rows).

Reference parity: the reference exposes the VCF rows themselves
(HtsjdkVariantsRddTest.java drives read/write; analysis is left to
downstream tools) — these operators are that downstream layer,
re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Biallelic SNP: 1-base ACGT ref, exactly one 1-base ACGT alt.
_ACGT = ("A", "C", "G", "T")


def _is_biallelic_snp() -> F.Column:
    alt = F.col("alts")[0]
    return (
        (F.length("ref") == 1)
        & F.col("ref").isin(*_ACGT)
        & (F.size("alts") == 1)
        & (F.length(alt) == 1)
        & alt.isin(*_ACGT)
    )


def ts_tv_stats(df: DataFrame) -> DataFrame:
    """Transition/transversion counts over biallelic SNPs (bcftools
    stats "ts/tv" line). Transitions are A<->G and C<->T; everything
    else ACGT->ACGT is a transversion. Output: one row
    (n_snp, n_ts, n_tv, ts_tv) with ts_tv rounded to 4 digits.
    """
    snp = df.filter(_is_biallelic_snp())
    pur = ("A", "G")
    is_ts = (F.col("ref").isin(*pur) == F.col("alts")[0].isin(*pur))
    return snp.agg(
        F.count("*").alias("n_snp"),
        F.sum(is_ts.cast("long")).alias("n_ts"),
        F.sum((~is_ts).cast("long")).alias("n_tv"),
    ).select(
        "n_snp",
        "n_ts",
        "n_tv",
        F.round(F.col("n_ts") / F.col("n_tv"), 4).alias("ts_tv"),
    )


def genotype_sample_stats(df: DataFrame) -> DataFrame:
    """Per-sample genotype tallies (bcftools stats "PSC" analog).

    Output: (sample, n_called, n_missing, n_hom_ref, n_het, n_hom_alt).
    A genotype is missing when gt is NULL/'.' or any allele is '.';
    het = >1 distinct called allele; hom_alt = all alleles equal and
    non-'0'. Phasing ('|' vs '/') is irrelevant to the tallies.

    One explode (per-sample fan-out, shuffle-free) + one groupBy(sample)
    whose cardinality is #samples — the shuffle is trivially small at
    any corpus size.
    """
    g = df.select(F.explode("genotypes").alias("g")).select(
        F.col("g.sample").alias("sample"), F.col("g.gt").alias("gt")
    )
    alleles = F.split(F.col("gt"), r"[/|]")
    missing = (
        F.col("gt").isNull() | (F.col("gt") == ".") | F.array_contains(alleles, ".")
    )
    distinct_n = F.size(F.array_distinct(alleles))
    hom_ref = ~missing & (distinct_n == 1) & (alleles[0] == "0")
    hom_alt = ~missing & (distinct_n == 1) & (alleles[0] != "0")
    het = ~missing & (distinct_n > 1)
    return (
        g.groupBy("sample")
        .agg(
            F.sum((~missing).cast("long")).alias("n_called"),
            F.sum(missing.cast("long")).alias("n_missing"),
            F.sum(hom_ref.cast("long")).alias("n_hom_ref"),
            F.sum(het.cast("long")).alias("n_het"),
            F.sum(hom_alt.cast("long")).alias("n_hom_alt"),
        )
        .orderBy("sample")
    )


def variant_density(df: DataFrame, bin_size: int = 1_000_000) -> DataFrame:
    """Variants per genomic bin: (contig, bin, n_variants, n_snp,
    mean_qual). The groupBy key count is genome-size / bin_size —
    bounded by the genome, not the cohort, so the shuffle never grows
    with input size."""
    return (
        df.groupBy("contig", (F.col("start") / bin_size).cast("long").alias("bin"))
        .agg(
            F.count("*").alias("n_variants"),
            F.sum(_is_biallelic_snp().cast("long")).alias("n_snp"),
            F.round(F.avg("qual"), 4).alias("mean_qual"),
        )
        .orderBy("contig", "bin")
    )


def _gt_state_and_alleles(side: str):
    """(state, resolved-allele multiset) for one exploded genotype side.

    State per GATK GenotypeConcordance: MISSING (no GT / any '.'),
    HOM_REF, HET, HOM_VAR. Alleles resolve allele INDEXES to their
    sequences (0 -> ref, k -> alts[k-1]) and sort them, so '0/1' vs
    '1/0' — or the same genotype spelled against re-ordered ALTs —
    compare equal. Phasing is ignored (| == /)."""
    gt = F.col(f"{side}_gt")
    idxs = F.split(gt, r"[/|]")
    missing = gt.isNull() | (gt == ".") | F.array_contains(idxs, ".")
    distinct_n = F.size(F.array_distinct(idxs))
    state = (
        F.when(missing, "MISSING")
        .when((distinct_n == 1) & (idxs[0] == "0"), "HOM_REF")
        .when(distinct_n == 1, "HOM_VAR")
        .otherwise("HET")
    )
    resolved = F.sort_array(
        F.transform(
            idxs,
            lambda i: F.when(i == "0", F.col("ref")).otherwise(
                F.col(f"{side}_alts")[i.cast("int") - 1]
            ),
        )
    )
    return state, F.when(missing, F.lit(None)).otherwise(resolved)


def _gt_side(df: DataFrame, side: str, sample: str | None) -> DataFrame:
    g = df.select(
        "contig", "start", "ref", F.col("alts").alias(f"{side}_alts"),
        F.lit(1).alias(f"{side}_present"),
        F.explode("genotypes").alias("g"),
    ).select(
        "contig", "start", "ref", f"{side}_alts", f"{side}_present",
        F.col("g.sample").alias("sample"), F.col("g.gt").alias(f"{side}_gt"),
    )
    if sample is not None:
        g = g.filter(F.col("sample") == sample).drop("sample")
    return g


def genotype_concordance(
    truth: DataFrame,
    eval_df: DataFrame,
    truth_sample: str | None = None,
    eval_sample: str | None = None,
) -> DataFrame:
    """Genotype concordance confusion matrix between two call sets
    (GATK GenotypeConcordance / bcftools gtcheck analog).

    Sites are matched on (contig, POS, REF); genotypes are compared by
    their RESOLVED allele multisets, so allele reordering and phasing
    never produce false discordance. Sites present in only one set
    count against the other side as state 'NO_SITE'. When
    ``truth_sample``/``eval_sample`` are given, each side is restricted
    to that sample and matching is site-level (the bcftools-gtcheck
    sample-pair shape); otherwise samples must match by name (the
    multi-sample GATK shape).

    Output: (truth_state, eval_state, n_sites, n_gt_match) — states in
    {HOM_REF, HET, HOM_VAR, MISSING, NO_SITE}; ``n_gt_match`` counts
    rows whose resolved allele sets are identical (only meaningful on
    the diagonal-ish cells; NO_SITE rows are always 0).

    Plan shape: explode per-sample (shuffle-free), one equi-join on
    (contig, start, ref[, sample]) — AQE-planned, broadcastable when
    one side is a small truth panel — then a groupBy over a ≤25-row
    key space: map-side combinable, output bounded by the state grid,
    never by cohort size.
    """
    on = ["contig", "start", "ref"]
    t = _gt_side(truth, "t", truth_sample)
    e = _gt_side(eval_df, "e", eval_sample)
    if truth_sample is None and eval_sample is None:
        on = on + ["sample"]
    j = t.join(e, on, "full_outer")
    t_state, t_all = _gt_state_and_alleles("t")
    e_state, e_all = _gt_state_and_alleles("e")
    # a side absent from the join entirely (full_outer filled its
    # non-nullable presence marker with null) is NO_SITE
    t_state = F.when(F.col("t_present").isNull(), "NO_SITE").otherwise(t_state)
    e_state = F.when(F.col("e_present").isNull(), "NO_SITE").otherwise(e_state)
    match = (
        t_all.isNotNull() & e_all.isNotNull() & (t_all == e_all)
    ).cast("long")
    return (
        j.select(t_state.alias("truth_state"), e_state.alias("eval_state"), match.alias("m"))
        .groupBy("truth_state", "eval_state")
        .agg(F.count("*").alias("n_sites"), F.sum("m").alias("n_gt_match"))
    )


def split_multiallelics(df: DataFrame, number_a_keys: tuple = ("AF", "AC")) -> DataFrame:
    """bcftools ``norm -m-`` analog: one output row per ALT allele.

    Biallelic rows pass through untouched. For split rows, genotype
    allele indexes are remapped per the bcftools convention — indexes
    pointing at THIS alt become 1, indexes pointing at other alts
    become 0 (ref), '.' stays missing — and comma-lists in INFO keys
    named in ``number_a_keys`` (Number=A semantics) are sliced to this
    alt's element; all other INFO keys pass through verbatim.

    Pure per-row fan-out (posexplode over a ≤#alts array) — shuffle-free,
    output rows = total ALT count.
    """
    multi = F.size("alts") > 1
    idx = F.col("__ai")  # 0-based alt index
    # remap one GT string: split on / or |, map each allele index token
    remap = F.transform(
        F.col("genotypes"),
        lambda g: F.struct(
            g["sample"].alias("sample"),
            F.when(g["gt"].isNull(), F.lit(None).cast("string"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(g["gt"], r"[/|]"),
                        lambda a: F.when(a == ".", a).when(
                            a.cast("int") == idx + 1, F.lit("1")
                        ).otherwise(F.lit("0")),
                    ),
                    "/",
                )
            )
            .alias("gt"),
            g["attrs"].alias("attrs"),
        ),
    )
    sliced_info = F.map_from_entries(
        F.transform(
            F.map_entries("info"),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.when(
                    e["key"].isin(*number_a_keys)
                    & (F.size(F.split(e["value"], ",")) > idx),
                    F.split(e["value"], ",")[idx],
                )
                .otherwise(e["value"])
                .alias("value"),
            ),
        )
    )
    split_rows = (
        df.filter(multi)
        .select("*", F.posexplode("alts").alias("__ai", "__alt"))
        .withColumn("alts", F.array(F.col("__alt")))
        .withColumn("genotypes", F.when(F.col("genotypes").isNull(), F.col("genotypes")).otherwise(remap))
        .withColumn("info", F.when(F.col("info").isNull(), F.col("info")).otherwise(sliced_info))
        .drop("__ai", "__alt")
    )
    return df.filter(~multi | F.col("alts").isNull()).unionByName(split_rows)


def _run_len_sql(a: str, b: str, from_end: bool) -> str:
    """SQL for the length of the common prefix/suffix run of string
    expressions ``a`` and ``b``, capped at min(len)-1 (parsimony keeps
    >= 1 base of each allele). The aggregate counts only while
    CONSECUTIVE positions matched (acc = i-1 gate). The cap guard is
    explicit because Spark's sequence(1, 0) produces a DESCENDING
    [1, 0], not an empty range."""
    if from_end:
        ca = f"substring({a}, length({a}) - i + 1, 1)"
        cb = f"substring({b}, length({b}) - i + 1, 1)"
    else:
        ca = f"substring({a}, i, 1)"
        cb = f"substring({b}, i, 1)"
    cap = f"(least(length({a}), length({b})) - 1)"
    seq = f"(case when {cap} < 1 then cast(array() as array<int>) else sequence(1, {cap}) end)"
    return (
        f"aggregate({seq}, 0, "
        f"(acc, i) -> case when acc = i - 1 and {ca} = {cb} then i else acc end)"
    )


def trim_variants(df: DataFrame) -> DataFrame:
    """Parsimony trim (bcftools norm realignment's trim step): remove
    the longest shared SUFFIX, then the longest shared PREFIX, between
    REF and every ALT, keeping at least one base of each and advancing
    POS (and recomputing END) by the prefix length. Alleles are trimmed
    only by what is shared across ALL alts of the row, so run
    ``split_multiallelics`` first for per-alt parsimony. Symbolic
    alleles (<NON_REF>, <DEL>, ...), breakends, and missing-alt rows
    pass through unchanged.

    Pure column expressions (two higher-order aggregates per row) — no
    shuffle, no Python in the row path.
    """
    symbolic = (
        "exists(alts, a -> a like '<%' or instr(a, '[') > 0 or instr(a, ']') > 0)"
    )
    trimmable = F.expr(
        f"alts is not null and size(alts) > 0 and not {symbolic} "
        "and (length(ref) > 1 or exists(alts, a -> length(a) > 1))"
    )
    suf = F.expr(
        "array_min(transform(alts, a -> " + _run_len_sql("ref", "a", True) + "))"
    )
    d = df.withColumn("__trim", trimmable).withColumn(
        "__suf", F.when(F.col("__trim"), suf).otherwise(F.lit(0))
    )
    d = d.withColumn(
        "__ref1", F.expr("substring(ref, 1, length(ref) - __suf)")
    ).withColumn(
        "__alts1",
        F.when(
            F.col("__suf") > 0,
            F.expr("transform(alts, a -> substring(a, 1, length(a) - __suf))"),
        ).otherwise(F.col("alts")),
    )
    pre = F.expr(
        "array_min(transform(__alts1, a -> " + _run_len_sql("__ref1", "a", False) + "))"
    )
    d = d.withColumn("__pre", F.when(F.col("__trim"), pre).otherwise(F.lit(0)))
    return (
        d.withColumn("start", F.col("start") + F.col("__pre"))
        .withColumn("ref", F.expr("substring(__ref1, __pre + 1)"))
        .withColumn(
            "alts",
            F.when(
                F.col("__pre") > 0,
                F.expr("transform(__alts1, a -> substring(a, __pre + 1))"),
            ).otherwise(F.col("__alts1")),
        )
        # untrimmable rows (symbolic/END-carrying gVCF blocks) keep their
        # original END; trimmed rows get END = POS + len(ref') - 1
        .withColumn(
            "end",
            F.when(F.col("__trim"), F.col("start") + F.length("ref") - 1).otherwise(
                F.col("end")
            ),
        )
        .drop("__trim", "__suf", "__ref1", "__alts1", "__pre")
    )
