"""Typed projections over the variants DataFrame.

The variants schema keeps INFO as ``map<string,string>`` and genotype
attributes as ``map<string,string>`` — lossless and header-independent
(htsjdk's lazy-genotype strategy, DisqKryoRegistrator.java:118-126, for
the same reason). These helpers apply the *header's* declared types
(##INFO / ##FORMAT lines) as Catalyst casts, giving typed columns for
query use while the base schema stays stable:

    df = with_typed_info(df, header)          # info_DP: bigint, ...
    g  = explode_genotypes(df, header)        # one row per (variant, sample)

All pure Column expressions — casts, splits, map lookups — so Catalyst
prunes and pushes them like any projection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from disq_spark.headers import VcfHeader

_LINE_RE = re.compile(r"##(INFO|FORMAT)=<(.*)>\s*$")


@dataclass(frozen=True)
class FieldDecl:
    id: str
    number: str  # "0","1","A","R","G","."
    type: str  # Integer Float Flag Character String


def declared_fields(header: VcfHeader, kind: str) -> list[FieldDecl]:
    """Parse ##INFO= / ##FORMAT= declarations from the header."""
    out = []
    for ln in header.lines:
        m = _LINE_RE.match(ln)
        if not m or m.group(1) != kind:
            continue
        attrs = dict(
            kv.split("=", 1) for kv in re.findall(r'(?:[^,"]|"[^"]*")+', m.group(2)) if "=" in kv
        )
        out.append(
            FieldDecl(attrs.get("ID", ""), attrs.get("Number", "."), attrs.get("Type", "String"))
        )
    return [f for f in out if f.id]


def _cast_scalar(col: Column, typ: str) -> Column:
    if typ == "Integer":
        return col.cast("long")
    if typ == "Float":
        return col.cast("double")
    return col  # String / Character stay strings


def _typed_expr(raw: Column, decl: FieldDecl) -> Column:
    if decl.type == "Flag":
        return raw.isNotNull()
    if decl.number in ("0", "1"):
        return _cast_scalar(raw, decl.type)
    # multi-valued: comma-separated list per VCF spec
    arr = F.split(raw, ",")
    if decl.type == "Integer":
        return F.transform(arr, lambda x: x.cast("long"))
    if decl.type == "Float":
        return F.transform(arr, lambda x: x.cast("double"))
    return arr


def with_typed_info(df: DataFrame, header: VcfHeader, prefix: str = "info_") -> DataFrame:
    """Add one typed column per declared ##INFO field (``info_<ID>``)."""
    cols = [df[c] for c in df.columns]
    for decl in declared_fields(header, "INFO"):
        raw = F.col("info").getItem(decl.id)
        cols.append(_typed_expr(raw, decl).alias(prefix + decl.id))
    return df.select(*cols)


def explode_genotypes(df: DataFrame, header: VcfHeader) -> DataFrame:
    """One row per (variant, sample) with typed FORMAT columns.

    Output: contig, start, end, ref, alts, sample, gt + fmt_<ID> typed
    per the ##FORMAT declarations. The explode is the only shuffle-free
    row multiplication; at cohort scale (1000s of samples) follow with a
    repartition on sample for sample-major analysis.
    """
    g = df.select(
        "contig",
        "start",
        "end",
        "ref",
        "alts",
        F.explode("genotypes").alias("g"),
    )
    cols = [
        "contig",
        "start",
        "end",
        "ref",
        "alts",
        F.col("g.sample").alias("sample"),
        F.col("g.gt").alias("gt"),
    ]
    for decl in declared_fields(header, "FORMAT"):
        if decl.id == "GT":
            continue
        raw = F.col("g.attrs").getItem(decl.id)
        # '.' encodes missing inside sample fields
        raw = F.when(raw == ".", F.lit(None)).otherwise(raw)
        cols.append(_typed_expr(raw, decl).alias("fmt_" + decl.id))
    return g.select(*cols)
