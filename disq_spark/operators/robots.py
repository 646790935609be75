"""robots.txt parsing + enforcement for crawl pipelines.

A compliant pipeline drops pages its robots.txt disallows before any
processing. Implemented as the documented RFC 9309 subset every major
crawler agrees on:

- only ``User-agent: *`` groups are honored (crawler-specific groups
  are data, not new plan shapes);
- ``Allow`` / ``Disallow`` path prefixes; empty ``Disallow:`` means
  allow-all;
- precedence: the LONGEST matching prefix wins; on equal length Allow
  wins; no matching rule -> allowed.

Scale shape: robots files are one-per-host — the rules table is tiny
relative to the page corpus, so enforcement is a BROADCAST join from
pages to rules keyed on host with a per-page longest-match reduction
(max_by over struct). The page corpus never shuffles.

Parsing is an Arrow-batched kernel (a user-agent group is a stateful
line scan, not a per-line map); the rules it emits are plain rows, so
the enforcement side stays pure-column and the gate's oracle can
recompute allowed-ness independently from the corpus-generation
arithmetic.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from disq_spark.functions.url import url_host, url_path


def parse_robots_rules(txt: str) -> list[tuple[bool, str]]:
    """[(allow, path_prefix)] for the ``*`` agent groups of one
    robots.txt body (serial helper, shared by kernel and tests)."""
    rules: list[tuple[bool, str]] = []
    applies = False
    last_was_agent = False
    # a UTF-8 BOM glued to the first 'User-agent' key would otherwise
    # make the whole '*' group unrecognized (real crawls serve these)
    txt = txt.lstrip('\ufeff')
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            last_was_agent = False
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                applies = False  # a new group starts
            applies = applies or val == "*"
            last_was_agent = True
            continue
        last_was_agent = False
        if not applies:
            continue
        if key == "disallow":
            if val:  # empty Disallow: allow-all (no rule)
                rules.append((False, val))
        elif key == "allow":
            if val:
                rules.append((True, val))
    return rules


def robots_rules(
    robots_df: DataFrame, host_col: str = "host", payload_col: str = "payload"
) -> DataFrame:
    """(host, allow boolean, prefix) rows from per-host robots.txt
    payloads (binary or string)."""
    is_bin = robots_df.schema[payload_col].dataType.simpleString() == "binary"

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, payload in zip(pdf[host_col], pdf[payload_col]):
                txt = (
                    bytes(payload).decode("utf-8", "replace")
                    if is_bin
                    else (payload or "")
                )
                for allow, prefix in parse_robots_rules(txt):
                    rows.append((host, allow, prefix))
            yield pd.DataFrame(rows, columns=["host", "allow", "prefix"])

    return robots_df.mapInPandas(kernel, "host string, allow boolean, prefix string")


def apply_robots(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Pages surviving their host's robots rules (longest-prefix match,
    Allow wins ties, unmatched/ruleless pages allowed).

    The rules are pre-grouped to ONE array row per host and broadcast,
    so the page side takes a row-preserving broadcast join on host and
    evaluates the longest-match verdict as a pure HOF over the rules
    array — no shuffle, no row-count change, no re-grouping of the
    corpus (grouping pages by all columns to reduce a prefix join
    would shuffle 100 TB; this never touches the exchange)."""
    host = url_host(F.col(url_col))
    path = url_path(F.col(url_col))
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct(F.col("prefix"), F.col("allow"))).alias("__rules")
    )
    with_hp = pages.withColumn("__host", host).withColumn(
        "__path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    joined = with_hp.join(
        F.broadcast(per_host.withColumnRenamed("host", "__host")), "__host", "left"
    )
    matched = F.filter(
        F.coalesce(F.col("__rules"), F.array()),
        lambda r: F.col("__path").startswith(r["prefix"]),
    )
    # lexicographic struct max: longest prefix first, Allow beats
    # Disallow at equal length
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    allowed = F.when(F.size(matched) == 0, F.lit(True)).otherwise(best["a"] == 1)
    return joined.filter(allowed).select(*pages.columns)
