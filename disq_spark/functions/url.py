"""URL analysis for crawl pipelines — engine-portable column
expressions.

Per-host statistics, TLD mixes, and domain blocklist filtering are the
first aggregations a crawl pipeline runs after ingestion (host-level
dedup budgets, spam-domain removal). Spark ships ``parse_url``, but
its java.net semantics differ from other engines in edge cases
(userinfo, missing scheme); these extractors are plain regexes with a
documented DuckDB mirror, so gates hash-match.

``registered_domain`` is the standard last-two-labels approximation
(example.co.uk -> co.uk is WRONG under the Public Suffix List; a
production deployment broadcasts the PSL and longest-suffix-joins —
the join shape is the same, the list is just data). Documented, not
hidden.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority = [userinfo@]host[:port]; host stops at '/', '?', '#'
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_host(col) -> Column:
    """Lowercased hostname ('' for schemeless/invalid URLs)."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def url_path(col) -> Column:
    """Path component ('' when absent)."""
    return F.regexp_extract(col, _PATH_RE, 1)


def url_tld(col) -> Column:
    """Last dot-label of the host ('' for bare/invalid hosts)."""
    return F.regexp_extract(url_host(col), r"\.([a-z0-9-]+)$", 1)


def registered_domain(col) -> Column:
    """Last-two-labels approximation of eTLD+1 (see module docstring
    for the PSL caveat)."""
    return F.regexp_extract(url_host(col), r"([a-z0-9-]+\.[a-z0-9-]+)$", 1)


def filter_blocked_hosts(df, url_col: str, blocked_hosts) -> "DataFrame":  # noqa: F821
    """Drop rows whose url host is in ``blocked_hosts`` (exact host or
    any subdomain of a blocked registered domain). Broadcast anti-join
    — the blocklist is small by construction; the corpus never
    shuffles."""
    spark = df.sparkSession
    bl = spark.createDataFrame([(h.lower(),) for h in blocked_hosts], "blocked string")
    host = url_host(F.col(url_col))
    with_h = df.withColumn("__host", host)
    joined = with_h.join(
        F.broadcast(bl),
        (F.col("__host") == F.col("blocked"))
        | F.col("__host").endswith(F.concat(F.lit("."), F.col("blocked"))),
        "left_anti",
    )
    return joined.drop("__host")


# -- DuckDB fragments (oracle reuse) ---------------------------------------


def url_host_sql(expr: str) -> str:
    return (
        f"lower(regexp_extract({expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))"
    )


def url_path_sql(expr: str) -> str:
    return (
        f"regexp_extract({expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)"
    )


def url_tld_sql(expr: str) -> str:
    return f"regexp_extract({url_host_sql(expr)}, '\\.([a-z0-9-]+)$', 1)"
