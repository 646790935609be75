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


# -- Canonicalization --------------------------------------------------------

#: query params dropped by canonicalize_url: click/campaign trackers that
#: never change page content (the standard URL-dedup pre-pass list)
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|igshid)="

# three-way authority split: scheme:// / userinfo@ (case-sensitive per
# RFC 3986 — NOT lowercased) / host[:port]. The greedy '[^/?#]*@' runs
# to the LAST '@' before the path, matching the RFC host rule; an
# unmatched optional group extracts as '' in both Java regex and RE2.
_SCHEME_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*@)?([^/?#]*)"
# optional-tail captures instead of lookaheads: DuckDB's RE2 has no
# lookahead, and Java/RE2 both substitute '' for an unmatched group ref
_HTTP_80_RE = r"^(http://[^/?#]*):80([/?#].*)?$"
_HTTPS_443_RE = r"^(https://[^/?#]*):443([/?#].*)?$"
_EMPTY_PATH_RE = r"^([a-z][a-z0-9+.-]*://[^/?#]+)(\?.*)?$"


def canonicalize_url(col) -> Column:
    """Canonical URL form — the pre-pass URL-level dedup keys on (two
    spellings of one page must collide BEFORE hashing):

    1. trim; drop the #fragment (client-side only)
    2. lowercase scheme and host[:port] — userinfo is case-sensitive
       per RFC 3986 and is kept verbatim; path/query stay
       case-sensitive too
    3. drop default ports (http :80, https :443)
    4. empty path -> '/' (https://x.com == https://x.com/)
    5. drop tracking params (TRACKING_PARAM_RE), SORT the survivors,
       drop a now-empty '?' (including a bare trailing '?':
       'https://x.com/?' == 'https://x.com/')

    Pure column expressions with an exact DuckDB mirror
    (``canonicalize_url_sql``); schemeless input passes through steps
    that don't apply. Deliberately NOT done: trailing-slash or //
    collapsing inside paths and %-escape normalization — those change
    semantics on real servers.
    """
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    sch = F.regexp_extract(u, _SCHEME_AUTH_RE, 1)
    usr = F.regexp_extract(u, _SCHEME_AUTH_RE, 2)
    hst = F.regexp_extract(u, _SCHEME_AUTH_RE, 3)
    auth_len = F.length(sch) + F.length(usr) + F.length(hst)
    u = F.concat(
        F.lower(sch), usr, F.lower(hst),
        F.substring(u, auth_len + 1, F.lit(1 << 30)),
    )
    u = F.regexp_replace(u, _HTTP_80_RE, "$1$2")
    u = F.regexp_replace(u, _HTTPS_443_RE, "$1$2")
    u = F.regexp_replace(u, _EMPTY_PATH_RE, "$1/$2")
    u = F.regexp_replace(u, r"\?$", "")
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    base = F.regexp_replace(u, r"\?.*$", "")
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != ""),
        )
    )
    return (
        F.when(q == "", u)
        .when(F.size(params) == 0, base)
        .otherwise(F.concat(base, F.lit("?"), F.array_join(params, "&")))
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB mirror of ``canonicalize_url`` (RE2: \\1 refs, list_sort/
    list_filter for the query step)."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    auth = "'^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*@)?([^/?#]*)'"
    sch = f"regexp_extract({u}, {auth}, 1)"
    usr = f"regexp_extract({u}, {auth}, 2)"
    hst = f"regexp_extract({u}, {auth}, 3)"
    u = (
        f"(lower({sch}) || {usr} || lower({hst}) || "
        f"substr({u}, length({sch}) + length({usr}) + length({hst}) + 1))"
    )
    u = f"regexp_replace({u}, '^(http://[^/?#]*):80([/?#].*)?$', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/?#]*):443([/?#].*)?$', '\\1\\2')"
    u = f"regexp_replace({u}, '^([a-z][a-z0-9+.-]*://[^/?#]+)(\\?.*)?$', '\\1/\\2')"
    u = f"regexp_replace({u}, '\\?$', '')"
    q = f"regexp_extract({u}, '\\?(.*)$', 1)"
    base = f"regexp_replace({u}, '\\?.*$', '')"
    params = (
        f"list_sort(list_filter(string_split({q}, '&'), "
        f"p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}') AND p <> ''))"
    )
    return (
        f"(CASE WHEN {q} = '' THEN {u} "
        f"WHEN len({params}) = 0 THEN {base} "
        f"ELSE {base} || '?' || array_to_string({params}, '&') END)"
    )
