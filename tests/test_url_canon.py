"""canonicalize_url: hand-computed canonical forms and the Spark/DuckDB
mirror parity (the gate relies on both)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from disq_spark.functions.url import canonicalize_url, canonicalize_url_sql

CASES = [
    # (input, canonical)
    ("HTTPS://Example.COM/Path?b=2&a=1#frag", "https://example.com/Path?a=1&b=2"),
    ("http://x.com:80/p", "http://x.com/p"),
    ("https://x.com:443/p?z=1", "https://x.com/p?z=1"),
    ("https://x.com:8443/p", "https://x.com:8443/p"),  # non-default port kept
    ("https://x.com", "https://x.com/"),
    ("https://x.com?a=1", "https://x.com/?a=1"),
    ("https://x.com/p?utm_source=tw&q=ok&utm_medium=x", "https://x.com/p?q=ok"),
    ("https://x.com/p?utm_source=tw", "https://x.com/p"),
    ("https://x.com/p?gclid=123&fbclid=9", "https://x.com/p"),
    ("  https://x.com/p  ", "https://x.com/p"),
    # path/query case preserved; userinfo case-sensitive (RFC 3986) — kept
    ("http://User@X.COM/Q?A=B", "http://User@x.com/Q?A=B"),
    # host = after the LAST '@'; password case also preserved
    ("http://User:Pw@X.COM/", "http://User:Pw@x.com/"),
    # bare trailing '?' (empty query) collapses to the query-less form
    ("https://x.com/?", "https://x.com/"),
    ("https://x.com?", "https://x.com/"),
    ("not a url", "not a url"),
    ("", ""),
]


def test_canonicalize_url_hand_computed(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string")
    got = [
        r.c
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonicalize_url_sql_mirror_parity(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string")
    got = [
        r.c
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(CASES)), "u": [u for u, _ in CASES]}))
    want = [
        c
        for (c,) in con.execute(
            f"SELECT {canonicalize_url_sql('u')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_canonicalize_url_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixed point)."""
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string")
    once = df.select("i", canonicalize_url(F.col("u")).alias("c"))
    twice = once.select("i", canonicalize_url(F.col("c")).alias("c2"), "c")
    assert twice.filter(F.col("c") != F.col("c2")).count() == 0


# -- property: spelling-invariance + idempotence (DuckDB mirror; the
# Spark<->DuckDB parity is pinned above, so the fast engine carries the
# hypothesis load) -----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_pkey = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)
_pval = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", min_size=0, max_size=6)


@st.composite
def _url_components(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = ".".join(draw(st.lists(_label, min_size=2, max_size=3)))
    path = "/" + "/".join(draw(st.lists(_pval, min_size=0, max_size=2)))
    params = draw(
        st.lists(st.tuples(_pkey, _pval), min_size=0, max_size=3, unique_by=lambda t: t[0])
    )
    trackers = draw(
        st.lists(st.sampled_from(["utm_source=x", "utm_medium=em", "gclid=g1", "fbclid=f2"]),
                 min_size=0, max_size=2, unique=True)
    )
    return scheme, host, path, params, trackers


def _spell(scheme, host, path, params, trackers, messy):
    q = [f"{k}={v}" for k, v in params]
    if messy:
        port = ":80" if scheme == "http" else ":443"
        qs = list(reversed(q)) + trackers
        url = f"{scheme.upper()}://{host.upper()}{port}{path}"
        if qs:
            url += "?" + "&".join(qs)
        return url + "#frag"
    qs = q
    url = f"{scheme}://{host}{path}"
    if qs:
        url += "?" + "&".join(qs)
    return url


@settings(max_examples=60, deadline=None)
@given(_url_components())
def test_url_canon_spelling_invariance_property(comps):
    con = duckdb.connect()

    def canon(u):
        return con.execute(
            f"SELECT {canonicalize_url_sql('u')} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]

    messy = _spell(*comps, messy=True)
    clean = _spell(*comps, messy=False)
    cm, cc = canon(messy), canon(clean)
    assert cm == cc, (messy, clean, cm, cc)
    # idempotence: the canonical form is a fixed point
    assert canon(cm) == cm
