"""Text-function parity tests, focusing on the Spark-vs-DuckDB-oracle
edge cases the sf fixtures don't cover (empty / whitespace-only docs).

Oracle fragments are imported from disq_spark.queries.llm so a drift
between the Spark column functions and the gate SQL fails here first.
"""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from disq_spark.functions import text as TX
from disq_spark.queries.llm import _NORM, _TOKS

DOCS = [
    "Hello  world",
    "",
    "   ",
    "one",
    "a b  c\td\ne",
    "The quick brown fox",
]


def _spark_tok(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "i long, text string")
    rows = (
        df.select("i", TX.tokens("text").alias("toks"), TX.token_count("text").alias("n"))
        .orderBy("i")
        .collect()
    )
    return [(r.toks, r.n) for r in rows]


def _duck_tok():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"i": range(len(DOCS)), "text": DOCS}))
    out = con.execute(
        f"SELECT i, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents ORDER BY i"
    ).fetchall()
    return [(list(t), int(n)) for _, t, n in out]


def test_tokens_parity_including_empty(spark):
    assert _spark_tok(spark) == _duck_tok()


def test_empty_doc_zero_tokens(spark):
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    counts = [r.n for r in df.select(TX.token_count("text").alias("n")).collect()]
    assert counts == [0, 0]


def test_normalize_parity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "i long, text string")
    got = [r.v for r in df.select(TX.normalize("text").alias("v")).orderBy("i").collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"i": range(len(DOCS)), "text": DOCS}))
    want = [v for (v,) in con.execute(f"SELECT {_NORM} FROM documents ORDER BY i").fetchall()]
    assert got == want


def test_bpe_tokens_parity(spark):
    from disq_spark.queries.llm import _BPE

    edge = DOCS + ["it's 2024-08, v2.0!", "42", "...", "a1b2c3"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(edge)], "i long, text string")
    got = [
        (list(r.toks), r.n)
        for r in df.select(
            "i", TX.bpe_tokens("text").alias("toks"), TX.bpe_token_count("text").alias("n")
        )
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"i": range(len(edge)), "text": edge}))
    want = [
        (list(t), int(n))
        for _, t, n in con.execute(
            f"SELECT i, {_BPE} AS toks, len({_BPE}) AS n FROM documents ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_ngram_contamination_exact(spark):
    """13-gram overlap flags exactly the docs sharing a full n-gram with
    a benchmark text; n_hits counts DISTINCT shared grams."""
    from disq_spark.operators.dedup import ngram_contamination

    words = [f"w{i}" for i in range(30)]
    contaminated = " ".join(words)                    # contains the probe
    shifted = " ".join(words[5:25])                   # also contains it
    clean = " ".join(f"x{i}" for i in range(30))      # disjoint vocabulary
    short_hit = " ".join(words[8:20])                 # only 12 tokens: can't hold a 13-gram
    df = spark.createDataFrame(
        [(1, contaminated), (2, clean), (3, shifted), (4, short_hit)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(words[6:19]))],  # one exact 13-gram probe
        "bench_id long, text string",
    )
    got = {
        r.doc_id: r.n_hits
        for r in ngram_contamination(df, bench, n=13).collect()
    }
    assert got == {1: 1, 3: 1}


def test_numeric_entity_decode(spark):
    """Decimal, hex, astral, amp-protected, malformed, and invalid
    code points — the full numeric-character-reference surface
    (functions/html.py decode_numeric_entities)."""
    from pyspark.sql import functions as F

    from disq_spark.functions import html as H

    cases = [
        ("caf&#233; r&#xE9;sum&#xe9; &#x1F600;", "café résumé 😀"),
        ("&amp;#233; literal", "&#233; literal"),  # amp protects
        ("no entities", "no entities"),
        ("&#bad; &#x; &# ;", "&#bad; &#x; &# ;"),  # malformed pass through
        ("&#0;|&#xD800;|&#1114112;", "�|�|�"),  # invalid -> U+FFFD
        ("&#65;&#66;&#67;", "ABC"),  # adjacent references
        ("tail &#233;", "tail é"),
        ("&#233; head", "é head"),
        # numeric-escaped ampersands must NOT re-enter later replacement
        # passes (sentinel round-trip): &#38;lt; is the literal text
        # &lt;, in either numeric form, zero-padded or not
        ("&#38;lt;b&#38;gt;", "&lt;b&gt;"),
        ("&#x26;lt;", "&lt;"),
        ("&#038;quot;", "&quot;"),
        ("&#38;amp;x", "&amp;x"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r.t for r in df.select(H.decode_entities(F.col("s")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_charset_sniff_and_decode(spark):
    """Content-Type charset sniffing: declared latin-1 / utf-16 decode
    correctly, windows-1252 and unknown tokens fall back to latin-1
    (never fails), absent charset defaults to UTF-8."""
    from pyspark.sql import functions as F

    from disq_spark.functions.charset import decode_payload, sniff_charset

    rows = [
        ("text/html; charset=ISO-8859-1", "café".encode("iso-8859-1"), "café"),
        ('text/html; charset="utf-8"', "café😀".encode("utf-8"), "café😀"),
        ("text/html", "café".encode("utf-8"), "café"),
        ("text/html; charset=UTF-16LE", "café".encode("utf-16-le"), "café"),
        # windows-1252 maps to latin-1 (é is identical there)
        ("text/html; charset=windows-1252", "café".encode("cp1252"), "café"),
        # unknown charset -> latin-1 fallback, never fails
        ("text/html; charset=x-sjis-ish", b"caf\xe9", "café"),
        # ABSENT Content-Type header (NULL mime) -> UTF-8 default, like
        # the empty string — not the latin-1 fallthrough
        (None, "café😀".encode("utf-8"), "café😀"),
    ]
    df = spark.createDataFrame(
        [(m, p) for m, p, _ in rows], "mime string, payload binary"
    )
    out = df.select(
        sniff_charset(F.col("mime")).alias("cs"),
        decode_payload(F.col("payload"), F.col("mime")).alias("t"),
    ).collect()
    assert [r.t for r in out] == [want for _, _, want in rows]
    assert out[0].cs == "ISO-8859-1" and out[2].cs == "" and out[4].cs == "WINDOWS-1252"


def test_redact_pii_hand_computed(spark):
    """URL-before-email ordering (an address inside a URL vanishes with
    the URL), IPs vs long digit runs, casing/layout preserved."""
    from pyspark.sql import functions as F

    from disq_spark.functions.text import redact_pii

    cases = [
        ("Mail Bob@Example.COM now", "Mail <EMAIL> now"),
        ("see https://x.com/a@b.com?id=12345678 ok", "see <URL> ok"),
        ("call 5551234567 at 10.0.0.1", "call <ID> at <IP>"),
        ("short 123456 stays", "short 123456 stays"),  # < 7 digits
        ("Keep CASE and  spacing", "Keep CASE and  spacing"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, s string")
    got = [r.t for r in df.select("i", redact_pii(F.col("s")).alias("t")).orderBy("i").collect()]
    assert got == [w for _, w in cases]


def test_redact_pii_sql_mirror_parity(spark):
    from pyspark.sql import functions as F

    from disq_spark.functions.text import redact_pii, redact_pii_sql

    texts = [
        "a@b.co https://h.io/p?q=1 12345678 1.2.3.4",
        "nested http://u.com/x@y.org end",
        "",
        "plain words only",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i long, s string")
    got = [r.t for r in df.select("i", redact_pii(F.col("s")).alias("t")).orderBy("i").collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(texts)), "s": texts}))
    want = [v for (v,) in con.execute(f"SELECT {redact_pii_sql('s')} FROM t ORDER BY i").fetchall()]
    assert got == want


def test_train_hashed_logreg_matches_serial_and_learns(spark):
    """Distributed full-batch GD == a numpy serial trainer implementing
    the same recurrence (incl. per-iteration rounding), and on a
    separable corpus the trained head actually separates."""
    import hashlib
    import math
    import re

    from disq_spark.functions.classifier import train_hashed_logreg

    rows = [(i, "good clean prose here", 1.0) for i in range(20)] + [
        (100 + i, "spam junk noise words", 0.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    n, iters, lr = 16, 3, 1.0
    w, b = train_hashed_logreg(df, "y", n_buckets=n, iters=iters, lr=lr)

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n

    feats = []
    for _, text, y in rows:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        cf = {}
        for t in toks:
            cf[bucket(t)] = cf.get(bucket(t), 0) + 1.0 / len(toks)
        feats.append((cf, y))
    sw, sb = [0.0] * n, 0.0
    for _ in range(iters):
        gw, gb = [0.0] * n, 0.0
        for cf, y in feats:
            p = 1.0 / (1.0 + math.exp(-(sb + sum(sw[j] * v for j, v in sorted(cf.items())))))
            r = p - y
            for j, v in cf.items():
                gw[j] += r * v
            gb += r
        sw = [round(sw[j] - lr * gw[j] / len(feats), 6) for j in range(n)]
        sb = round(sb - lr * gb / len(feats), 6)
    assert w == sw and b == sb
    # learning sanity: buckets exclusive to one class got the right
    # sign (colliding buckets see both classes and can go either way)
    good = {bucket(t) for t in "good clean prose here".split()}
    bad = {bucket(t) for t in "spam junk noise words".split()}
    assert good - bad and bad - good  # the tiny corpus must separate somewhere
    assert all(w[j] > 0 for j in good - bad)
    assert all(w[j] < 0 for j in bad - good)


def _serial_bpe_segment(word, ranks):
    """Independent reference: merge ONE occurrence at a time — the
    lowest-rank pair present, leftmost occurrence first — until no pair
    in the table remains. Equivalent to the operator's all-occurrences
    rule for any table (re-merging the same lowest-rank pair leftmost
    repeatedly IS left-to-right), but structured differently so a shared
    bug can't hide."""
    syms = list(word)
    while True:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            return syms
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]


def _serial_pretokenize(text):
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    return re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]", norm)


def test_bpe_apply_matches_serial_reference(spark):
    """Spark-side BPE segmentation must hash-match an independently
    coded serial BPE: (a) on adversarial words under a handcrafted
    consistent merge table (overlapping runs, chained merges), (b) on a
    real corpus slice under a trained table."""
    from disq_spark.operators.bpe import apply_bpe, train_bpe

    merges = [("a", "a"), ("a", "b"), ("aa", "ab"), ("b", "c"), ("ab", "bc"),
              ("n", "a"), ("na", "na"), ("1", "2")]
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [
        (0, "aaaa aaab aaaab abab banana"),
        (1, "abc abbc aabab 12 121212 a1b2"),
        (2, "Mixed CASE   with\twhitespace banana-nana!"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in apply_bpe(df, merges).collect()
    }
    for doc_id, text in docs:
        want = []
        for w in _serial_pretokenize(text):
            want.extend(_serial_bpe_segment(w, ranks))
        assert got[doc_id] == (want, len(want)), (doc_id, got[doc_id], want)

    # (b) trained table over the sf0.001 corpus
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    trained = train_bpe(d, n_merges=60)
    assert len(trained) == 60
    ranks_t = {p: i for i, p in enumerate(trained)}
    sample = d.select("doc_id", "text").orderBy("doc_id").limit(120).collect()
    sdf = spark.createDataFrame(sample, "doc_id long, text string")
    got_t = {r.doc_id: list(r.tokens) for r in apply_bpe(sdf, trained).collect()}
    for r in sample:
        want = []
        for w in _serial_pretokenize(r.text):
            want.extend(_serial_bpe_segment(w, ranks_t))
        assert got_t[r.doc_id] == want, r.doc_id


def test_bpe_duckdb_oracle_matches_spark(spark):
    """The full SQL oracle (bpe_oracle_ctes: unrolled fold-merge train
    stages + rank-recursion apply) must reproduce the Spark pipeline —
    trained merges, per-word segmentations, and per-doc token hashes —
    on an adversarial corpus (overlapping runs, chained merges, ties,
    empty doc). This is the value evidence behind the bpe_apply_tokens /
    pack_sequences_bpe gates being full hash gates, not rows-only."""
    import hashlib

    import duckdb
    import pandas as pd

    from disq_spark.operators.bpe import (
        apply_bpe,
        bpe_oracle_ctes,
        segment_word,
        train_bpe,
    )

    docs = [
        (0, "aaaa aaab aaaab abab banana banana"),
        (1, "abc abbc aabab 12 121212 a1b2 abc abc"),
        (2, "Mixed CASE   with\twhitespace banana-nana! nana nana"),
        (3, ""),
        (4, "aaaaaaa aaaaaaa zzz zzz z z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_merges = 25
    merges = train_bpe(df, n_merges=n_merges)
    got = {r.doc_id: (r.n_tokens, list(r.tokens)) for r in apply_bpe(df, merges).collect()}

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    ctes = bpe_oracle_ctes(n_merges)
    sql_merges = [
        (a, b)
        for _, a, b in con.execute(
            f"WITH RECURSIVE {ctes} SELECT rank, a, b FROM merges ORDER BY rank"
        ).fetchall()
    ]
    assert sql_merges == merges
    # per-word segmentation parity (covers every distinct pre-token)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, s in con.execute(f"WITH RECURSIVE {ctes} SELECT w, s FROM seg").fetchall():
        assert s.split(" ") == segment_word(w, ranks), w
    # per-doc count + stream-hash parity vs the Spark kernel output
    for doc_id, n_tokens, h in con.execute(
        f"WITH RECURSIVE {ctes} SELECT doc_id, n_tokens, h FROM perdoc"
    ).fetchall():
        want_n, want_toks = got[doc_id]
        assert n_tokens == want_n, doc_id
        assert h == hashlib.md5("\x1f".join(want_toks).encode()).hexdigest(), doc_id


def test_train_bpe_deterministic_and_consistent(spark):
    """The merge table must be partition-invariant (same merges under a
    different partitioning) and CONSISTENT: any pair referencing a
    merged symbol ranks after the merge that created it — the property
    that makes rank-greedy application correct."""
    from disq_spark.operators.bpe import train_bpe

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_bpe(d, n_merges=40)
    m2 = train_bpe(d.repartition(7), n_merges=40)
    assert m1 == m2 and len(m1) == 40
    created_at = {}
    for i, (a, b) in enumerate(m1):
        for sym in (a, b):
            if len(sym) > 1:
                assert sym in created_at and created_at[sym] < i, (i, sym)
        created_at.setdefault(a + b, i)


def test_http_response_parsing(spark):
    """HTTP message split: status/header extraction (case-insensitive),
    byte-exact body slicing (binary bodies with non-UTF-8 bytes must
    survive), and whole-payload passthrough for non-HTTP resources."""
    from pyspark.sql import functions as F

    from disq_spark.functions import http as HT

    body_bin = bytes([0xE9, 0x00, 0xFF, 0x0D, 0x0A, 0x41])  # binary, incl CRLF
    msg = (
        b"HTTP/1.1 301 Moved Permanently\r\n"
        b"content-type: text/html; charset=ISO-8859-1\r\n"
        b"Location: https://x/2\r\n\r\n" + body_bin
    )
    plain = b"just bytes, no http"
    no_sep = b"HTTP/1.1 200 OK\r\nTruncated-Header: x"
    df = spark.createDataFrame(
        [(1, msg), (2, plain), (3, no_sep)], "i long, p binary"
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            HT.http_status(F.col("p")).alias("status"),
            HT.http_content_type(F.col("p")).alias("ct"),
            HT.http_header(F.col("p"), "location").alias("loc"),
            HT.http_body(F.col("p")).alias("body"),
        ).collect()
    }
    assert rows[1].status == 301
    assert rows[1].ct == "text/html; charset=ISO-8859-1"  # ci header match
    assert rows[1].loc == "https://x/2"
    assert bytes(rows[1].body) == body_bin  # byte-exact, CRLF inside intact
    assert rows[2].status is None and rows[2].ct == ""
    assert bytes(rows[2].body) == plain  # passthrough
    assert rows[3].status == 200 and bytes(rows[3].body) == no_sep  # no separator


def test_nfc_normalize_kernel(spark):
    """The NFC kernel must unify composed/decomposed forms (hashes
    collapse), leave ASCII untouched (fast path), and agree with
    Python's unicodedata reference on NFKC too."""
    import unicodedata

    from pyspark.sql import functions as F

    from disq_spark.functions.unicode import nfc_normalize_col

    composed = "café Ångström"
    decomposed = "café Ångström"
    assert composed != decomposed  # different code points...
    rows = [(0, composed), (1, decomposed), (2, "plain ascii"), (3, None)]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {r.i: r.norm for r in nfc_normalize_col(
        df, "text", out_col="norm").collect()}
    assert out[0] == out[1] == composed  # ...same after NFC
    assert out[2] == "plain ascii" and out[3] is None
    # NFKC variant: ligature and fullwidth fold
    df2 = spark.createDataFrame([(0, "ﬁle Ａ")], "i long, text string")
    got = nfc_normalize_col(df2, "text", form="NFKC").collect()[0].text
    assert got == unicodedata.normalize("NFKC", "ﬁle Ａ") == "file Ａ".replace("Ａ", "A")


def test_url_extractors_and_blocklist(spark):
    """Host/path/TLD extraction edge cases (userinfo, ports, case,
    schemeless) and subdomain-aware blocklist filtering."""
    from pyspark.sql import functions as F

    from disq_spark.functions import url as U

    rows = [
        (0, "https://User:pw@WWW.Example.COM:8443/a/b?q=1#f"),
        (1, "http://sub.spam.example.net/x"),
        (2, "https://spam.example.net"),
        (3, "not a url"),
        (4, "ftp://plain.org/file.txt"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r.i: (r.host, r.path, r.tld, r.dom)
        for r in df.select(
            "i",
            U.url_host(F.col("url")).alias("host"),
            U.url_path(F.col("url")).alias("path"),
            U.url_tld(F.col("url")).alias("tld"),
            U.registered_domain(F.col("url")).alias("dom"),
        ).collect()
    }
    assert got[0] == ("www.example.com", "/a/b", "com", "example.com")
    assert got[1] == ("sub.spam.example.net", "/x", "net", "example.net")
    assert got[2] == ("spam.example.net", "", "net", "example.net")
    assert got[3] == ("", "", "", "")
    assert got[4] == ("plain.org", "/file.txt", "org", "plain.org")

    kept = {r.i for r in U.filter_blocked_hosts(df, "url", ["spam.example.net"]).collect()}
    assert kept == {0, 3, 4}  # exact host AND its subdomain dropped


def test_boilerplate_line_rules(spark):
    """Per-line predicate semantics: marker phrases drop regardless of
    length; short lines drop unless terminally punctuated; prose
    survives verbatim (joined back with newlines)."""
    from pyspark.sql import functions as F

    from disq_spark.functions import boilerplate as BP

    page = "\n".join(
        [
            "We use cookies on this site",          # marker -> drop
            "Home | About",                          # short, no punct -> drop
            "A genuinely long prose line that easily clears the threshold",
            "Short but ends properly.",              # short + terminal -> keep
            "SUBSCRIBE TO our updates today friends",  # marker (ci) -> drop
            "x" * 30,                                # exactly min length -> keep
        ]
    )
    df = spark.createDataFrame([(page,)], "page string")
    r = df.select(
        BP.remove_boilerplate_lines(F.col("page")).alias("clean"),
        BP.kept_line_count(F.col("page")).alias("k"),
        BP.line_count(F.col("page")).alias("n"),
    ).collect()[0]
    assert r.n == 6 and r.k == 3
    assert r.clean == "\n".join(
        [
            "A genuinely long prose line that easily clears the threshold",
            "Short but ends properly.",
            "x" * 30,
        ]
    )


def test_robots_parse_and_apply(spark):
    """RFC 9309 subset semantics: stacked user-agent lines form one
    group, comments and empty Disallow handled, longest-prefix wins
    with Allow beating Disallow at equal length, ruleless hosts pass
    everything."""
    from pyspark.sql import functions as F

    from disq_spark.operators.robots import (
        apply_robots,
        parse_robots_rules,
        robots_rules,
    )

    txt = (
        "# comment\n"
        "User-agent: GoogleBot\n"
        "User-agent: *\n"
        "Disallow: /a/\n"
        "Allow: /a/b/\n"
        "Disallow:\n"            # empty: allow-all, no rule emitted
        "\n"
        "User-agent: OtherBot\n"
        "Disallow: /\n"          # not ours
    )
    assert parse_robots_rules(txt) == [(False, "/a/"), (True, "/a/b/")]

    robots = spark.createDataFrame(
        [("h1", txt), ("h2", "User-agent: *\nDisallow: /\n")],
        "host string, payload string",
    )
    rules = robots_rules(robots)
    pages = spark.createDataFrame(
        [
            (0, "https://h1/a/x"),      # /a/ disallowed
            (1, "https://h1/a/b/x"),    # /a/b/ allow overrides (longer)
            (2, "https://h1/c"),        # unmatched -> allowed
            (3, "https://h2/anything"), # blanket disallow
            (4, "https://h3/x"),        # no robots -> allowed
            (5, "https://h1"),          # empty path -> '/' -> unmatched
        ],
        "i long, url string",
    )
    kept = {r.i for r in apply_robots(pages, rules, "url").collect()}
    assert kept == {1, 2, 4, 5}
    # plan shape: broadcast join, no exchange of the page side keys
    plan = apply_robots(pages, rules, "url")._sc._jvm.PythonSQLUtils.explainString(
        apply_robots(pages, rules, "url")._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_classifier_kernel_matches_sql_path(spark, tmp_path):
    """score_hashed_linear: the Arrow kernel (scale path) must produce
    the identical rounded scores as the pure-column HOF path on real
    corpus text, and auto-dispatch must route parquet-small inputs to
    sql."""
    from disq_spark.functions.classifier import (
        deterministic_weights,
        score_hashed_linear,
    )
    from disq_spark.operators.dispatch import resolve_method

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    assert resolve_method("auto", d) == "sql"
    w = deterministic_weights(64)
    a = {r.doc_id: r.score for r in score_hashed_linear(d, w, bias=-0.1, method="sql").collect()}
    b = {r.doc_id: r.score for r in score_hashed_linear(d, w, bias=-0.1, method="blas").collect()}
    assert a == b and len(a) == 500
    # null/empty text parity: both paths give sigmoid(bias)
    edge = spark.createDataFrame([(0, None), (1, ""), (2, "   ")], "doc_id long, text string")
    ea = {r.doc_id: r.score for r in score_hashed_linear(edge, w, bias=-0.1, method="sql").collect()}
    eb = {r.doc_id: r.score for r in score_hashed_linear(edge, w, bias=-0.1, method="blas").collect()}
    assert ea == eb and len(set(ea.values())) == 1
    # non-ASCII whitespace parity: Java \s (the SQL tokenizer) is
    # ASCII-only, so U+00A0 must stay INSIDE a token in the kernel too
    nb = spark.createDataFrame(
        [(0, "a\u00a0b c"), (1, "x\u2009y")], "doc_id long, text string"
    )
    na = {r.doc_id: r.score for r in score_hashed_linear(nb, w, bias=-0.1, method="sql").collect()}
    nbk = {r.doc_id: r.score for r in score_hashed_linear(nb, w, bias=-0.1, method="blas").collect()}
    assert na == nbk


# -- hostile-input hardening (r8): robots.txt + HTML edge cases ---------------


def test_robots_bom_and_mixed_case():
    """A UTF-8 BOM glued to the first header key and fully-uppercased
    keys must not hide the '*' group (both appear in real crawls)."""
    from disq_spark.operators.robots import parse_robots_rules

    txt = "﻿USER-AGENT: *\r\nDISALLOW: /private\r\nALLOW: /private/ok\r\n"
    assert parse_robots_rules(txt) == [(False, "/private"), (True, "/private/ok")]


def test_robots_conflicting_rules_precedence(spark):
    """Documented precedence on conflicts: longest matching prefix
    wins; Allow beats Disallow at EQUAL length; no match -> allowed."""
    from disq_spark.operators.robots import apply_robots

    rules = spark.createDataFrame(
        [
            ("h.com", False, "/a"),      # Disallow /a
            ("h.com", True, "/a"),       # Allow /a  (equal length: Allow wins)
            ("h.com", False, "/a/deep"), # longer Disallow overrides under /a/deep
        ],
        "host string, allow boolean, prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "https://h.com/a/x"),       # equal-length tie -> Allow
            (2, "https://h.com/a/deep/x"),  # longest prefix -> Disallow
            (3, "https://h.com/other"),     # no rule -> allowed
        ],
        "id long, url string",
    )
    got = {r.id for r in apply_robots(pages, rules, "url").collect()}
    assert got == {1, 3}


def test_robots_rules_before_any_group_ignored():
    from disq_spark.operators.robots import parse_robots_rules

    txt = "Disallow: /early\nUser-agent: *\nDisallow: /x\n"
    assert parse_robots_rules(txt) == [(False, "/x")]


def test_robots_junk_lines_no_crash():
    from disq_spark.operators.robots import parse_robots_rules

    txt = (
        "User-agent: *\n"
        "this line has no colon\n"       # unknown key -> skipped
        "Crawl-delay: not-a-number\n"    # unsupported directive -> skipped
        "Disallow: /ok\n"
        "\x00\x01binary junk\n"
    )
    assert parse_robots_rules(txt) == [(False, "/ok")]


def test_html_script_with_nested_markup(spark):
    """A <script> body containing comments, fake close tags of OTHER
    elements, and a CDATA section drops at the first real </script> —
    the same rule browsers use; surrounding text survives."""
    from disq_spark.functions import html as H

    doc = (
        "<p>before</p>"
        "<script>/*<!-- </div> --> <![CDATA[ if (a<b) x(); ]]>*/</script>"
        "<p>after</p>"
    )
    df = spark.createDataFrame([(doc,)], "h string")
    out = df.select(H.html_to_text(F.col("h")).alias("t")).collect()[0].t
    assert "before" in out and "after" in out
    assert "CDATA" not in out and "if (a" not in out


def test_html_unclosed_script_documented_leak(spark):
    """An unclosed <script> at EOF cannot match the lazy block regex;
    the regex-tier extractor strips the tag and lets the body through
    as text — documented behavior (a DOM-tier extractor is the
    upgrade path), asserted here so a silent change is visible."""
    from disq_spark.functions import html as H

    doc = "<p>keep</p><script>var leak = 1;"
    df = spark.createDataFrame([(doc,)], "h string")
    out = df.select(H.html_to_text(F.col("h")).alias("t")).collect()[0].t
    assert "keep" in out
    assert "var leak" in out  # the documented regex-tier limitation


def test_html_bare_cdata_no_crash(spark):
    from disq_spark.functions import html as H

    doc = "x <![CDATA[ raw < data ]]> y"
    df = spark.createDataFrame([(doc,)], "h string")
    out = df.select(H.html_to_text(F.col("h")).alias("t")).collect()[0].t
    assert "x" in out and "y" in out


from hypothesis import given, settings
from hypothesis import strategies as st

_robots_line = st.one_of(
    st.text(alphabet="UuSsEeRrAaGgNnTtDdIiLlOoWwCc*:/#x -_\t﻿\x00", max_size=30),
    st.sampled_from(
        ["User-agent: *", "Disallow: /x", "Allow: /x/y", "Disallow:", "User-agent: bot"]
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_robots_line, max_size=12))
def test_robots_parser_total_on_hostile_text(lines):
    """parse_robots_rules never raises on arbitrary hostile text and
    every emitted rule has a boolean verdict and a non-empty prefix."""
    from disq_spark.operators.robots import parse_robots_rules

    rules = parse_robots_rules("\n".join(lines))
    for allow, prefix in rules:
        assert isinstance(allow, bool) and isinstance(prefix, str) and prefix


def test_text_functions_hostile_unicode_parity(spark):
    """normalize/tokens/bpe_tokens and the quality expression must
    agree between Spark and DuckDB on hostile unicode — NULs,
    astral-plane emoji, RTL text, combining marks, zero-width chars,
    kilobyte tokens — not just the corpus's ASCII-ish text. One batched
    action per engine."""
    hostile = [
        "a\x00b nul byte",
        "emoji 😀😀 and astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
        "עברית rtl العربية mixed ltr",
        "combining á é vs precomposed á é",
        "zero​width‌joins‍ here",
        "x" * 4096,
        "tabs\tand nbsp and  line-sep",
        "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hostile)], "i long, text string"
    )
    got = [
        (r.n, list(r.toks), r.b)
        for r in df.select(
            "i",
            TX.normalize("text").alias("n"),
            TX.tokens("text").alias("toks"),
            TX.bpe_token_count("text").alias("b"),
        )
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"i": range(len(hostile)), "text": hostile}))
    from disq_spark.queries.llm import _BPE

    want = [
        (n, list(t), int(b))
        for _, n, t, b in con.execute(
            f"SELECT i, {_NORM}, {_TOKS}, len({_BPE}) FROM documents ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_bpe_merge_collision_guard_is_load_bearing():
    """A merge table where two ranks concatenate to the same string
    ('a'+'bc' and 'ab'+'c' both -> 'abc') makes rank-greedy FIXPOINT
    inference diverge from the oracle's single sequential rank-order
    pass — the exact unsoundness assert_merges_oracle_consistent
    guards (r8 advice). Witness: 'qabc' under the table below."""
    import pytest

    from disq_spark.operators.bpe import (
        _merge_word,
        assert_merges_oracle_consistent,
        segment_word,
    )

    merges = [("a", "b"), ("b", "c"), ("a", "bc"), ("q", "abc"), ("ab", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    fixpoint = segment_word("qabc", ranks)
    syms = tuple("qabc")
    for p in merges:  # the oracle's model: each merge once, rank order
        syms = _merge_word(syms, p)
    assert fixpoint == ["qabc"] and list(syms) == ["q", "abc"]
    assert fixpoint != list(syms)  # diverged -> guard is load-bearing
    with pytest.raises(ValueError, match="collision"):
        assert_merges_oracle_consistent(merges)
    # collision-free tables pass
    assert_merges_oracle_consistent([("a", "b"), ("b", "c"), ("ab", "c")])


def test_bpe_oracle_sql_guard_errors_on_collision():
    """The DuckDB mirror of the guard: a colliding merges table makes
    the oracle raise, not silently diverge."""
    import duckdb
    import pytest

    con = duckdb.connect()
    guard = (
        "SELECT 1 WHERE 1 = (SELECT CASE WHEN count(*) = count(DISTINCT a || b) "
        "THEN 1 ELSE error('bpe oracle precondition violated: merge-string collision') END "
        "FROM merges)"
    )
    con.execute("CREATE TABLE merges AS SELECT * FROM (VALUES ('a','bc'), ('ab','c')) t(a, b)")
    with pytest.raises(duckdb.Error, match="collision"):
        con.execute(guard).fetchall()
    con.execute("DELETE FROM merges WHERE a = 'ab'")
    assert con.execute(guard).fetchall() == [(1,)]
    con.execute("DELETE FROM merges")  # empty table: guard passes
    assert con.execute(guard).fetchall() == [(1,)]


def test_chunk_token_windows_hand_case(spark):
    from disq_spark.operators.sampling import chunk_token_windows

    txt = " ".join(f"t{i}" for i in range(11))  # 11 tokens
    df = spark.createDataFrame([(1, txt), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    rows = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
            for r in chunk_token_windows(df, max_tokens=4, overlap=1).collect()}
    # stride 3; 11 tokens -> ceil((11-4)/3)+1 = 4 windows at starts 0,3,6,9
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t6 t7 t8 t9")
    assert rows[(1, 3)] == (2, "t9 t10")  # tail kept, shorter
    assert rows[(2, 0)] == (2, "a b")     # <= max: exactly one window
    assert rows[(3, 0)] == (0, "")        # empty doc: one empty window
    assert len(rows) == 6


def test_chunk_token_windows_covers_every_token(spark):
    """Every token index is covered by >= 1 window and consecutive
    windows overlap by exactly `overlap` (except the tail); windows
    never exceed max_tokens."""
    from disq_spark.operators.sampling import chunk_token_windows

    cases = [(n, mx, ov) for n in (0, 1, 7, 48, 49, 100, 101)
             for mx, ov in ((16, 0), (16, 4), (7, 6))]
    df = spark.createDataFrame(
        [(f"{n}_{mx}_{ov}", " ".join(f"w{i}" for i in range(n)))
         for n, mx, ov in cases],
        "doc_id string, text string",
    )
    for mx, ov in {(c[1], c[2]) for c in cases}:
        sub = df.filter(F.col("doc_id").endswith(f"_{mx}_{ov}"))
        out = chunk_token_windows(sub, max_tokens=mx, overlap=ov).collect()
        by_doc: dict = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for did, chunks in by_doc.items():
            n = int(did.split("_")[0])
            chunks.sort(key=lambda r: r.chunk_id)
            stride = mx - ov
            covered = set()
            for r in chunks:
                assert r.n_tokens <= mx
                start = r.chunk_id * stride
                covered.update(range(start, start + r.n_tokens))
            assert covered == set(range(n)), (did, mx, ov)


def test_chunk_token_windows_rejects_bad_overlap(spark):
    import pytest

    from disq_spark.operators.sampling import chunk_token_windows

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_token_windows(df, max_tokens=4, overlap=4)


def test_chunk_token_windows_null_text_matches_sql_mirror(spark):
    """NULL text behaves like empty text — exactly one empty window — on
    BOTH engines (r9 advice: Spark used to emit n_tokens=-1 with NULL
    chunk_text while the SQL mirror's generate_series(0, NULL) dropped
    the doc entirely)."""
    import duckdb

    from disq_spark.operators.sampling import (
        chunk_token_windows,
        chunk_token_windows_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_token_windows(df, max_tokens=4, overlap=1).collect()
    }
    assert got[(1, 0)] == (0, "")
    assert got[(2, 0)] == (0, "")
    assert got[(3, 1)] == (2, "d e")
    assert len(got) == 4

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, NULL), (2, ''), (3, 'a b c d e')) t(doc_id, text)"
    )
    sql = (
        f"WITH {chunk_token_windows_sql(4, 1)} "
        "SELECT doc_id, chunk_id, n_tokens, chunk_text FROM chunks"
    )
    oracle = {
        (r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert oracle == got
