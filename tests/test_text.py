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
