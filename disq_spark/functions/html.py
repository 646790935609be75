"""HTML-to-text extraction as pure column expressions — the step
between crawl ingestion (sources/warc.py) and the text pipeline
(quality, lang-id, dedup). A trafilatura-class extractor needs a DOM;
this is the regex tier every large pipeline runs first (strip
script/style/comments, drop tags, decode entities, collapse
whitespace), kept in engine-portable regexes so a DuckDB oracle can run
the identical chain — and cheap enough to run at crawl scale (pure
JVM-side regexp_replace, no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2- and Java-compatible: (?s) dotall, lazy quantifiers, no backrefs.
_DROP_BLOCKS = r"(?si)<(script|style)\b[^>]*>.*?</(script|style)>"
_DROP_COMMENTS = r"(?s)<!--.*?-->"
_DROP_TAGS = r"(?s)<[^>]*>"

# the high-frequency named entities; numeric forms decoded separately
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST, so &amp;lt; decodes to &lt; not <
]


def strip_markup(col) -> Column:
    """Remove script/style blocks, comments, and tags (tag -> space so
    adjacent text nodes don't fuse)."""
    c = F.regexp_replace(col, _DROP_BLOCKS, " ")
    c = F.regexp_replace(c, _DROP_COMMENTS, " ")
    return F.regexp_replace(c, _DROP_TAGS, " ")


def decode_entities(col) -> Column:
    c = col
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def html_to_text(col) -> Column:
    """Markup stripped, entities decoded, whitespace collapsed."""
    return F.trim(
        F.regexp_replace(decode_entities(strip_markup(col)), r"\s+", " ")
    )


def extract_title(col) -> Column:
    return F.trim(
        decode_entities(F.regexp_extract(col, r"(?si)<title\b[^>]*>(.*?)</title>", 1))
    )


def extract_links(col) -> Column:
    """array<string> of href values (double- or single-quoted)."""
    return F.regexp_extract_all(
        col, F.lit(r"""(?si)<a\b[^>]*\bhref\s*=\s*["']([^"']*)["']"""), F.lit(1)
    )


def escape_text(col) -> Column:
    """Text -> HTML-safe (&, <, > escaped) — the generation inverse the
    gates use to build synthetic pages whose extraction must recover
    the original text."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


# DuckDB fragments running the IDENTICAL chain, for oracle reuse
def strip_markup_sql(expr: str) -> str:
    c = f"regexp_replace({expr}, '(?si)<(script|style)\\b[^>]*>.*?</(script|style)>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    return f"regexp_replace({c}, '(?s)<[^>]*>', ' ', 'g')"


def decode_entities_sql(expr: str) -> str:
    c = expr
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep_sql}')"
    return c


def html_to_text_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace({decode_entities_sql(strip_markup_sql(expr))},"
        f" '\\s+', ' ', 'g'))"
    )
