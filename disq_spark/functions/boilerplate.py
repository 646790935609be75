"""Line-based boilerplate removal — the cleaning tier between HTML
extraction and the text pipeline (CCNet runs exactly this shape:
per-line heuristics over the extracted text before dedup/LM scoring).

Pure higher-order column expressions (split -> filter -> join) with an
exact DuckDB mirror (string_split -> list_filter -> array_to_string),
so the gate hash-matches. The rule set is deliberately small and
deterministic:

- a line is BOILERPLATE if its lowercased trimmed form contains any
  marker phrase (cookie banners, copyright footers, subscribe nags);
- a line is too short to be prose if trimmed length < ``min_chars``
  AND it does not end with terminal punctuation (headers survive by
  the punctuation escape, nav crumbs do not).

Production rule sets are longer but identically shaped — per-line
predicates folded over a split array; swapping the markers/thresholds
changes data, not the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BOILERPLATE_MARKERS = (
    "cookie",
    "all rights reserved",
    "subscribe to",
    "privacy policy",
    "terms of service",
    "javascript",
)
MIN_LINE_CHARS = 30
_TERMINAL = r'[.!?"]$'


def _keep_line(line) -> Column:
    low = F.lower(F.trim(line))
    is_marked = F.lit(False)
    for m in BOILERPLATE_MARKERS:
        is_marked = is_marked | low.contains(m)
    long_enough = F.length(F.trim(line)) >= MIN_LINE_CHARS
    terminal = low.rlike(_TERMINAL)
    return (~is_marked) & (long_enough | terminal)


def doc_lines(col) -> Column:
    return F.split(col, "\n")


def remove_boilerplate_lines(col) -> Column:
    """Text with boilerplate lines dropped (surviving lines re-joined
    with newlines)."""
    return F.array_join(F.filter(doc_lines(col), _keep_line), "\n")


def kept_line_count(col) -> Column:
    return F.size(F.filter(doc_lines(col), _keep_line)).cast("long")


def line_count(col) -> Column:
    return F.size(doc_lines(col)).cast("long")


# -- DuckDB mirror ----------------------------------------------------------


def _keep_line_sql(var: str = "l") -> str:
    marked = " OR ".join(
        f"position('{m}' IN lower(trim({var}))) > 0" for m in BOILERPLATE_MARKERS
    )
    return (
        f"(NOT ({marked})) AND (length(trim({var})) >= {MIN_LINE_CHARS} "
        f"OR regexp_matches(lower(trim({var})), '[.!?\"]$'))"
    )


def remove_boilerplate_sql(expr: str) -> str:
    return (
        f"array_to_string(list_filter(string_split({expr}, chr(10)), "
        f"l -> {_keep_line_sql('l')}), chr(10))"
    )


def kept_line_count_sql(expr: str) -> str:
    return (
        f"len(list_filter(string_split({expr}, chr(10)), "
        f"l -> {_keep_line_sql('l')}))"
    )


def line_count_sql(expr: str) -> str:
    return f"len(string_split({expr}, chr(10)))"
