"""Content-Type charset sniffing + payload decode for the crawl path.

Real crawls declare their encoding in the HTTP ``Content-Type`` header
(``text/html; charset=ISO-8859-1``); assuming UTF-8 and casting the
payload mangles every latin-1 page (ADVICE/VERDICT r6). The sniff is a
header regex; the decode stays JVM-side (``F.decode``), restricted to
the charsets Spark supports without the legacy-javaCharsets flag:
US-ASCII, ISO-8859-1, UTF-8, UTF-16/BE/LE (+ UTF-32). Windows-1252 is
mapped to ISO-8859-1 — the standard crawler approximation (they differ
only in 0x80-0x9F, where ISO-8859-1 has control characters no text
pipeline wants anyway); anything unrecognized falls back to ISO-8859-1,
which never fails (every byte sequence is valid latin-1), matching the
verdict's latin-1-fallback ask. Absent charset defaults to UTF-8 (the
HTML5 default; malformed sequences come back as U+FFFD, Java's REPLACE
decoder policy — same as Python's errors='replace').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CHARSET_RE = r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)"""


def sniff_charset(mime_col) -> Column:
    """Uppercased charset token from a Content-Type header value,
    '' when absent."""
    return F.upper(F.regexp_extract(mime_col, _CHARSET_RE, 1))


def decode_payload(payload_col, mime_col) -> Column:
    """binary payload + Content-Type header -> string, honoring the
    declared charset (see module docstring for the support matrix and
    fallbacks)."""
    # NULL Content-Type (header absent) must take the UTF-8 default like
    # the empty string, not fall through every NULL-valued when() to the
    # latin-1 branch
    cs = F.coalesce(sniff_charset(mime_col), F.lit(""))
    return (
        F.when(cs.isin("", "UTF-8", "UTF8"), F.decode(payload_col, "UTF-8"))
        .when(cs.isin("US-ASCII", "ASCII"), F.decode(payload_col, "US-ASCII"))
        .when(cs.isin("UTF-16LE"), F.decode(payload_col, "UTF-16LE"))
        .when(cs.isin("UTF-16BE"), F.decode(payload_col, "UTF-16BE"))
        .when(cs.isin("UTF-16"), F.decode(payload_col, "UTF-16"))
        .otherwise(F.decode(payload_col, "ISO-8859-1"))
    )
