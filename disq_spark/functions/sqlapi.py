"""SQL surface for the text/hash primitives — Spark 4 SQL scalar
functions (``CREATE FUNCTION ... RETURN <expr>``, SPARK-44076), so a
SQL-only user gets the same deterministic primitives the DataFrame API
exposes, evaluated JVM-side with full codegen (these are expression
macros, NOT Python UDFs — zero serialization, same plan as the Column
functions).

``register_sql_functions(spark)`` installs the ``ds_*`` family as
temporary functions (idempotent CREATE OR REPLACE, session-scoped):

- ds_normalize(s)      -> canonical text (lower, collapse ws, trim)
- ds_tokens(s)         -> array<string> whitespace tokens ('' -> [])
- ds_token_count(s)    -> bigint
- ds_bpe_token_count(s)-> bigint (GPT-2-ish pre-tokenizer estimate)
- ds_fingerprint(s)    -> md5 of normalized text (doc fingerprint)
- ds_content_hash(s)   -> sha256 of normalized text (exact-dedup key)
- ds_gram_hash(s)      -> 60-bit int64 gram fingerprint
- ds_uniform(key, seed)-> deterministic uniform [0,1) from md5(seed||key)
                          (the partition-invariant sampling primitive)

Every body is the Spark-dialect twin of the fragments the DuckDB
oracles use (queries/llm.py _NORM/_TOKS, operators/sampling.uniform_sql,
operators/dedup.gram_hash) — parity is pinned by tests/test_sqlapi.py
against the Column implementations on edge inputs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Spark-dialect normalized text / tokens (regexp_replace replaces all
# matches by default — no 'g' flag, unlike the DuckDB twin).
_NORM = "trim(regexp_replace(lower({s}), '\\\\s+', ' '))"
_TOKS = (
    "(CASE WHEN " + _NORM + " = '' THEN array() "
    "ELSE split(" + _NORM + ", ' ') END)"
)
_BPE = "regexp_extract_all(" + _NORM + ", '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"

#: 13 hex digits = 52 bits, exact in a double (sampling.uniform_sql twin)
_U_DIGITS = 13
_U_SPACE = float(16**_U_DIGITS)

_DEFINITIONS: list[str] = [
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_normalize(s STRING) "
        "RETURNS STRING RETURN " + _NORM.format(s="s")
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_tokens(s STRING) "
        "RETURNS ARRAY<STRING> RETURN " + _TOKS.format(s="s")
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_token_count(s STRING) "
        "RETURNS BIGINT RETURN CAST(size(" + _TOKS.format(s="s") + ") AS BIGINT)"
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_bpe_token_count(s STRING) "
        "RETURNS BIGINT RETURN CAST(size(" + _BPE.format(s="s") + ") AS BIGINT)"
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_fingerprint(s STRING) "
        "RETURNS STRING RETURN md5(" + _NORM.format(s="s") + ")"
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_content_hash(s STRING) "
        "RETURNS STRING RETURN sha2(" + _NORM.format(s="s") + ", 256)"
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_gram_hash(s STRING) "
        "RETURNS BIGINT RETURN CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    ),
    (
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_uniform(key STRING, seed STRING) "
        "RETURNS DOUBLE RETURN "
        f"CAST(conv(substring(md5(concat(seed, key)), 1, {_U_DIGITS}), 16, 10) AS DOUBLE)"
        f" / {_U_SPACE!r}"
    ),
]

SQL_FUNCTION_NAMES = tuple(d.split("FUNCTION ")[1].split("(")[0] for d in _DEFINITIONS)


def register_sql_functions(spark: SparkSession) -> tuple[str, ...]:
    """Install the ``ds_*`` SQL functions into the session (idempotent).
    Returns the registered names."""
    for ddl in _DEFINITIONS:
        spark.sql(ddl)
    return SQL_FUNCTION_NAMES
