"""Gate-facing query registry.

Each submodule contributes:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE: dict[str, str]`` — DuckDB-runnable ANSI SQL equivalents
  (omitted for non-SQL-expressible operators; the driver then records a
  rows-only check).

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values. Float aggregates are rounded
on both sides (sum order differs between engines; see ``_round`` notes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from disq_spark.queries import events, genomics, llm, relational, sampling, sketches


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, events, llm, genomics, sketches, sampling):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, events, llm, genomics, sketches, sampling):
        out.update(mod.ORACLE)
    return out
