"""Streaming exact deduplication — a custom stateful operator built on
``applyInPandasWithState`` (the arbitrary-state API; nothing built-in
expresses "emit only the first occurrence ever seen per key").

Semantics: incoming documents are keyed by content fingerprint
(md5 of whitespace-normalized lowercased text); the first document of a
fingerprint is emitted, every later one is dropped and counted in state.

Scale notes:
- state per key = one long (occurrence count): the state store holds
  |distinct fingerprints| entries — the minimum any exact streaming dedup
  can carry. For bounded retention, pass ``ttl_minutes`` to expire
  fingerprints via processing-time timeout (trades global exactness for
  bounded state, the standard production compromise).
- the fingerprint groupBy is the operator's single shuffle; Spark's
  state-store partitioning makes re-keyed batches hit local state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from disq_spark.functions.text import normalize


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit each distinct-content document once (first occurrence wins;
    within a micro-batch, the row with the smallest first column value).

    Output schema = input schema + ``fingerprint``.
    """
    in_fields = stream.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields)
        + ", fingerprint string"
    )
    cols = [f.name for f in in_fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = [pdf for pdf in pdfs if len(pdf)]
        n_new = sum(len(b) for b in batches)
        seen = state.get[0] if state.exists else 0
        if seen == 0 and n_new > 0:
            first = (
                pd.concat(batches, ignore_index=True)
                .sort_values(cols[0], kind="mergesort")
                .head(1)
                .copy()
            )
            first["fingerprint"] = key[0]
            yield first[cols + ["fingerprint"]]
        state.update((seen + n_new,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    keyed = stream.withColumn("__fp", F.md5(normalize(F.col(text_col)))).groupBy("__fp")
    return keyed.applyInPandasWithState(
        dedup, out_schema, "seen long", "append", timeout
    )
