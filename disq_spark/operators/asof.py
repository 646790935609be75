"""As-of join: for each left row, the latest right row with
ts <= left.ts within the same key.

Scale formulation: hash-shuffle both sides on the key, then a per-group
sorted merge via applyInPandas + pandas.merge_asof — one shuffle, state
bounded by the largest single key group (cf. the join+window gate
formulation in queries/events.py, which materializes the full candidate
cross-product before ranking; fine at small scale, quadratic in events
per key at 100 TB).

Differential contract: identical output to the join+window formulation,
tested in tests/test_operators.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. ``on`` = ordered column (timestamp), ``by`` = key.

    Output: all left columns + right's ``right_cols`` (default: all
    non-key/non-on) suffixed, null when no prior right row exists.
    Ties on ``on`` resolve to the right row latest in (on, original
    order) — deterministic given deterministic input order per key.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    r = right.select(
        F.col(by),
        F.col(on).alias(on + suffix),
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{f.name}` {f.dataType.simpleString()}" for f in r.schema.fields if f.name != by]
    )
    left_cols = [f.name for f in left.schema.fields]
    right_out = [f.name for f in r.schema.fields if f.name != by]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort").reset_index(drop=True)
        if len(rpdf) == 0:
            for c in right_out:
                lpdf[c] = None
            return lpdf[left_cols + right_out]
        rpdf = (
            rpdf.drop(columns=[by])
            .sort_values(on + suffix, kind="mergesort")
            .reset_index(drop=True)
        )
        out = pd.merge_asof(
            lpdf, rpdf, left_on=on, right_on=on + suffix, direction="backward"
        )
        return out[left_cols + right_out]

    return left.groupBy(by).cogroup(r.groupBy(by)).applyInPandas(merge, out_schema)
