"""Backward as-of join — a custom operator Spark lacks natively.

For each left row, attach the payload of the most recent right row
with ``right.ts <= left.ts`` in the same key group (the standard
"latest quote for each trade" / "latest feature snapshot for each
training example" join).

Implementation is a composition of built-in ops, NOT a range
cross-join: tag both sides, union them, and run one ordered window
per key with ``last(..., ignorenulls=True)``. Physical shape: a
single hash shuffle on the key followed by a per-partition sort —
O((|L|+|R|) log batch) with no pair blow-up, the same plan family a
purpose-built as-of operator would produce. Right rows order before
left rows at equal timestamps, so "<=" semantics hold exactly; a
caller-supplied sequence column makes ties within a side
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str], seq_col: str | None = None) -> DataFrame:
    """Return ``left`` with ``payload_cols`` from the latest right row
    at-or-before each left row's ``ts`` (null when no prior right row).

    ``seq_col``: optional column present on BOTH sides that breaks
    timestamp ties deterministically (e.g. an event id).
    """
    lcols = left.columns
    overlap = [c for c in payload_cols if c in lcols]
    if overlap:
        raise ValueError(f"payload columns already on left side: {overlap}")

    l = left.withColumn(_SIDE, F.lit(1))
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None))
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias(_SIDE),
        *([F.col(seq_col)] if seq_col and seq_col not in (key, ts) else []),
        *[F.col(c) for c in payload_cols])
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))

    unioned = l.unionByName(r.select(*l.columns))
    order = [F.col(ts), F.col(_SIDE)] + ([F.col(seq_col)] if seq_col else [])
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in payload_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col(_SIDE) == 1).drop(_SIDE).select(
        *lcols, *payload_cols)
