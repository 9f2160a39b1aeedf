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

The payloads travel inside ONE struct column: the struct is non-null
for every right row even when the payload values themselves are
null, so ``last(ignorenulls=True)`` skips only left rows, never a
legitimately-null payload — a purchase whose latest prior quote had
``px = NULL`` gets NULL (standard as-of / pandas ``merge_asof``
semantics), not an older non-null quote leaking forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_PAY = "_asof_payload"


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

    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias(_SIDE),
        *([F.col(seq_col)] if seq_col and seq_col not in (key, ts) else []),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias(_PAY))
    pay_type = r.schema[_PAY].dataType
    l = left.withColumn(_SIDE, F.lit(1)) \
            .withColumn(_PAY, F.lit(None).cast(pay_type))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))

    unioned = l.unionByName(r.select(*l.columns))
    order = [F.col(ts), F.col(_SIDE)] + ([F.col(seq_col)] if seq_col else [])
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    return unioned.filter(F.col(_SIDE) == 1).select(
        *lcols, *[F.col(_PAY)[c].alias(c) for c in payload_cols])
