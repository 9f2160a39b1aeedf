"""Bucketed interval (range) join — the scale path for time-range
predicates.

A naive ``l.join(r, (r.ts >= l.ts+lo) & (r.ts <= l.ts+hi))`` has no
equi-key, so Catalyst can only plan BroadcastNestedLoopJoin /
CartesianProduct — O(|L|·|R|) and a 100 TB incident. The standard
rewrite buckets time into fixed windows of the interval's width: a
right row lands in exactly one bucket; a left row's query interval
spans at most two adjacent buckets. Joining on (key, bucket) makes it
an ordinary hash equi-join (partition-parallel, AQE-skew-splittable)
whose output is then filtered by the exact range predicate — the
bucket join admits only candidates within one bucket width, so the
post-filter sees O(matches), not O(pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.timeutil import epoch_micros

_BUCKET = "_rj_bucket"
_LUS = "_rj_l_us"
_RUS = "_rj_r_us"
_RH = "_rj_row_hash"
_RN = "_rj_row_n"


def interval_join(left: DataFrame, right: DataFrame,
                  left_ts: str, right_ts: str,
                  lower_s: float, upper_s: float,
                  key: str | None = None,
                  how: str = "inner",
                  left_id: str | None = None) -> DataFrame:
    """Pair each left row with the right rows whose ``right_ts`` lies
    in ``[left_ts + lower_s, left_ts + upper_s]`` (seconds, inclusive),
    optionally also matching on an equi ``key``.

    ``how``: 'inner' or 'left_outer' (left rows with no range match
    survive with null right columns). Integer microsecond arithmetic
    throughout — no float time math.

    ``left_id``: a column the caller GUARANTEES is unique per left
    row (an event id, a primary key). left_outer needs a per-row
    identity to decide "no match"; with ``left_id`` it is used
    directly — zero extra cost. Without it a deterministic id is
    derived (content hash + row_number within identical rows), which
    costs one extra hash shuffle of the left side.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how: {how}")
    width_us = int(round((upper_s - lower_s) * 1_000_000))
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))

    overlap = [c for c in right.columns if c in left.columns and c != key]
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {overlap}")

    if left_id is not None and left_id not in left.columns:
        raise ValueError(f"left_id column not on left side: {left_id}")

    l_base = left.withColumn(_LUS, epoch_micros(left_ts))
    id_cols = [left_id] if left_id else [_RH, _RN]
    if how == "left_outer" and not left_id:
        # row id assigned BEFORE the bucket explode: "no match" is a
        # per-original-row fact, and anti-joining on the id avoids the
        # null-key pitfalls of joining back on data columns. The id is
        # DETERMINISTIC (content hash + row_number within identical
        # rows), never monotonically_increasing_id(): this plan
        # evaluates l_base in two subtrees (matched + unmatched), and a
        # nondeterministic id can differ between them under shuffle
        # reordering or stage retry, silently dropping/duplicating
        # rows. Identical rows are interchangeable, so the arbitrary
        # row_number order WITHIN a hash group cannot change results —
        # match status is a function of row content only.
        l_base = l_base.withColumn(
            _RH, F.xxhash64(*[F.col(c) for c in left.columns]))
        l_base = l_base.withColumn(
            _RN, F.row_number().over(
                Window.partitionBy(_RH).orderBy(F.lit(1))))
    # the query interval [l+lo, l+hi] spans exactly width_us, so it
    # covers at most two adjacent buckets -> explode into both
    l = l_base.withColumn(
        _BUCKET,
        F.explode(F.array_distinct(F.array(
            F.floor((F.col(_LUS) + lo_us) / width_us),
            F.floor((F.col(_LUS) + hi_us) / width_us)))))
    r = right.withColumn(_RUS, epoch_micros(right_ts))
    r = r.withColumn(_BUCKET, F.floor(F.col(_RUS) / width_us))

    on = [_BUCKET] + ([key] if key else [])
    in_range = ((F.col(_RUS) >= F.col(_LUS) + lo_us)
                & (F.col(_RUS) <= F.col(_LUS) + hi_us))

    if how == "inner":
        out = l.join(r, on, "inner").filter(in_range)
        return out.drop(_BUCKET, _LUS, _RUS)

    # left_outer: inner-match first, then append the left rows whose id
    # never matched ("no match" is decided per original row id, not per
    # bucket copy — the unmatched side starts from the PRE-explode base,
    # so it needs no re-explode and no dedup shuffle)
    matched = l.join(r, on, "inner").filter(in_range) \
        .drop(_BUCKET, _LUS, _RUS)
    unmatched = (
        l_base.drop(_LUS)
        .join(matched.select(*id_cols).distinct(), id_cols, "left_anti")
    )
    for c in matched.columns:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
    out = matched.unionByName(unmatched.select(*matched.columns))
    return out if left_id else out.drop(_RH, _RN)
