"""Skew mitigation helpers.

Spark's own defenses cover most skew: partial (map-side) aggregation
flattens hot grouping keys, and AQE's skew-join splitting re-plans
oversized partitions at runtime. The residual case is a shuffle
equi-join where one side has a pathological hot key, the other side is
too big to broadcast, and the engine's split sizes still leave one
straggler task. ``salted_join`` is the classic manual rewrite for that
case: spread the hot side across N sub-keys, replicate the other side
N ways, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``skewed`` (the side with hot keys) to ``other`` on
    ``key``, spreading each key across ``n_salts`` shuffle partitions.

    Skewed rows take a deterministic-per-run salt from a row id (NOT
    from a hash of the key — that would re-concentrate the hot key);
    ``other`` rows are replicated once per salt, so the join holds
    row-for-row: each skewed row meets every other-side row for its
    key in exactly one salted partition. Cost: |other| * n_salts
    shuffle volume — pick n_salts ~ hot-key-rows / target-partition
    rows, and keep the replicated side the smaller one.

    Supports 'inner' and 'left_outer' (semantics preserved because
    every skewed row carries exactly one salt).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how: {how}")
    l = skewed.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), n_salts))
    r = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    dup = [c for c in other.columns if c in skewed.columns and c != key]
    if dup:
        raise ValueError(f"ambiguous columns on both sides: {dup}")
    out = l.join(r, [key, _SALT], how)
    return out.drop(_SALT)
