"""Per-group top-k that scales past low-cardinality groups.

The textbook pattern — ``row_number() OVER (PARTITION BY group ORDER
BY ...)`` then ``rank <= k`` — shuffles EVERY row of a group into one
task and buffers it there. With high-cardinality groups that is fine;
with a handful of groups over a 100 TB corpus (top docs per language,
heavy hitters per source) each group is one straggler task processing
a terabyte.

``grouped_topk`` is the exact two-phase form: phase 1 ranks within
(group, salt) — ``n_salts`` parallel tasks per group, each emitting at
most k rows — and phase 2 ranks the <= k * n_salts survivors per
group. Exact by a pigeonhole argument: any row in a group's global
top-k is also in the top-k of its own salt bucket under the same total
order, so phase 1 never discards a winner. Ties must be broken by the
``order`` columns themselves (pass a unique tiebreaker), exactly as
the one-window form already requires for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(df: DataFrame, group_cols: list[str],
                 order_cols: list[Column], k: int,
                 salt_expr: Column, n_salts: int = 32,
                 rank_col: str = "rank") -> DataFrame:
    """Exact top-k rows per group under ``order_cols`` (a total order:
    include a unique tiebreaker). ``salt_expr`` must be a
    deterministic integer expression over the row (e.g. a hash of the
    row's id) — NOT a random: retries and differential tests need the
    same split every run. Adds ``rank_col`` (1-based)."""
    w1 = (Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols))
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
