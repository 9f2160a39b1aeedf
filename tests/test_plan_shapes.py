"""Plan-shape pins for optimizer behaviors the 100x-scale safety
arguments rest on.

The top-k IVM family (operators/merge.py maintain_topk) and the
cdc_topk_refresh bootstrap rank with ``row_number() OVER (PARTITION
BY g ORDER BY ...) <= k`` over low-cardinality groups. That shape is
only scale-safe because Spark >= 3.5 rewrites it to WindowGroupLimit
— a per-map-partition top-k prune (Partial) below the exchange plus a
Final prune above it — so no task ever sorts more than k rows per
group per partition. Without the rewrite, a handful of giant groups
would each funnel through one task's full sort. Nothing in the API
*guarantees* the rewrite; these tests fail loudly if an upgrade or a
plan change stops it from applying (SCALE.md "WindowGroupLimit pin").
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_group_limit(plan: str) -> None:
    assert "WindowGroupLimit" in plan, (
        "rank<=k was not pushed below the sort — the top-k recompute "
        "would fully sort every group at scale:\n" + plan)
    # Both modes must be present: Partial is the map-side prune that
    # bounds the pre-shuffle sort; Final bounds the post-shuffle one.
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1], plan
    assert plan.count("WindowGroupLimit") >= 2, (
        "expected Partial AND Final WindowGroupLimit nodes:\n" + plan)


def test_maintain_topk_recompute_uses_window_group_limit(spark):
    """The touched-group recompute inside maintain_topk must carry
    the WindowGroupLimit prune (operators/merge.py:523-536)."""
    from linz_bde_uploader_spark.operators import merge as M

    cur = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7 % 101).cast("decimal(12,2)").alias("v"))
    stg = cur.withColumn(
        "v", F.when(F.col("k") < 20, F.col("v") + 500).otherwise(
            F.col("v")).cast("decimal(12,2)"))
    chg = spark.range(20).select(F.col("id").alias("key"))
    actions = M.classify_actions(cur, stg, chg, "k", ["g", "v"])
    merged = M.apply_actions(cur, stg, actions, "k")
    out = M.maintain_topk(cur, stg, actions, "k", ["g"], "v",
                          merged, k=3)
    _assert_group_limit(_executed_plan(out))


def test_cdc_topk_refresh_bootstrap_uses_window_group_limit(
        spark, sf_dir):
    """The full driver-snapshot query (bootstrap rank over
    o_orderstatus — 3 groups at any SF — plus the maintain_topk
    refresh) must keep the prune end to end."""
    from linz_bde_uploader_spark.plans.engine_suite import (
        q_cdc_topk_refresh,
    )

    plan = _executed_plan(q_cdc_topk_refresh(spark, sf_dir))
    _assert_group_limit(plan)


def test_plain_rank_filter_shape_is_rewritten(spark):
    """Minimal-pair canary: the exact rank-filter idiom every
    grouped_topk/leaderboard call site uses, in isolation, so a
    failure names the optimizer change rather than a call-site
    regression."""
    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("k"),
        (F.col("id") * 3 % 17).alias("v"))
    w = Window.partitionBy("g").orderBy(
        F.col("v").desc(), F.col("k").asc())
    out = (df.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 3))
    _assert_group_limit(_executed_plan(out))


@pytest.mark.parametrize("rank_fn", [F.rank, F.dense_rank])
def test_rank_variants_also_rewritten(spark, rank_fn):
    """rank()/dense_rank() <= k are also WindowGroupLimit-eligible;
    pin them so future operators can use either without re-deriving
    the scale argument."""
    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("k"),
        (F.col("id") * 3 % 17).alias("v"))
    w = Window.partitionBy("g").orderBy(
        F.col("v").desc(), F.col("k").asc())
    out = (df.withColumn("r", rank_fn().over(w))
           .filter(F.col("r") <= 3))
    _assert_group_limit(_executed_plan(out))
