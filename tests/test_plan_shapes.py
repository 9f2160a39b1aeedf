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


# ---------------------------------------------------------------- r9:
# plan CONTRACTS for the shapes the 100 TB arguments rest on beyond
# WindowGroupLimit: filters reaching the parquet scan, column pruning,
# dimension joins broadcasting, and no accidental cartesian products.
# These are the invariants .explain() audits check by hand every
# round; pinning them makes a regression loud instead of a slow bench.


def test_q6_filters_push_to_scan_and_columns_prune(spark, sf_dir):
    """TPC-H Q6 is the pushdown floor: its three predicates must reach
    the parquet scan (PushedFilters non-empty) and the scan schema
    must carry only the 4 referenced columns — a scan reading
    l_comment for a 4-column aggregate would move ~10x the bytes at
    100 TB."""
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        q6_forecast_revenue,
    )

    plan = _executed_plan(q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan, plan
    assert "PushedFilters: []" not in plan, (
        "no filter reached the parquet scan:\n" + plan)
    assert "l_comment" not in plan, (
        "column pruning regressed — scan reads unreferenced columns:\n"
        + plan)
    assert "l_orderkey" not in plan.split("ReadSchema", 1)[-1], plan


def test_q1_scan_prunes_to_referenced_columns(spark, sf_dir):
    """Q1 references 7 lineitem columns; the scan must not read the
    rest (l_comment, l_partkey, ...)."""
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        q1_pricing_summary,
    )

    plan = _executed_plan(q1_pricing_summary(spark, sf_dir))
    tail = plan.split("ReadSchema", 1)[-1]
    assert "l_comment" not in tail and "l_partkey" not in tail, plan


def test_q5_dimension_joins_broadcast_no_cartesian(spark, sf_dir):
    """The multi-dim star join must broadcast its small sides (region/
    nation/supplier fit in memory at ANY scale factor — they are
    fixed-size dims) and must never degrade to a cartesian product."""
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        q5_local_supplier,
    )

    plan = _executed_plan(q5_local_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, (
        "no dimension join broadcasts — every dim join would shuffle "
        "the fact table at scale:\n" + plan)
    assert "CartesianProduct" not in plan, plan


def test_flagship_queries_have_no_cartesian_product(spark, sf_dir):
    """No flagship query may contain an unconstrained cartesian
    product. (BroadcastNestedLoopJoin against a broadcast scalar —
    the labeled crossJoin(broadcast(...)) pattern — is allowed; a
    CartesianProduct exchange is never.)"""
    from linz_bde_uploader_spark.plans.analytics_suite import (
        ANALYTICS_QUERIES,
    )
    from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        PIPELINE_QUERIES,
    )

    for name in ("q3_shipping_priority", "q9_profit_nation_year",
                 "q18_large_orders", "cdc_apply", "cdc_join_refresh",
                 "dedup_minhash_lsh"):
        fn = (PIPELINE_QUERIES.get(name) or ENGINE_QUERIES.get(name)
              or ANALYTICS_QUERIES.get(name))[0]
        plan = _executed_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_q17_part_average_aggregates_brand_filtered_rows(
        spark, sf_dir):
    """Q17's per-part average must aggregate the Brand#3-semi-joined
    lineitem, NOT the whole table (plans/analytics_suite.py
    q17_small_quantity). The unfiltered form shuffles every partkey
    into the aggregate and then broadcasts a per-part average for
    EVERY part — unbounded at corpus scale, and measured as the one
    persistent warm-rep instability in the r16 bench artifact. Pin:
    (a) the brand predicate reaches BOTH part scans (each lineitem
    branch is brand-restricted before any shuffle), and (b) the
    per-part aggregate's subtree — printed below its partial_sum
    node — contains the brand-filtered part join."""
    from linz_bde_uploader_spark.plans.analytics_suite import (
        q17_small_quantity,
    )

    plan = _executed_plan(q17_small_quantity(spark, sf_dir))
    assert plan.count("EqualTo(p_brand,Brand#3)") >= 2, (
        "brand predicate did not reach both part scans:\n" + plan)
    marker = "partial_sum(cast(l_quantity"
    # without the marker the subtree split below degenerates to the
    # whole plan and the Brand#3 check passes vacuously (the first
    # assertion already guarantees two brand predicates somewhere)
    assert marker in plan, (
        "per-part aggregate marker not found — Spark reformatted the "
        "partial aggregate; re-anchor this pin:\n" + plan)
    agg_subtree = plan.rsplit(marker, 1)[-1]
    assert "Brand#3" in agg_subtree, (
        "per-part average aggregates the UNFILTERED lineitem — the "
        "aggregate's input lost the brand semi-join:\n" + plan)


def test_maintain_join_delta_sides_broadcast(spark):
    """The delta-join refresh must broadcast its action-key sides:
    the kept-rows anti join and the staged-delta semi join are both
    |changes|-bounded and must not shuffle the stored view or the
    staged table (operators/merge.py maintain_join)."""
    from linz_bde_uploader_spark.operators import merge as M

    cur = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("ck"),
        F.col("id").cast("string").alias("v"))
    stg = cur.withColumn("v", F.concat(F.col("v"), F.lit("x")))
    chg = spark.range(10).select(F.col("id").alias("key"))
    dim = spark.range(50).select(
        F.col("id").alias("d_key"),
        F.col("id").cast("string").alias("d_name"))
    actions = M.classify_actions(cur, stg, chg, "k", ["ck", "v"])
    out = M.maintain_join(cur, stg, actions, "k", dim, "ck", "d_key",
                          ["v"], ["d_name"])
    plan = _executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    # anti (removal) + semi (delta restriction) both broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_maintain_aggregate_incremental_sides_broadcast(spark):
    """The O(changes) aggregate refresh (operators/merge.py
    maintain_aggregate with a stored old view): both action-key
    restrictions — the current-side delete semi join and the
    staged-side insert semi join — must broadcast, so neither big
    table shuffles; the only exchange is the final bounded
    re-aggregate of old ∪ deltas."""
    from linz_bde_uploader_spark.operators import merge as M

    cur = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g"),
        (F.col("id") % 100).cast("double").alias("v"))
    stg = cur.withColumn("v", F.col("v") + F.lit(1.0))
    chg = spark.range(10).select(F.col("id").alias("key"))
    actions = M.classify_actions(cur, stg, chg, "k", ["g", "v"])
    old = cur.groupBy("g").agg(
        F.count("*").alias("n"),
        F.count("v").alias("n_vals"),
        F.sum(F.col("v").cast("decimal(12,2)")).cast("decimal(38,2)")
        .alias("total"))
    out = M.maintain_aggregate(cur, stg, actions, "k", ["g"], "v",
                               old_agg=old)
    plan = _executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


# ------------------------------------------------------------- r14:
# partition-pruned touched-group recompute. The partial-refresh
# family's "rescan touched groups only" is an O(N) scan + filter
# unless the physical layout lets the scan prune; with the base
# stored PARTITIONED BY the group column, Spark's dynamic partition
# pruning (DPP) can skip untouched partitions — but its
# PartitionPruning rule needs a "likely selective" predicate on the
# pruning side, which merge.mark_selective_for_dpp supplies (an
# always-true xxhash64 comparison the optimizer cannot fold). These
# tests pin that the recompute branch's scan actually carries the
# dynamicpruningexpression; if a Spark upgrade folds the marker or
# tightens the heuristic, they fail loudly (SCALE.md "pruned
# recompute" section).


def _partitioned_merge_fixture(spark, tmp_path):
    from linz_bde_uploader_spark.operators import merge as M

    cur = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 40).alias("g"),
        (F.col("id") * 7 % 101).cast("decimal(12,2)").alias("v"))
    # localized change batch: keys inside two groups only. (k < 1000,
    # NOT k % 5 == 0: k ≡ 3 or 11 (mod 40) is never ≡ 0 (mod 5), so a
    # mod-based pick intersected to the EMPTY set and the fixture
    # exercised a zero-action maintenance — caught in r14 when the
    # bounded-inline default folded the empty recompute branch away
    # entirely.)
    changed = F.col("g").isin(3, 11) & (F.col("k") < 1000)
    stg = cur.withColumn(
        "v", F.when(changed, F.col("v") + 500)
        .otherwise(F.col("v")).cast("decimal(12,2)"))
    chg = cur.filter(changed).select(F.col("k").alias("key"))
    actions = M.classify_actions(cur, stg, chg, "k", ["g", "v"])
    assert actions.filter(F.col("action") == "U").count() == 50
    merged_path = str(tmp_path / "merged_by_g")
    M.apply_actions(cur, stg, actions, "k") \
        .write.mode("overwrite").partitionBy("g").parquet(merged_path)
    merged = spark.read.parquet(merged_path)
    return cur, stg, actions, merged


def test_maintain_extrema_recompute_prunes(spark, tmp_path):
    """maintain_extrema over a group-partitioned merged base: the
    recompute branch's parquet scan must carry a DPP filter on g —
    i.e. only touched groups' partitions are read, which is what
    makes the refresh O(touched rows) in scan cost, not just in
    aggregated rows."""
    from linz_bde_uploader_spark.operators import merge as M

    cur, stg, actions, merged = _partitioned_merge_fixture(
        spark, tmp_path)
    old = cur.groupBy("g").agg(
        F.count("*").alias("n"),
        F.min(F.col("v")).alias("vmin"), F.max(F.col("v")).alias("vmax"))
    # threshold=0 pins the JOIN fallback form (the path taken when a
    # touched set overflows TOUCHED_INLINE_DEFAULT): even there the
    # rescan must prune, via DPP
    out = M.maintain_extrema(cur, stg, actions, "k", ["g"], "v",
                             merged, old_extrema=old,
                             touched_inline_threshold=0)
    plan = _executed_plan(out)
    assert "dynamicpruning" in plan.lower(), (
        "touched-group recompute scan is NOT partition-pruned — the "
        "rescan reads every partition:\n" + plan)


def test_maintain_hll_recompute_prunes(spark, tmp_path):
    """Same pin for the sketch member: maintain_hll's recompute
    branch (groups that lost rows rebuild registers from merged)
    must prune a group-partitioned merged scan to touched groups."""
    from linz_bde_uploader_spark.operators import sketches as SK

    cur, stg, actions, merged = _partitioned_merge_fixture(
        spark, tmp_path)
    old_regs = SK.hll_registers(cur, ["g"], F.col("k").cast("string"))
    out = SK.maintain_hll(cur, stg, actions, "k", ["g"],
                          F.col("k").cast("string"), merged,
                          old_regs=old_regs,
                          touched_inline_threshold=0)
    plan = _executed_plan(out)
    assert "dynamicpruning" in plan.lower(), (
        "HLL recompute scan is NOT partition-pruned:\n" + plan)


def test_dpp_marker_not_folded_and_lossless(spark):
    """The always-true marker itself: never drops a row (including
    NULL groups) and survives optimization as a Filter node — the
    two properties mark_selective_for_dpp's contract rests on."""
    from linz_bde_uploader_spark.operators.merge import (
        mark_selective_for_dpp,
    )

    df = spark.createDataFrame(
        [(None, 1), ("a", 2), ("b", None)], "g string, x int")
    out = mark_selective_for_dpp(df, ["g"])
    assert out.count() == 3  # lossless, NULL group included
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in optimized.lower(), (
        "marker predicate was constant-folded away — DPP unlock "
        "lost:\n" + optimized)


def test_inline_threshold_reaches_scan_as_static_partition_filter(
        spark, tmp_path):
    """touched_group_semi(inline_threshold=N) over a partitioned base
    must turn the touched set into a STATIC PartitionFilter (IN set /
    equality on the partition column) — the strongest pruning form,
    measured 4-6x cheaper than the DPP subquery at sf10
    (SCALE_SOAK.json pruned_recompute_soak)."""
    from linz_bde_uploader_spark.operators import merge as M

    base = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 40).alias("g"),
        (F.col("id") * 7 % 101).alias("v"))
    path = str(tmp_path / "by_g")
    base.write.partitionBy("g").parquet(path)
    stored = spark.read.parquet(path)
    touched = spark.createDataFrame([(3,), (11,)], "g long")
    out = M.touched_group_semi(stored, touched, ["g"],
                               inline_threshold=16) \
        .groupBy("g").agg(F.max("v"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    pf = scan[scan.index("PartitionFilters"):][:200]
    assert ("g#" in pf and ("IN (" in pf or "INSET" in pf
                            or "= 3" in pf or "(g" in pf)), (
        "touched groups did not reach the scan as a static "
        "partition filter:\n" + pf)
    # and the result is the right rows
    got = {r.g for r in out.collect()}
    assert got == {3, 11}


def test_maintain_extrema_default_takes_inline_single_scan(
        spark, tmp_path):
    """The DEFAULT refresh path (touched set under
    TOUCHED_INLINE_DEFAULT): the recompute must take the bounded-
    inline form — the touched groups reach the merged scan as a
    STATIC PartitionFilter with NO DPP subquery machinery and no
    second null-branch scan. This pins the r14 default flip: the
    join+DPP form is the >threshold fallback, not the common case
    (it costs ~0.5 s of subquery overhead per refresh — SCALE.md)."""
    from linz_bde_uploader_spark.operators import merge as M

    cur, stg, actions, merged = _partitioned_merge_fixture(
        spark, tmp_path)
    old = cur.groupBy("g").agg(
        F.count("*").alias("n"),
        F.min(F.col("v")).alias("vmin"), F.max(F.col("v")).alias("vmax"))
    out = M.maintain_extrema(cur, stg, actions, "k", ["g"], "v",
                             merged, old_extrema=old)
    plan = _executed_plan(out)
    assert "dynamicpruning" not in plan.lower(), (
        "default refresh took the DPP fallback, not bounded-inline:\n"
        + plan)
    # the touched groups (2 of 40) reach the merged scan statically
    scan = plan[plan.index("FileScan"):]
    pf = scan[scan.index("PartitionFilters"):][:200]
    assert "g#" in pf, (
        "touched groups did not reach the merged scan as a static "
        "partition filter:\n" + pf)
    # and the maintained view still equals the direct recompute
    direct = {(r.g, r.n, r.vmin, r.vmax) for r in
              merged.groupBy("g").agg(
                  F.count("*").alias("n"),
                  F.min(F.col("v").cast("decimal(12,2)")).alias("vmin"),
                  F.max(F.col("v").cast("decimal(12,2)")).alias("vmax"))
              .collect()}
    got = {(r.g, r.n, r.vmin, r.vmax) for r in out.collect()}
    assert got == direct
