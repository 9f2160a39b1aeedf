"""Physical-plan regression tests: the scale properties SCALE.md
documents (broadcast joins, pushdown, bounded shuffles) must survive
refactors. Asserting on plan text is deliberate — a silent fallback
to a shuffle join or a lost filter pushdown is a 100 TB incident that
no row-level test catches."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def _simple(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))


@pytest.fixture(scope="module")
def allq():
    from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
    from linz_bde_uploader_spark.plans.pipeline_suite import PIPELINE_QUERIES
    return {**ENGINE_QUERIES, **PIPELINE_QUERIES}


def test_dim_joins_broadcast(spark, allq):
    """q5 joins 5 dimension tables — every join must broadcast; a
    sort-merge or cartesian fallback would shuffle the fact table
    once per dimension at scale."""
    plan = _simple(allq["q5_local_supplier"][0](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_classify_broadcasts_change_keys(spark, allq):
    """The change-key list must broadcast into both big-table scans
    (the semi-reduction that keeps 100 TB scans local)."""
    plan = _simple(allq["cdc_classify"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, allq):
    """q1's shipdate predicate must reach the parquet reader."""
    plan = _formatted(allq["q1_pricing_summary"][0](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_column_pruning_reaches_scan(spark, allq):
    """dedup_exact needs only (doc_id, text): the scan schema must not
    include the other document columns."""
    plan = _formatted(allq["dedup_exact"][0](spark, SF_DIR))
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("lang" not in l and "source" not in l
                                for l in scan_schemas)


def test_exact_dedup_single_hash_shuffle(spark, allq):
    """Exact dedup is one hash shuffle of content digests (plus the
    local-mode repartition of the tiny input)."""
    plan = _simple(allq["dedup_exact"][0](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
