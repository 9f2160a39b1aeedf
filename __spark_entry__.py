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

_ALL = {**ENGINE_QUERIES, **PIPELINE_QUERIES, **ANALYTICS_QUERIES}


def _configure(spark: SparkSession) -> SparkSession:
    """Session settings the suites rely on (nanos timestamps in
    events.parquet; UTC so formatted timestamps match the naive
    oracle timestamps)."""
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
