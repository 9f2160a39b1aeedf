"""TESTDATA table loaders.

One quirk: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark reads only as a raw nanosecond long
(``spark.sql.legacy.parquet.nanosAsLong=true``). We convert to a
microsecond TIMESTAMP_NTZ by integer division (truncation). DuckDB
oracles must do the same: ``CAST(ts AS TIMESTAMP)`` truncates
TIMESTAMP_NS to microseconds identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # micros truncation matches DuckDB's CAST(ts AS TIMESTAMP) on
        # TIMESTAMP_NS; stays TIMESTAMP (LTZ) with session tz pinned
        # to UTC so wall-clock matches the oracle's naive timestamps.
        # integer DIV, not `/`: ns values (~1.7e18) exceed double's
        # 2^53 exact-integer range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> list[str]:
    """Register every TESTDATA table as a temp view so ad-hoc
    ``spark.sql`` works against the same inputs the suites use (the
    SQL-first surface: anything DuckDB oracles express, Spark SQL can
    run verbatim modulo dialect). Returns the registered names."""
    names = tables or TABLES
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(names)


def parallelize_small(df: DataFrame) -> DataFrame:
    """Spread a small input across the cluster's cores before
    CPU-heavy per-row work (hashing, shingling, vector math).

    Local-scale artifact: a few-MB parquet file scans as 1-2
    partitions, serializing expression-bound operators on a 32-core
    executor. At 100 TB the scan itself yields thousands of
    partitions and this becomes a no-op (repartition is skipped when
    the input already has enough partitions)."""
    sc = df.sparkSession.sparkContext
    try:
        n_in = len(df.inputFiles())
    except Exception:
        n_in = 1
    target = sc.defaultParallelism
    if n_in >= target:
        return df
    return df.repartition(target)
