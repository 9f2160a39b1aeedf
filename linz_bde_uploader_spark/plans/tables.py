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
