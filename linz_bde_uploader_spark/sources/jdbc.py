"""JDBC sink: true-PostgreSQL-parity writes (S7).

The reference streams cleansed rows into PostgreSQL via COPY
(lib/LINZ/BdeDatabase.pm:512-565). The Spark-native equivalent is a
partitioned ``df.write.jdbc`` append with rewriteBatchedInserts —
each executor partition opens its own connection, so throughput
scales with the cluster, not with one COPY pipe.

No PostgreSQL (or JDBC driver) exists in this environment, so the
write path is exercised only up to option assembly; connection errors
surface naturally when a real cluster provides the driver jar.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class JdbcTarget:
    url: str                      # jdbc:postgresql://host:5432/db
    schema: str = "bde"
    user: str = "bde_dba"
    password: str = ""
    batch_size: int = 10000
    isolation: str = "READ_COMMITTED"

    def options(self, table: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": f"{self.schema}.{table}",
            "user": self.user,
            "password": self.password,
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation,
            # server-side batching: one round trip per batch (pgjdbc
            # property name is case-sensitive: reWriteBatchedInserts)
            "reWriteBatchedInserts": "true",
            "driver": "org.postgresql.Driver",
        }


def write_table(df: DataFrame, target: JdbcTarget, table: str,
                mode: str = "append", num_partitions: int | None = None) -> None:
    """Append a staged DataFrame into the target table. ``overwrite``
    with truncate=true mirrors the reference's DELETE+INSERT level-0
    apply (keeps table DDL/triggers, sql/...:1949-1973)."""
    out = df
    if num_partitions is not None:
        out = df.coalesce(num_partitions)
    writer = out.write.format("jdbc").mode(mode)
    for k, v in target.options(table).items():
        writer = writer.option(k, v)
    if mode == "overwrite":
        writer = writer.option("truncate", "true")
    writer.save()


def read_table(spark, target: JdbcTarget, table: str,
               partition_column: str | None = None,
               num_partitions: int = 16,
               lower_bound: int | None = None,
               upper_bound: int | None = None) -> DataFrame:
    """Partitioned JDBC scan of a keyed table: with a partition column
    + bounds, Spark issues num_partitions range queries in parallel."""
    reader = spark.read.format("jdbc")
    for k, v in target.options(table).items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound or 0))
                  .option("upperBound", str(upper_bound or 1)))
    return reader.load()
