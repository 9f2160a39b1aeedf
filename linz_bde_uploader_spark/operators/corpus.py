"""Corpus sharding: materialize a training dataset as deterministic,
evenly-sized parquet shards.

The reference's only sink is a per-table bulk load
(/root/reference/lib/LINZ/BdeDatabase.pm:512-565); a training-data
pipeline additionally needs the *export* side — write the cleaned/
deduped corpus as shards that (a) are reproducible run-to-run,
(b) bound file sizes so downstream loaders stream them, and (c) land
grouped by a partition column (e.g. language) for selective reads.

Scale notes (100 TB):
- Shard assignment is a pure hash of the stable row key — no global
  sort, no sample-based range partitioner, no driver involvement.
- ``repartition(partition_cols + [shard])`` gives exactly one task
  per output shard, so file count and file size are controlled by
  ``n_shards`` alone (plus ``maxRecordsPerFile`` as a guard rail).
- ``sortWithinPartitions`` costs a per-task in-memory sort only (no
  extra shuffle) and makes every shard internally ordered, which
  keeps parquet row-group stats tight for key-range reads.
- A deterministic pseudo-shuffle (``shuffle_col``) orders rows by a
  seeded hash — the "shuffle the corpus before training" pass —
  without ``rand()``'s run-to-run nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shards(df: DataFrame, key: str, n_shards: int,
                  seed: int = 0) -> DataFrame:
    """Add a deterministic shard id in [0, n_shards) hashed from
    ``key``. xxhash64 is a JVM-side expression (no UDF) and seeded,
    so re-runs and different engines agree."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.xxhash64(F.col(key), F.lit(seed))
    return df.withColumn(SHARD_COL, F.pmod(h, F.lit(n_shards)).cast("int"))


def shuffle_col(df: DataFrame, key: str, seed: int = 0,
                name: str = "shuffle_order") -> DataFrame:
    """Deterministic pseudo-random ordering column: sort by it to
    shuffle the corpus reproducibly (rand() changes between runs and
    retries; a seeded hash does not)."""
    return df.withColumn(name, F.xxhash64(F.col(key), F.lit(seed)))


def write_corpus_shards(df: DataFrame, path: str, key: str,
                        n_shards: int, partition_by: list[str] | None = None,
                        sort_within: str | None = None,
                        max_records_per_file: int = 0,
                        seed: int = 0) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards,
    optionally hive-partitioned by ``partition_by`` columns.

    One repartition shuffle total: rows move to their
    (partition, shard) task, each task writes one file (bounded by
    ``max_records_per_file`` if set), optionally sorted by
    ``sort_within`` for tight row-group statistics.
    """
    partition_by = partition_by or []
    out = assign_shards(df, key, n_shards, seed=seed)
    out = out.repartition(*(partition_by + [SHARD_COL]))
    if sort_within is not None:
        out = out.sortWithinPartitions(*partition_by, SHARD_COL, sort_within)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
