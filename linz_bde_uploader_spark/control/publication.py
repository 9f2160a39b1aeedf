"""Control-table publication (S8) — the Spark-native analog of
``bin/linz-bde-uploader-schema-publish.pl:57-94``.

The reference creates a PostgreSQL logical-replication publication
``all_bde_control`` and idempotently adds every ``bde_control`` table
to it, so downstream consumers can subscribe to the upload ledger
(jobs, per-table state, upload statistics). There is no logical
replication between a JSON ledger and a data lake, so the analog
publishes the same contract a subscriber actually consumes:

- a named publication directory with a manifest
  (publication name, member tables, publish counter, watermark)
- one queryable parquet snapshot per control table, refreshed on
  each ``publish()``
- idempotent membership: tables discovered in the ledger that are
  not yet in the publication are ADDED (the reference's
  ``ALTER PUBLICATION ... ADD TABLE`` loop); members never drop out
- the same failure mode: publishing against an uninitialized
  control area raises, mirroring ``RAISE EXCEPTION 'Schema
  bde_control does not exist'``

When a ``JdbcTarget`` is supplied the snapshots additionally append
to real database tables (S7 sink reuse) — the closest executable
analog of a replica when a PostgreSQL is present.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linz_bde_uploader_spark.control.ledger import Ledger

PUBLICATION_NAME = "all_bde_control"


class PublicationError(RuntimeError):
    pass


def _control_tables(ledger: Ledger) -> dict[str, list[dict]]:
    """Discover the control tables dynamically from the ledger state —
    new top-level collections appear in later publishes automatically,
    like the reference's pg_class scan."""
    state = ledger._load()
    out: dict[str, list[dict]] = {}
    for key, value in state.items():
        if isinstance(value, list):
            out[key] = [v if isinstance(v, dict) else {"value": v}
                        for v in value]
        elif isinstance(value, dict):
            out[key] = [{"name": k, **v} if isinstance(v, dict)
                        else {"name": k, "value": v}
                        for k, v in value.items()]
    return out


def _to_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Rows -> DataFrame with parquet-safe types (all-NULL columns
    become string; heterogenous values stringified)."""
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)

    def norm(v):
        if v is None or isinstance(v, (int, float, bool, str)):
            return v
        return str(v)

    # a column must be one type: stringify columns with mixed types
    col_types: dict[str, set] = {c: set() for c in cols}
    for r in rows:
        for c in cols:
            v = norm(r.get(c))
            if v is not None:
                col_types[c].add(bool if isinstance(v, bool) else type(v))
    # int+float mixes promote to float instead of string
    stringify = set()
    for c, ts in col_types.items():
        if ts <= {int, float} or len(ts) <= 1:
            continue
        stringify.add(c)
    data = []
    for r in rows:
        vals = []
        for c in cols:
            v = norm(r.get(c))
            if c in stringify and v is not None:
                v = str(v)
            elif col_types[c] <= {int, float} and len(col_types[c]) == 2 \
                    and v is not None:
                v = float(v)
            vals.append(v)
        data.append(tuple(vals))
    fields = []
    for c in cols:
        ts = col_types[c]
        if c in stringify or not ts or ts == {str}:
            dt: T.DataType = T.StringType()
        elif ts == {bool}:
            dt = T.BooleanType()
        elif ts == {int}:
            dt = T.LongType()
        else:
            dt = T.DoubleType()
        fields.append(T.StructField(c, dt))
    return spark.createDataFrame(data, T.StructType(fields))


class ControlPublication:
    """A publication over a Ledger's control tables."""

    def __init__(self, root: str, name: str = PUBLICATION_NAME):
        self.root = root
        self.name = name
        self.dir = os.path.join(root, name)
        self._manifest_path = os.path.join(self.dir, "manifest.json")

    # ------------------------------------------------------- manifest
    def manifest(self) -> dict | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def _write_manifest(self, m: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh, indent=1)
        os.replace(tmp, self._manifest_path)

    # --------------------------------------------------------- publish
    def publish(self, spark: SparkSession, ledger: Ledger,
                jdbc=None) -> dict:
        """Create-if-missing + add-new-tables + refresh snapshots.
        Returns {"publication", "tables", "added", "n_publish"}."""
        if not os.path.exists(os.path.join(ledger.root, "ledger.json")):
            # schema-load must run first (reference :64-68)
            raise PublicationError(
                f"Control area {ledger.root} does not exist, "
                "run an upload (schema load) first?")
        tables = _control_tables(ledger)
        m = self.manifest() or {"publication": self.name, "tables": [],
                                "n_publish": 0}
        added = [t for t in tables if t not in m["tables"]]
        m["tables"] = m["tables"] + added       # membership only grows
        m["n_publish"] += 1
        m["published_at"] = time.strftime("%Y-%m-%d %H:%M:%S",
                                          time.gmtime())
        for name in m["tables"]:
            rows = tables.get(name, [])
            df = _to_df(spark, rows)
            if not df.columns:     # empty member: keep a placeholder
                df = spark.createDataFrame(
                    [], T.StructType([T.StructField("name", T.StringType())]))
            path = os.path.join(self.dir, name)
            df.write.mode("overwrite").parquet(path)
            if jdbc is not None:
                from linz_bde_uploader_spark.sources.jdbc import write_table
                write_table(df.withColumn(
                    "_published_at", F.lit(m["published_at"])),
                    jdbc, f"{self.name}_{name}")
        self._write_manifest(m)
        return {"publication": self.name, "tables": m["tables"],
                "added": added, "n_publish": m["n_publish"]}

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        """Subscriber side: the latest published snapshot."""
        return spark.read.parquet(os.path.join(self.dir, table))
