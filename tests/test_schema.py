"""Schema-tier assertions (the reference's pgTAP t/schema.pg analog):
the control ledger's records must carry the reference's control-table
columns (sql/01-bde_control_tables.sql:43-217), and the store layout
must expose the versioned structure the revisioning contract needs."""

import dataclasses

from linz_bde_uploader_spark.control.ledger import (
    TableState, UploadJob, UploadStats,
)


def _fields(dc) -> set:
    return {f.name for f in dataclasses.fields(dc)}


def test_upload_job_schema():
    """bde_control.upload: id, schema_name, status, start/end time
    (:43-79) + the X4 options K/V."""
    assert {"id", "schema_name", "status", "start_time", "end_time",
            "options"} <= _fields(UploadJob)


def test_upload_table_schema():
    """bde_control.upload_table: watermarks, lock owner, tolerances
    (:83-174)."""
    assert {"table_name", "key_column", "last_upload_dataset",
            "last_level0_dataset", "last_upload_type",
            "last_upload_details", "last_upload_time", "upl_id_lock",
            "row_tol_error", "row_tol_warning"} <= _fields(TableState)


def test_upload_stats_schema():
    """bde_control.upload_stats: per-load I/U/0/D counts + duration
    (:177-217)."""
    assert {"upl_id", "table_name", "dataset", "ninsert", "nupdate",
            "nnullupdate", "ndelete", "duration"} <= _fields(UploadStats)


def test_store_layout(tmp_path, spark):
    """Versioned snapshot dirs + current pointer + vacuum keep-window,
    including catalog-table cleanup in bucketed mode."""
    from pyspark.sql import functions as F

    from linz_bde_uploader_spark.sources.store import TableStore

    store = TableStore(str(tmp_path / "s"), n_buckets=2,
                       use_catalog_buckets=True)
    df = spark.range(10).select(F.col("id").alias("k"))
    for _ in range(4):
        store.write("t", df, key="k")
    assert store.versions("t") == [1, 2, 3, 4]
    assert store.current_version("t") == 4
    names_before = [n for n in
                    (r.name for r in spark.catalog.listTables())
                    if n.startswith(store._prefix)]
    assert len(names_before) == 4
    dropped = store.vacuum("t", keep=2, spark=spark)
    assert dropped == [1, 2]
    names_after = [n for n in
                   (r.name for r in spark.catalog.listTables())
                   if n.startswith(store._prefix)]
    assert len(names_after) == 2
    assert store.read(spark, "t").count() == 10
