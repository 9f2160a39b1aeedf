"""Upgrade-path tests: a ledger/store written by an earlier release
must open cleanly and be stamped current — the analog of the
reference's released-version upgrade matrix
(t/test-upgrades.bash:6-63 over sql/99-patches.sql:18-78)."""

import json
import os

from linz_bde_uploader_spark.control.ledger import Ledger
from linz_bde_uploader_spark.control.migrations import (
    LEDGER_PATCHES,
    LEDGER_SCHEMA_VERSION,
    STORE_SCHEMA_VERSION,
    migrate_ledger_state,
    migrate_store,
)
from linz_bde_uploader_spark.sources.store import TableStore


def _v1_ledger_state():
    """Round-1 layout: no version stamp, no next_job_id, jobs without
    options, tables without row tolerances, stats without duration."""
    return {
        "jobs": [
            {"id": 1, "schema_name": "bde_upload_1", "status": "C",
             "start_time": 1.0, "end_time": 2.0},
            {"id": 7, "schema_name": "bde_upload_7", "status": "E",
             "start_time": 3.0, "end_time": 4.0},
        ],
        "tables": {
            "pab1": {"table_name": "pab1", "key_column": "audit_id",
                     "last_upload_dataset": "20160601000001",
                     "last_level0_dataset": "20160601000000",
                     "last_upload_type": "5", "last_upload_details": "",
                     "last_upload_time": 5.0, "upl_id_lock": None},
        },
        "stats": [
            {"upl_id": 1, "table_name": "pab1",
             "dataset": "20160601000000", "ninsert": 3, "nupdate": 0,
             "nnullupdate": 0, "ndelete": 0},
        ],
    }


def test_ledger_upgrades_v1_layout(tmp_path):
    root = str(tmp_path / "ctl")
    os.makedirs(root)
    with open(os.path.join(root, "ledger.json"), "w") as fh:
        json.dump(_v1_ledger_state(), fh)

    led = Ledger(root)
    st = led._state
    assert st["schema_version"] == LEDGER_SCHEMA_VERSION
    assert st["applied_patches"] == [n for n, _ in LEDGER_PATCHES]
    # next_job_id resumes past the highest historical id — a fresh job
    # must not re-use id 7 (the original defect the patch fixes)
    assert st["next_job_id"] == 8
    job = led.create_job()
    assert job.id == 8
    assert all("options" in j for j in led._state["jobs"])
    assert led._state["tables"]["pab1"]["row_tol_error"] is None
    assert led._state["stats"][0]["duration"] == 0.0


def test_ledger_migration_idempotent():
    state = _v1_ledger_state()
    first = migrate_ledger_state(state)
    assert first == [n for n, _ in LEDGER_PATCHES]
    again = migrate_ledger_state(state)
    assert again == []  # recorded by name, replay is a no-op
    assert state["schema_version"] == LEDGER_SCHEMA_VERSION


def test_ledger_partial_upgrade_applies_missing_suffix():
    """A deployment stopped at patch 2 replays only patches 3+."""
    state = _v1_ledger_state()
    names = [n for n, _ in LEDGER_PATCHES]
    state["applied_patches"] = names[:2]
    for _, fn in LEDGER_PATCHES[:2]:
        fn(state)
    ran = migrate_ledger_state(state)
    assert ran == names[2:]


def test_fresh_ledger_born_current(tmp_path):
    led = Ledger(str(tmp_path / "new"))
    assert led._state["schema_version"] == LEDGER_SCHEMA_VERSION
    assert led._state["applied_patches"] == [n for n, _ in LEDGER_PATCHES]


def test_store_backfills_v1_pointer(tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "pab1", "v=1"))
    # round-1 pointer: version only, none of key/dataset/catalog
    with open(os.path.join(root, "pab1", "_CURRENT"), "w") as fh:
        json.dump({"version": 1}, fh)

    store = TableStore(root, n_buckets=2)  # migrate-on-open
    with open(os.path.join(root, "pab1", "_CURRENT")) as fh:
        ptr = json.load(fh)
    assert ptr == {"version": 1, "key": None, "dataset": None,
                   "catalog": False}
    with open(os.path.join(root, "_SCHEMA")) as fh:
        stamp = json.load(fh)
    assert stamp["schema_version"] == STORE_SCHEMA_VERSION
    assert store.current_version("pab1") == 1
    # second open replays nothing
    assert migrate_store(root) == []


def test_store_compact_preserves_rows_and_versions(spark, tmp_path):
    """Compaction rewrites the current snapshot through the normal
    write path: same rows, new version, old version still a revision,
    bucketing key carried from the pointer."""
    import json
    import os

    from pyspark.sql import functions as F

    store = TableStore(str(tmp_path / "store"), n_buckets=2)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    v1 = store.write("t", df, key="k")
    # simulate a fragmented append layout on top of the snapshot
    v2 = store.compact(spark, "t")
    assert v2 == v1 + 1
    back = store.read(spark, "t")
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))
    assert store.versions("t") == [v1, v2]
    with open(os.path.join(str(tmp_path / "store"), "t", "_CURRENT")) as fh:
        assert json.load(fh)["key"] == "k"
