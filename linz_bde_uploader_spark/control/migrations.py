"""Schema versioning + upgrade patches for the control ledger and the
table store.

Re-expresses the reference's dbpatch mechanism
(sql/99-patches.sql:18-78): patches are NAMED, applied SEQUENTIALLY
(newest last), recorded in an ``applied_patches`` list so re-opening
an already-upgraded deployment is a no-op, and every released layout
must upgrade cleanly (t/test-upgrades.bash:6-63 drives the reference's
equivalent test; ours is tests/test_migrations.py).

The ledger/store are driver-side JSON metadata, so a "patch" here is a
pure ``dict -> None`` mutation of the loaded state instead of SQL. The
patch list is the single source of truth: ``schema_version`` equals
the number of patches a state has absorbed, and a state written by ANY
earlier layout — including round-1 files with no version stamp at all
— replays exactly the missing suffix.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable


def _ledger_add_job_options(state: dict) -> None:
    """1.1.0: jobs gained per-job K/V options (X4, _options)."""
    for j in state.get("jobs", []):
        j.setdefault("options", {})


def _ledger_add_next_job_id(state: dict) -> None:
    """1.1.0: explicit id allocator (was max(id)+1 recomputed on use,
    which re-issued ids of purged jobs and broke stats joins)."""
    if "next_job_id" not in state:
        ids = [j.get("id", 0) for j in state.get("jobs", [])]
        state["next_job_id"] = max(ids, default=0) + 1


def _ledger_add_row_tolerances(state: dict) -> None:
    """1.2.0: per-table row-count tolerances moved into the ledger
    (bde_tables_config row_tol_error/row_tol_warning analog)."""
    for t in state.get("tables", {}).values():
        t.setdefault("row_tol_error", None)
        t.setdefault("row_tol_warning", None)


def _ledger_add_stats_duration(state: dict) -> None:
    """1.3.0: upload_stats gained a duration column (A4)."""
    for s in state.get("stats", []):
        s.setdefault("duration", 0.0)


# Sequential, append-only — newest patches go at the bottom
# (sql/99-patches.sql:13-15). Never reorder or remove entries.
LEDGER_PATCHES: list[tuple[str, Callable[[dict], None]]] = [
    ("ledger 1.1.0: add per-job options", _ledger_add_job_options),
    ("ledger 1.1.0: add next_job_id allocator", _ledger_add_next_job_id),
    ("ledger 1.2.0: add per-table row tolerances", _ledger_add_row_tolerances),
    ("ledger 1.3.0: add stats duration", _ledger_add_stats_duration),
]

LEDGER_SCHEMA_VERSION = len(LEDGER_PATCHES)


def migrate_ledger_state(state: dict) -> list[str]:
    """Apply every patch the state has not yet absorbed, in order.
    Returns the names applied (empty when already current). Mutates
    ``state`` and stamps ``schema_version`` + ``applied_patches``."""
    applied = state.setdefault("applied_patches", [])
    ran = []
    for name, fn in LEDGER_PATCHES:
        if name in applied:
            continue
        fn(state)
        applied.append(name)
        ran.append(name)
    state["schema_version"] = LEDGER_SCHEMA_VERSION
    return ran


def _store_pointer_fields(root: str) -> list[str]:
    """store 1.1.0: pointers gained key/dataset/catalog fields (C8
    revision comments + bucketed-catalog flag). Backfill defaults so
    readers need no per-field existence checks."""
    changed = []
    for table in sorted(os.listdir(root)):
        p = os.path.join(root, table, "_CURRENT")
        if not os.path.isfile(p):
            continue
        with open(p) as fh:
            ptr = json.load(fh)
        before = dict(ptr)
        ptr.setdefault("key", None)
        ptr.setdefault("dataset", None)
        ptr.setdefault("catalog", False)
        if ptr != before:
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(ptr, fh)
            os.replace(tmp, p)  # same atomic commit as TableStore.write
            changed.append(table)
    return changed


STORE_PATCHES: list[tuple[str, Callable[[str], list[str]]]] = [
    ("store 1.1.0: backfill pointer key/dataset/catalog", _store_pointer_fields),
]

STORE_SCHEMA_VERSION = len(STORE_PATCHES)


def migrate_store(root: str) -> list[str]:
    """Upgrade a store root in place; idempotent via the `_SCHEMA`
    stamp file (the store-side applied_patches record)."""
    stamp_path = os.path.join(root, "_SCHEMA")
    stamp = {"applied_patches": []}
    if os.path.isfile(stamp_path):
        with open(stamp_path) as fh:
            stamp = json.load(fh)
    ran = []
    for name, fn in STORE_PATCHES:
        if name in stamp["applied_patches"]:
            continue
        fn(root)
        stamp["applied_patches"].append(name)
        ran.append(name)
    stamp["schema_version"] = STORE_SCHEMA_VERSION
    if ran or not os.path.isfile(stamp_path):
        tmp = stamp_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(stamp, fh)
        os.replace(tmp, stamp_path)
    return ran
