"""Audit the PUBLISHED column types of every oracle SQL against the
portable-type doctrine (see ORACLE.md): a result column may only be
BIGINT/INTEGER, DOUBLE, VARCHAR, BOOLEAN, DATE, or TIMESTAMP.

Why: the driver's gate demonstrably fetches the DuckDB side through a
pandas conversion in which HUGEINT (the type of every uncast SUM over
integers) and DECIMAL(p,s) both degrade to float64 — so an integer 3
renders '3.0' against Spark's '3', and DECIMAL '123.40' renders
'123.4' — while the local fetchall() path hands back exact
int/Decimal values. Six round-7 driver-red-but-local-green rows
(events_json_props, q11_important_parts, cdc_minmax_refresh,
docs_quality_deciles, docs_epoch_plan, events_cube) are exactly the
six snapshot queries whose oracles published HUGEINT- or
DECIMAL-typed columns; the type-twin pair events_rollup (SUM cast to
DOUBLE, green) vs events_cube (same SUM cast to DECIMAL(38,2), red)
pins it. This script makes the doctrine mechanical: flag every
published HUGEINT/DECIMAL column before the driver does.

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import duckdb

import __spark_entry__ as entrymod
from linz_bde_uploader_spark.plans.tables import TABLES

SAFE = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
        "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    flagged = {}
    for name, sql in entrymod.oracle_sql().items():
        if sql is None:
            continue
        # The probe battery (plans/probe_suite.py) DELIBERATELY
        # publishes banned constructs as fetch-path diagnostics; a
        # permanently-failing audit would train readers to ignore a
        # nonzero exit, so exempt them — nonzero again means a REAL
        # oracle regressed.
        if name.startswith(("probe_", "xfail_probe_")):
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception:
            try:
                cur = con.execute(sql)
                cols = [(d[0], str(d[1])) for d in cur.description]
            except Exception as e:
                print(f"ERROR {name}: {str(e).splitlines()[0][:120]}")
                continue
        bad = [(c, ty) for c, ty in cols
               if not any(ty.upper().startswith(s) for s in SAFE)]
        if bad:
            flagged[name] = bad
            print(f"FLAG  {name}: {bad}")
    print()
    if flagged:
        print(f"{len(flagged)} oracles publish non-portable column types")
        sys.exit(1)
    print("all oracles publish portable types only")


if __name__ == "__main__":
    main()
