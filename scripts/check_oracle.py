"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, then compare row count, schema (column
names), and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified).

Usage: python scripts/check_oracle.py [--exact] [sf_dir] [query ...]

``--exact`` hashes float values at full precision (repr round-trip,
no 9 dp pre-rounding) — the driver's gate hashes exact values, so
the default rounding can mask a last-ulp Spark/DuckDB divergence
that the driver then catches (this is exactly how round 2's two red
rows slipped through). Gate locally with --exact before declaring a
query done.
"""

from __future__ import annotations

import hashlib
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# executor Python workers unpickle the package's UDFs (multimodal
# decode) — they need the repo root too, regardless of caller cwd
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

import duckdb

import __spark_entry__ as entrymod
from linz_bde_uploader_spark.plans.tables import TABLES
from linz_bde_uploader_spark.session import get_spark


EXACT = False


def _canon_num(d) -> str:
    # one fixed-point canonical form for floats AND decimals so a value
    # equal across engines hashes equally regardless of the Python type
    # it surfaces as: no exponent (Decimal('150').normalize() would be
    # '1.5E+2'), no trailing zeros ('150.0' -> '150').
    return format(d.normalize(), "f")


def norm_value(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        # repr() is the exact shortest round-trip of the double, so
        # Decimal(repr(v)) is still value-exact
        return _canon_num(decimal.Decimal(repr(v))) if EXACT \
            else repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # exact mode: scale-insensitive but value-exact (1.50 == 1.5)
        return _canon_num(v) if EXACT else repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def table_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    global EXACT
    args = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.01"
    only = [a for a in args if not os.path.isdir(a)]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = table_hash(srows, scols), table_hash(drows, dcols)
            if sh != dh:
                problems.append("value hash mismatch")
                sset = set("\x1f".join(norm_value(r[i]) for i in
                                       sorted(range(len(scols)), key=lambda i: scols[i]))
                           for r in srows)
                dset = set("\x1f".join(norm_value(r[i]) for i in
                                       sorted(range(len(dcols)), key=lambda i: dcols[i]))
                           for r in drows)
                for x in list(sset - dset)[:2]:
                    print(f"        spark-only: {x[:160]}")
                for x in list(dset - sset)[:2]:
                    print(f"        duck-only:  {x[:160]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
