"""CLI mirroring ``bin/linz_bde_uploader.pl``
(/root/reference/bin/linz_bde_uploader.pl:78-102):

  -full / -incremental / -full-incremental / -rebuild / -before <ts>
  -dry-run / -purge / -remove-zombie / -override-locks / -tables ...

Usage:
  python -m linz_bde_uploader_spark.cli \\
      --repository /path/bde_repository --store /path/store \\
      --control /path/control --tables-conf tables.conf -full
"""

from __future__ import annotations

import argparse
import logging
import sys

from linz_bde_uploader_spark.catalog.tables import parse_tables_conf
from linz_bde_uploader_spark.control.ledger import Ledger
from linz_bde_uploader_spark.driver import BdeUploader, UploadConfig
from linz_bde_uploader_spark.session import get_spark
from linz_bde_uploader_spark.sources.repository import BdeRepository
from linz_bde_uploader_spark.sources.store import TableStore


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="linz-bde-uploader-spark")
    p.add_argument("--repository", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--control", required=True)
    p.add_argument("--tables-conf", required=True)
    # reference flags (bin/linz_bde_uploader.pl:78-102); single-dash
    # aliases kept for parity
    p.add_argument("-full", "--full", action="store_true",
                   help="apply latest level-0 snapshot")
    p.add_argument("-incremental", "--incremental", action="store_true",
                   help="apply pending level-5 CDC datasets")
    p.add_argument("-full-incremental", "--full-incremental",
                   dest="full_incremental", action="store_true",
                   help="apply level 0 as a keyed table diff")
    p.add_argument("-rebuild", "--rebuild", action="store_true",
                   help="latest level 0 plus all subsequent level 5")
    p.add_argument("-before", "--before", metavar="YYYYMMDDhhmmss")
    p.add_argument("-dry-run", "--dry-run", dest="dry_run", action="store_true")
    p.add_argument("-purge", "--purge", action="store_true",
                   help="purge finished jobs older than 14 days")
    p.add_argument("-remove-zombie", "--remove-zombie", dest="remove_zombie",
                   action="store_true")
    p.add_argument("-override-locks", "--override-locks", dest="override_locks",
                   action="store_true")
    p.add_argument("-tables", "--tables", nargs="*", default=None,
                   help="restrict to these tables (P3 subset filter)")
    p.add_argument("-exclude-tables", "--exclude-tables", nargs="*", default=None)
    p.add_argument("-parallel-tables", "--parallel-tables",
                   dest="parallel_tables", type=int, default=1,
                   help="tables loaded concurrently within a dataset "
                        "(extension; 1 = reference-faithful sequential)")
    p.add_argument("-enable-hooks", "--enable-hooks", dest="enable_hooks",
                   action="store_true")
    p.add_argument("-skip-postupload-tasks", "--skip-postupload-tasks",
                   dest="skip_postupload", action="store_true",
                   help="skip X1 post-upload/post-level0 functions")
    p.add_argument("-full-timeout", "--full-timeout", dest="full_timeout",
                   type=float, default=0.0, metavar="HOURS",
                   help="level-0 runtime budget (0 = unlimited)")
    p.add_argument("-inc-timeout", "--inc-timeout", dest="inc_timeout",
                   type=float, default=0.0, metavar="HOURS",
                   help="level-5 runtime budget (0 = unlimited)")
    p.add_argument("-maintain-database", "--maintain-database",
                   dest="maintain_db", action="store_true",
                   help="vacuum old store revisions after the run (C7)")
    p.add_argument("-listing-file", "--listing-file", dest="listing_file",
                   default=None, help="also log to this file")
    p.add_argument("-log-level", "--log-level", dest="log_level",
                   default=None, choices=["debug", "info", "warning", "error"])
    p.add_argument("-verbose", "--verbose", action="store_true")
    p.add_argument("-version", "--version", action="version",
                   version="%(prog)s 1.0 (capabilities of linz-bde-uploader 2.11.1)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    level = (getattr(logging, args.log_level.upper()) if args.log_level
             else logging.INFO if args.verbose else logging.WARNING)
    handlers = [logging.StreamHandler()]
    if args.listing_file:
        handlers.append(logging.FileHandler(args.listing_file))
    logging.basicConfig(level=level, handlers=handlers,
                        format="%(asctime)s %(levelname)s %(message)s")
    # mutual exclusion (bin/linz_bde_uploader.pl:123-128)
    if args.full_incremental and args.rebuild:
        print("Cannot use -full-incremental and -rebuild together",
              file=sys.stderr)
        return 2
    if not any([args.full, args.incremental, args.full_incremental,
                args.rebuild, args.purge, args.remove_zombie, args.dry_run]):
        print("Nothing to do: pass -full, -incremental, -full-incremental, "
              "-rebuild, -purge or -remove-zombie", file=sys.stderr)
        return 2

    with open(args.tables_conf) as fh:
        tables = parse_tables_conf(fh.read())
    # P3 table subset/exclusion filters (lib/LINZ/BdeUpload.pm:385-405)
    if args.tables:
        keep = {t.lower() for t in args.tables}
        tables = [t for t in tables if t.name in keep or t.l5_change_table]
    if args.exclude_tables:
        drop = {t.lower() for t in args.exclude_tables}
        tables = [t for t in tables if t.name not in drop]

    ledger = Ledger(args.control)
    if args.remove_zombie:
        dead = ledger.remove_zombies()
        print(f"removed {len(dead)} zombie job(s)")
    if args.purge:
        n = ledger.purge_old_jobs()
        print(f"purged {n} old job(s)")
    if not any([args.full, args.incremental, args.full_incremental,
                args.rebuild, args.dry_run]):
        return 0

    spark = get_spark("linz-bde-uploader")
    store = TableStore(args.store)
    cfg = UploadConfig(enable_hooks=args.enable_hooks,
                       max_level0_runtime_hours=args.full_timeout,
                       max_level5_runtime_hours=args.inc_timeout,
                       override_locks=args.override_locks,
                       parallel_tables=args.parallel_tables)
    uploader = BdeUploader(
        spark, BdeRepository(args.repository), store, ledger, tables, cfg)
    if args.skip_postupload:
        uploader.post_upload_functions = []
        uploader.post_level0_functions = []
    try:
        results = uploader.apply_updates(
            level0=args.full, level5=args.incremental or args.rebuild,
            full_incremental=args.full_incremental, rebuild=args.rebuild,
            before=args.before, dry_run=args.dry_run)
    except RuntimeError as e:
        # single-job gate (C1): refuse cleanly, like the reference
        print(f"Upload not started: {e}", file=sys.stderr)
        return 1
    if args.maintain_db:
        for t in tables:
            if not t.l5_change_table and store.exists(t.name):
                store.vacuum(t.name, spark=spark)
    if not results:
        print("No dataset updates")  # idempotent re-run message (t:713-725)
    for r in results:
        s = r.stats
        detail = (f" I={s.ninsert} U={s.nupdate} 0={s.nnullupdate} D={s.ndelete}"
                  if s else "")
        msg = f" ({r.message})" if r.message else ""
        print(f"{r.status:8s} {r.table} dataset={r.dataset} level={r.level}{detail}{msg}")
    return 1 if any(r.status == "error" for r in results) else 0


if __name__ == "__main__":
    sys.exit(main())
