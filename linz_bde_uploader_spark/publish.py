"""CLI analog of ``bin/linz-bde-uploader-schema-publish.pl``: publish
the control-table ledger as a subscribable snapshot set.

  python -m linz_bde_uploader_spark.publish \\
      --control /path/to/control --out /path/to/publications \\
      [--name all_bde_control] [--jdbc-url jdbc:postgresql://...]

Mirrors the reference's behavior: create-if-missing publication,
idempotent ADD TABLE of newly-discovered control tables, non-zero
exit + error message when the control area is uninitialized
(reference :64-68 raises 'Schema bde_control does not exist').
"""

from __future__ import annotations

import argparse
import sys

from linz_bde_uploader_spark.control.ledger import Ledger
from linz_bde_uploader_spark.control.publication import (
    PUBLICATION_NAME, ControlPublication, PublicationError,
)
from linz_bde_uploader_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="linz-bde-uploader-schema-publish")
    p.add_argument("--control", required=True,
                   help="control ledger directory")
    p.add_argument("--out", required=True,
                   help="publication root directory")
    p.add_argument("--name", default=PUBLICATION_NAME)
    p.add_argument("--jdbc-url", default=None,
                   help="optionally also replicate into this database")
    p.add_argument("--jdbc-user", default="bde_dba")
    p.add_argument("--jdbc-password", default="")
    args = p.parse_args(argv)

    jdbc = None
    if args.jdbc_url:
        from linz_bde_uploader_spark.sources.jdbc import JdbcTarget
        jdbc = JdbcTarget(url=args.jdbc_url, user=args.jdbc_user,
                          password=args.jdbc_password)
    spark = get_spark("schema-publish")
    pub = ControlPublication(args.out, name=args.name)
    try:
        result = pub.publish(spark, Ledger(args.control), jdbc=jdbc)
    except PublicationError as e:
        print(e, file=sys.stderr)
        return 1
    added = ", ".join(result["added"]) or "none"
    print(f'Publication "{result["publication"]}" ready '
          f'(publish #{result["n_publish"]}; tables: '
          f'{", ".join(result["tables"])}; added: {added})')
    return 0


if __name__ == "__main__":
    sys.exit(main())
