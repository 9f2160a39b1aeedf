"""Table registry: a tables.conf-compatible parser.

Reference format (conf/tables.conf:60-258; parser
lib/LINZ/BdeUpload.pm:125-200):

    TABLE crs_parcel_bndry key=audit_id row_tol=0.20,0.95 files pab1
    TABLE cbe_title_parcel_association l5_is_full key=id files ...
    TABLE <name> [level0] [level5] [l5_is_full] [key=<col>]
          [row_tol=<err>,<warn>] [column <name> <type>]* files <tag>...

Key column must be a unique, non-composite, NOT NULL integer/bigint
column (`bde_TableKeyIsValid`,
sql/02-bde_control_functions.sql.in:2839-2877).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TableDef:
    name: str
    key: str | None = None
    files: list[str] = field(default_factory=list)
    row_tol_error: float | None = None
    row_tol_warning: float | None = None
    levels: set[str] = field(default_factory=lambda: {"0", "5"})
    l5_is_full: bool = False
    l5_change_table: bool = False
    column_overrides: list[tuple[str, str]] = field(default_factory=list)
    # unique-constraint columns for J4 key-swap repair and the 'X'
    # action (the reference reads these from PG unique indexes; a file
    # registry declares them: unique=col1,col2)
    unique_cols: list[str] = field(default_factory=list)
    # maintained-view declaration (our extension, like unique=):
    # view=<g1>+<g2>:<value_col>[:minmax][:hll=<col>][:cms=<col>]
    #     [:topk=<k>][:distinct=<col>]
    # registers a <table>__agg (and optionally __minmax, a
    # distinct-count sketch __hll over <col>, a count-min frequency
    # sketch __cms over <col>, a per-group leaderboard __topk of the
    # value column, and/or an exact per-group count-distinct
    # __distinct over <col>) view the driver refreshes O(changes)
    # with every load (operators/view_refresh.py). Join views need a
    # dimension DataFrame and stay programmatic (UploadConfig.views).
    view_group_cols: list[str] = field(default_factory=list)
    view_value_col: str | None = None
    view_minmax: bool = False
    view_hll_key: str | None = None
    view_cms_key: str | None = None
    view_topk: int | None = None
    view_distinct_col: str | None = None


def parse_tables_conf(text: str) -> list[TableDef]:
    tables: list[TableDef] = []
    cur: TableDef | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        kw = toks[0].upper()
        if kw == "TABLE":
            cur = TableDef(name=toks[1].lower())
            # the table NAMED l5_change_table is the changeset source,
            # flag or not (lib/LINZ/BdeUpload.pm:172 keys on the name)
            if cur.name == "l5_change_table":
                cur.l5_change_table = True
            tables.append(cur)
            _parse_attrs(cur, toks[2:])
        elif cur is not None and kw == "COLUMN" and len(toks) >= 3:
            # explicit column override ("use with care", conf/tables.conf:50-53)
            cur.column_overrides.append((toks[1], toks[2]))
        elif cur is not None:
            _parse_attrs(cur, toks)
    return tables


def _parse_attrs(t: TableDef, toks: list[str]) -> None:
    i = 0
    explicit_levels: set[str] = set()
    while i < len(toks):
        tok = toks[i]
        low = tok.lower()
        if low.startswith("key="):
            t.key = tok.split("=", 1)[1].lower()
        elif low.startswith("row_tol="):
            parts = tok.split("=", 1)[1].split(",")
            t.row_tol_error = float(parts[0]) if parts[0] else None
            if len(parts) > 1 and parts[1]:
                t.row_tol_warning = float(parts[1])
        elif low == "files":
            # the file list runs to end of line, but tolerate attribute
            # tokens (key=/unique=/row_tol=) placed after it — they
            # must parse as attributes, not become phantom file tags
            rest = toks[i + 1:]
            t.files = [x.lower() for x in rest if "=" not in x]
            attrs = [x for x in rest if "=" in x]
            if attrs:
                _parse_attrs(t, attrs)
            break
        elif low.startswith("unique="):
            t.unique_cols = [c for c in tok.split("=", 1)[1].lower().split(",") if c]
        elif low.startswith("view="):
            parts = tok.split("=", 1)[1].lower().split(":")
            t.view_group_cols = [c for c in parts[0].split("+") if c]
            if len(parts) > 1 and parts[1]:
                t.view_value_col = parts[1]
            bad = None
            for flag in parts[2:]:
                if flag == "minmax":
                    t.view_minmax = True
                elif flag.startswith("hll=") and flag[4:]:
                    t.view_hll_key = flag[4:]
                elif flag.startswith("cms=") and flag[4:]:
                    t.view_cms_key = flag[4:]
                elif flag.startswith("topk=") and flag[5:].isdigit() \
                        and int(flag[5:]) >= 1:
                    t.view_topk = int(flag[5:])
                elif flag.startswith("distinct=") and flag[9:]:
                    t.view_distinct_col = flag[9:]
                else:
                    bad = flag
            if not t.view_group_cols or t.view_value_col is None \
                    or bad is not None:
                # fail at parse time, not as a silently-absent view
                raise ValueError(
                    f"{t.name}: view= needs <group>[+<group>]:"
                    f"<value_col>[:minmax][:hll=<col>][:cms=<col>]"
                    f"[:topk=<k>][:distinct=<col>], got {tok!r}")
        elif low == "l5_is_full":
            t.l5_is_full = True
        elif low == "l5_change_table":
            t.l5_change_table = True
        elif low == "level0":
            explicit_levels.add("0")
        elif low == "level5":
            explicit_levels.add("5")
        i += 1
    if explicit_levels:
        t.levels = explicit_levels


def validate_key(t: TableDef, schema_fields: dict[str, str]) -> None:
    """`bde_TableKeyIsValid` semantics
    (sql/02-bde_control_functions.sql.in:2839-2877): key must exist and
    be an integer/bigint column."""
    if t.key is None:
        raise ValueError(f"{t.name}: no key column configured")
    typ = schema_fields.get(t.key.lower())
    if typ is None:
        raise ValueError(f"{t.name}: key column {t.key} not in schema")
    if typ.lower().split("(")[0] not in ("int", "integer", "bigint", "serial", "smallint"):
        raise ValueError(f"{t.name}: key column {t.key} has non-integer type {typ}")
