"""X2 hook blocks: configurable statement lists run at connect /
dataset-start / dataset-end / upload-complete, with ``{id}``
placeholder substitution and the conditional DSL of
``db_upload_complete_sql``.

Reference semantics (lib/LINZ/BdeDatabase.pm:571-636):
- hook text is split on ';' into statements;
- each statement may be prefixed by a condition of the form

    if [any|all] [level0|level0_dataset] <table>... [loaded|affected] ?

  evaluated via bde_TablesAffected
  (sql/02-bde_control_functions.sql.in:2722-2836);
- `{id}` is replaced by the job id before execution.

Statements here are executed through a caller-supplied runner (by
default ``spark.sql``), so hooks can run real Spark SQL against the
registered metadata views.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from linz_bde_uploader_spark.control.ledger import Ledger

_COND_RE = re.compile(
    r"^\s*if\s+(?:(any|all)\s+)?(?:(level0|level0_dataset)\s+)?"
    r"(?P<tables>(?:\w+\s+)+?)(loaded|affected)\s+\?\s*(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class HookStatement:
    sql: str
    quantifier: str = "all"       # any | all
    level0_only: bool = False
    tables: list[str] | None = None
    test: str = "loaded"          # loaded | affected


def parse_hook_block(text: str) -> list[HookStatement]:
    """Split a hook block on ';' and parse the optional condition
    prefix of each statement."""
    out = []
    for raw in text.split(";"):
        stmt = raw.strip()
        if not stmt:
            continue
        m = _COND_RE.match(stmt)
        if m:
            out.append(HookStatement(
                sql=m.group("rest").strip(),
                quantifier=(m.group(1) or "all").lower(),
                level0_only=m.group(2) is not None,
                tables=[t.lower() for t in m.group("tables").split()],
                test=m.group(4).lower(),
            ))
        else:
            out.append(HookStatement(sql=stmt))
    return out


def condition_holds(stmt: HookStatement, ledger: Ledger, job_id: int,
                    level0_ran: bool = True) -> bool:
    """Evaluate a statement's condition against the stats ledger
    (bde_TablesAffected semantics)."""
    if stmt.tables is None:
        return True
    if stmt.level0_only and not level0_ran:
        return False
    hits = [ledger.tables_affected(job_id, [t], stmt.test) for t in stmt.tables]
    return any(hits) if stmt.quantifier == "any" else all(hits)


def run_hook_block(text: str, runner, ledger: Ledger, job_id: int,
                   level0_ran: bool = True) -> list[str]:
    """Parse, filter by condition, substitute {id}, and execute each
    statement via ``runner(sql)``. Returns the executed SQL list."""
    executed = []
    for stmt in parse_hook_block(text):
        if not stmt.sql:
            continue
        if not condition_holds(stmt, ledger, job_id, level0_ran):
            continue
        final = stmt.sql.replace("{id}", str(job_id))
        runner(final)
        executed.append(final)
    return executed
