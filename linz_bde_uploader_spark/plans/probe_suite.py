"""Constant-only oracle probes: one-row diagnostic entries that pin
the driver gate's engine/fetch-path semantics, one construct each.

Round 7 burned six driver slots (and rounds 4-6 burned more) on
queries that were value-identical on both engines but rendered apart
in the driver's fetch path — and each red could only be diagnosed by
guessing, because a real query collapses many constructs into one
opaque hash. These probes invert that: each publishes a single
construct computed from CONSTANTS (no table data, no plan, nothing
else to blame), so a red row in CORRECTNESS_r{N}.json NAMES the
construct the driver's engines or fetch path disagree on, once, for
every future query. The k-hist bisection lesson generalized.

Expected pattern under the proven r7 root cause (the driver fetches
the DuckDB side through a pandas conversion; see ORACLE.md):

- ``probe_floor_div`` / ``probe_mod_sign`` / ``probe_weekday_locale``
  / ``probe_double_div`` GREEN — and a red names, respectively:
  native integer-division rounding drift (trunc vs floor), ``%``
  sign-semantics drift, JVM-locale weekday names, double-division
  repr drift.
- ``xfail_probe_hugeint_sum`` RED — an uncast SUM over integers is
  HUGEINT in DuckDB and degrades to float64 ('6.0' vs '6') in pandas.
- ``xfail_probe_decimal_trailing`` RED — DECIMAL(12,2) degrades to
  float64 ('123.40' -> '123.4').
- ``probe_nullable_int`` GREEN at the driver (measured r8), RED under
  the local ``--pandas`` emulation: the driver's pandas evidently
  preserves nullable ints (nullable Int64 dtype), while plain
  ``.df()`` degrades them to float64. The ban stays as documented
  PRECAUTIONARY conservatism (ORACLE.md), not a measured divergence.

Round-8 outcome: the battery ran once at the driver and did its job —
hugeint/decimal RED (bans load-bearing), the other five GREEN. From
round 9 only the two load-bearing canaries keep snapshot slots,
renamed with an ``xfail_`` prefix so a cold reader of
CORRECTNESS_r{N}.json sees the red rows are intentional; the five
answered probes stay here for the local check_oracle gate but no
longer spend driver slots (their answers are ORACLE.md doctrine). If
an xfail probe ever comes back GREEN, the driver moved to a
fetchall-like path and the HUGEINT/DECIMAL bans can be lifted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _const(spark: SparkSession, expr: str) -> DataFrame:
    return spark.range(1).select(F.expr(expr))


def probe_floor_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native integer division on a negative dividend: Spark ``DIV``
    truncates toward zero (-7 DIV 2 = -3); DuckDB ``//`` truncates in
    the local 1.0.0 build but has floored (-4) in other releases. A
    red here = the engines' native divisions disagree, and every
    quotient must go through functions/portable.floor_div_*.

    The dividend is parenthesized on both sides so the probe tests
    division semantics, not unary-minus precedence: an engine parsing
    ``-7 // 2`` as ``-(7 // 2)`` yields -3 under floored OR truncated
    division, false-greening exactly the drift probed for."""
    return _const(spark, "CAST((-7) DIV 2 AS BIGINT) AS q")


SQL_PROBE_FLOOR_DIV = "SELECT CAST((-7) // 2 AS BIGINT) AS q"


def probe_mod_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style sign-follows-dividend ``%`` (-7 % 2 = -1) — the
    primitive functions/portable.floor_div_* builds on. A red here
    invalidates the floor-div rewrite itself. Dividend parenthesized
    for the same precedence-independence reason as probe_floor_div
    (here ``-(7 % 2)`` happens to equal ``(-7) % 2``, but only under
    C-style %, which is the thing under test)."""
    return _const(spark, "CAST((-7) % 2 AS BIGINT) AS m")


SQL_PROBE_MOD_SIGN = "SELECT CAST((-7) % 2 AS BIGINT) AS m"


def probe_hugeint_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED RED. Publishes an UNCAST SUM over integers — BIGINT
    on Spark, HUGEINT on DuckDB. Green locally via fetchall (int 6
    both sides); red wherever the gate's fetch degrades HUGEINT to
    float64 ('6.0'). This single construct explained four rounds of
    events_json_props reds."""
    return spark.range(1).select(F.lit(6).cast("bigint").alias("s"))


SQL_PROBE_HUGEINT = "SELECT SUM(x) AS s FROM (VALUES (1), (2), (3)) t(x)"


def probe_decimal_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED RED. Publishes DECIMAL(12,2) with a trailing-zero
    cent digit: Decimal('123.40') renders '123.40' from fetchall but
    '123.4' after a pandas float64 conversion. The construct behind
    the q11_important_parts / cdc_minmax_refresh / events_cube r7
    reds (and the 3-rows-of-luck cdc_incremental_agg greens)."""
    return _const(spark, "CAST(123.40 AS DECIMAL(12,2)) AS d")


SQL_PROBE_DECIMAL = "SELECT CAST(123.40 AS DECIMAL(12,2)) AS d"


def probe_nullable_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED RED under the local ``--pandas`` emulation (plain
    ``.df()`` degrades a NULL-bearing int64 column to float64, '10.0'
    vs '10') but MEASURED GREEN at the driver in r8: its pandas
    preserves nullable ints (nullable Int64 dtype). The nullable-int
    ban on CUBE/ROLLUP keys and outer-join integers is therefore
    PRECAUTIONARY — the local gate is strictly more pessimistic than
    the driver here, which is the safe direction (ORACLE.md)."""
    return spark.sql(
        "SELECT CAST(id AS BIGINT) AS a,"
        " CAST(CASE WHEN id = 1 THEN 10 END AS BIGINT) AS k"
        " FROM range(1, 3)")


SQL_PROBE_NULLABLE = """
SELECT CAST(a AS BIGINT) AS a, CAST(k AS BIGINT) AS k
FROM (VALUES (1, 10), (2, NULL)) t(a, k)
"""


def probe_weekday_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-locale-sensitive weekday NAME (``date_format 'E'``) vs
    DuckDB's English-fixed ``%a``, on a constant date. A red names a
    non-English driver JVM locale — the events_cube r7 suspect that
    the pandas emulation ruled out locally."""
    return _const(spark,
                  "date_format(DATE '2026-01-05', 'E') AS wd")


SQL_PROBE_WEEKDAY = "SELECT strftime(DATE '2026-01-05', '%a') AS wd"


def probe_double_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE double division + shortest-round-trip repr (1/3): both
    engines must hand back the identical 64-bit double and the gate
    must render it identically. Pins the portability of the many
    CAST(... AS DOUBLE) result columns the green suites publish."""
    return _const(spark, "CAST(1 AS DOUBLE) / 3 AS x")


SQL_PROBE_DOUBLE = "SELECT CAST(1 AS DOUBLE) / 3 AS x"


# The two xfail_-prefixed keys are the standing driver canaries
# (EXPECTED RED by design — see module docstring); the plain probe_*
# keys are the answered diagnostics kept for the local gate only.
PROBE_QUERIES: dict[str, tuple] = {
    "xfail_probe_hugeint_sum": (probe_hugeint_sum, SQL_PROBE_HUGEINT),
    "xfail_probe_decimal_trailing": (
        probe_decimal_trailing, SQL_PROBE_DECIMAL),
    "probe_floor_div": (probe_floor_div, SQL_PROBE_FLOOR_DIV),
    "probe_mod_sign": (probe_mod_sign, SQL_PROBE_MOD_SIGN),
    "probe_nullable_int": (probe_nullable_int, SQL_PROBE_NULLABLE),
    "probe_weekday_locale": (probe_weekday_locale, SQL_PROBE_WEEKDAY),
    "probe_double_div": (probe_double_div, SQL_PROBE_DOUBLE),
}
