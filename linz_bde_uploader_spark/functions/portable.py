"""Engine-portable integer arithmetic for oracle twins.

The correctness gate hashes a Spark result against a DuckDB oracle,
so every published expression must render identically on both
engines — under EVERY fetch path the gate might take (see ORACLE.md).
Two constructs are banned from published columns:

- **engine-native integer division on possibly-negative operands**:
  Spark ``DIV`` truncates toward zero; DuckDB ``//`` truncates in
  some builds and floors in others. ``floor_div_spark`` /
  ``floor_div_duck`` render FLOOR division on both engines by
  subtracting the positive remainder first: ``a - ((a % b) + b) % b``
  is exactly divisible by ``b``, and for an exact quotient floor ==
  trunc == the quotient, so any build's division operator agrees.
  Both engines use C-style sign-follows-dividend ``%`` (verified:
  ``-7 % 2 = -1`` on Spark and DuckDB), which the probe battery in
  plans/probe_suite.py keeps pinned.

- **HUGEINT / DECIMAL result columns**: DuckDB's uncast ``SUM`` over
  integers is HUGEINT and decimal aggregates stay DECIMAL(p,s);
  a pandas-path fetch degrades both to float64 (``3`` -> ``'3.0'``,
  ``123.40`` -> ``'123.4'``) while Spark publishes int/Decimal.
  Published columns must be CAST to BIGINT (integer units: cents,
  milli, micro) or DOUBLE. ``scripts/audit_oracle_types.py``
  enforces this mechanically.
"""

from __future__ import annotations


def floor_div_spark(a: str, b: str) -> str:
    """Spark SQL fragment: floor(a / b) for integer expressions,
    engine-pinned (exact division after %-subtraction)."""
    return f"(({a}) - ((({a}) % ({b})) + ({b})) % ({b})) DIV ({b})"


def floor_div_duck(a: str, b: str) -> str:
    """DuckDB SQL fragment: floor(a / b) for integer expressions,
    engine-pinned (exact division after %-subtraction)."""
    return f"(({a}) - ((({a}) % ({b})) + ({b})) % ({b})) // ({b})"
