"""Timestamp-type-agnostic time helpers.

The driver's parquet fixtures have changed timestamp physical types
between rounds (int64 nanos -> TIMESTAMP_NTZ), and Spark 4 reads
parquet timestamps with ``isAdjustedToUTC=false`` as TIMESTAMP_NTZ
(``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true).
``unix_micros`` / ``unix_seconds`` only accept TIMESTAMP (LTZ), so
every epoch extraction in the repo goes through :func:`epoch_micros`,
which casts to TIMESTAMP first. With the session timezone pinned to
UTC (``session.py``, ``tests/conftest.py``, ``__spark_entry__.py``)
the NTZ->LTZ cast interprets the naive wall clock as UTC — exactly
what DuckDB's ``epoch_us(CAST(ts AS TIMESTAMP))`` does on the naive
oracle side. On an already-LTZ column the cast is a no-op Catalyst
folds away.

The cast happens in a projection (after filter pushdown), never in a
scan predicate, so parquet min/max pruning on the raw timestamp
column is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch for TIMESTAMP or TIMESTAMP_NTZ
    (NTZ wall clock read as UTC under the repo's pinned session tz)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds, microsecond precision, either type."""
    return epoch_micros(col) / F.lit(1_000_000.0)
