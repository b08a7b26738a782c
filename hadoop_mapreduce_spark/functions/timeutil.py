"""Session-timezone-proof wall-clock arithmetic.

The engine's timestamp contract (``sources.tables._normalize_ntz``):
every loaded timestamp column is TIMESTAMP_NTZ — civil time exactly as
stored in the parquet file, the same view DuckDB's naive TIMESTAMP takes.

That contract only pays off if no downstream expression routes through
the session timezone again. The classic trap is
``unix_micros(ntz_col.cast("timestamp"))``: the NTZ→LTZ cast interprets
the wall clock in ``spark.sql.session.timeZone`` — correct under the
repo's pinned-UTC sessions, silently shifted under the caller-owned
driver session (observed: CORRECTNESS_r07 hash mismatch; reproduced by
tools/tz_parity.py on 6 queries). The helpers here stay inside pure NTZ
integer arithmetic, valid under ANY session timezone:

* ``wall_epoch_us(c)``  — microseconds since 1970-01-01 00:00:00 (wall),
  == DuckDB ``epoch_us(ts)``.
* ``wall_epoch_secs(c)`` — whole seconds (floored), == DuckDB
  ``epoch(ts)::BIGINT`` for post-1970 data and == the truncation Spark's
  ``unix_timestamp`` applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL literal for the NTZ epoch — usable inside F.expr strings.
EPOCH_NTZ_SQL = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _epoch_ntz() -> Column:
    return F.expr(EPOCH_NTZ_SQL)


def wall_epoch_us(c: Column | str) -> Column:
    """Wall-clock microseconds since epoch for a TIMESTAMP_NTZ column.

    ``timestamp_diff`` between two NTZ values is pure integer
    arithmetic — no session-timezone resolution anywhere in the plan.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), col)


def wall_epoch_secs(c: Column | str) -> Column:
    """Whole wall-clock seconds since epoch (floored; fixtures are all
    post-1970 so truncating DIV == floor)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff("SECOND", _epoch_ntz(), col)
