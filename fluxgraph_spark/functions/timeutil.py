"""Timezone-independent timestamp helpers.

The driver's parquet stores naive ``timestamp[us]`` values, which Spark 4
reads as ``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults to true).  ``F.unix_micros`` rejects NTZ, and casting NTZ ->
TIMESTAMP_LTZ shifts by the *session* timezone — wrong under any session
tz the caller (or the correctness driver) happens to use.

``ts_us`` extracts epoch microseconds as pure wall-clock arithmetic
(``timestamp_diff`` from an NTZ epoch literal), matching DuckDB's
``epoch_us`` on the same naive parquet values bit-for-bit regardless of
session timezone.  All engine code goes through these helpers instead of
``unix_micros``/``cast('timestamp')``.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ_SQL = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def ts_ntz(col: "Column | str") -> Column:
    """Normalize a timestamp column to TIMESTAMP_NTZ (wall clock).

    NTZ -> NTZ is a no-op; LTZ -> NTZ renders in the session tz (engine
    sessions pin spark.sql.session.timeZone=UTC, so internal LTZ columns
    round-trip unchanged)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def ts_us(col: "Column | str") -> Column:
    """Epoch microseconds (BIGINT) from any timestamp flavor,
    session-timezone-independent.  Equals DuckDB ``epoch_us(ts)`` on
    naive parquet timestamps."""
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ_SQL), ts_ntz(col))


def lit_ntz(dt: datetime.datetime) -> Column:
    """A wall-clock (NTZ) timestamp literal — comparisons against NTZ
    data columns never consult the session timezone."""
    return F.expr(f"TIMESTAMP_NTZ'{dt.strftime('%Y-%m-%d %H:%M:%S.%f')}'")


def us_ts(col: "Column | str") -> Column:
    """Inverse of ts_us: epoch microseconds -> TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", c.cast("long"), F.expr(_EPOCH_NTZ_SQL))
