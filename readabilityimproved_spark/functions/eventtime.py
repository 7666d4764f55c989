"""Event-time epoch-microsecond helpers shared by the temporal joins
(operators/relational.py) and the streaming batch twins
(streaming/stream.py) — one copy of a subtle timezone-sensitive idiom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_epoch_micros(col: str) -> Column:
    """Wall-clock microseconds since epoch of a TIMESTAMP_NTZ column
    (or of an LTZ column's session-local wall time), via timestampdiff
    on TIMESTAMP_NTZ. For NTZ inputs the value is session-timezone
    independent; parquet timestamps carry us precision, so second-
    truncated arithmetic would misplace events within 1 s of a
    boundary. NOTE: for LTZ inputs this is the session's WALL clock —
    non-monotonic across a DST fall-back — so ordering/binning LTZ
    columns must use :func:`epoch_micros` instead, which maps LTZ to
    the true instant.

    ``col`` is a SIMPLE column name (it is backtick-quoted, so names
    with SQL-significant characters like ``t-0`` work; a dotted struct
    path would be quoted whole and not resolve — project the field to a
    top-level column first)."""
    quoted = "`" + col.replace("`", "``") + "`"
    return F.expr(
        f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, CAST({quoted} AS TIMESTAMP_NTZ))"
    )


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Type-aware epoch micros, monotonic in event order for BOTH
    timestamp flavors: TIMESTAMP (LTZ) maps to the true instant
    (``unix_micros`` — immune to DST wall-clock repeats), TIMESTAMP_NTZ
    to its wall-clock micros (monotonic by definition, and independent
    of the session timezone). Anything else raises."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return ntz_epoch_micros(col)
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"column {col!r} must be TIMESTAMP or TIMESTAMP_NTZ, got {dt}"
    )
