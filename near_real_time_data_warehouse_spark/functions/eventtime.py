"""Type-agnostic event-time access for the ``events`` table.

The driver's testdata has stored ``events.ts`` two different ways across
rounds: parquet TIMESTAMP(NANOS) — which Spark can only read as int64
nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong`` — and plain
``timestamp[us]``, which Spark reads natively as TIMESTAMP_NTZ. Every
event operator does *integer epoch-microsecond* arithmetic (exact, and
independent of session timezone), so all readers normalize here instead
of assuming a physical type.

The NTZ branch deliberately avoids ``cast(ts as timestamp)`` /
``to_utc_timestamp``: both interpret the naive value in the *session*
timezone, so a non-UTC driver session would shift every epoch by the
zone offset. ``timestampdiff`` between two NTZ values is pure field
arithmetic — verified to equal DuckDB's ``epoch_us(ts)`` bit-exactly
under a non-UTC session.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH_US = "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"


def _ts_dtype(df: DataFrame) -> str:
    for name, dtype in df.dtypes:
        if name == "ts":
            return dtype
    raise ValueError("events DataFrame has no 'ts' column")


def us_expr(df: DataFrame) -> Column:
    """Epoch microseconds of ``ts`` as a long, whatever the storage type."""
    t = _ts_dtype(df)
    if t == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
        return F.expr("ts div 1000")
    if t == "timestamp_ntz":
        return F.expr(_NTZ_EPOCH_US)
    return F.unix_micros(F.col("ts"))  # tz-aware: already an instant


def event_time_expr(df: DataFrame) -> Column:
    """``ts`` as a proper TIMESTAMP (instant) column for watermarks/
    windows — derived from the epoch so it is session-tz-independent and
    always consistent with ``us_expr`` bucketing."""
    t = _ts_dtype(df)
    if t == "timestamp":
        return F.col("ts")
    return F.timestamp_micros(us_expr(df))
