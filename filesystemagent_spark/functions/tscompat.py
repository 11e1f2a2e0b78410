"""Timestamp-type-agnostic epoch math.

Parquet written by pandas/pyarrow carries `isAdjustedToUTC=false`, so
Spark 4 reads it as TIMESTAMP_NTZ; Spark-written parquet (and
`createDataFrame` from Python datetimes) yields TIMESTAMP_LTZ. Epoch
builtins are split across the two types — `unix_micros` rejects NTZ,
`cast(double)` rejects NTZ, `timestampdiff` rejects nothing — so every
operator that does epoch arithmetic must go through one helper that
accepts either type.

The trick: `cast("timestamp")` is a no-op on LTZ and converts NTZ via
the session timezone, which this engine pins to UTC (session.py,
Catalog.__init__) — making the conversion the identity on the naive
value and keeping epoch math deterministic under any driver session.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_micros(ts: Column | str) -> Column:
    """Microseconds since epoch as LONG — exact, for gap/session math."""
    return F.unix_micros(_c(ts).cast("timestamp"))


def epoch_seconds(ts: Column | str) -> Column:
    """Seconds since epoch as DOUBLE with microsecond precision.
    (Integer micros are exactly representable in a double through
    2255 CE; the division is a single exact scale.)"""
    return epoch_micros(ts) / F.lit(1_000_000.0)


def epoch_whole_seconds(ts: Column | str) -> Column:
    """Seconds since epoch as LONG, truncated — for bucket floors."""
    return F.floor(epoch_micros(ts) / F.lit(1_000_000))
