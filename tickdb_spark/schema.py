"""Canonical tick schema + time helpers.

Reference data model: ``Point{Timestamp int64 /*ns*/, Value map[string]float64}``
(``storage/point.go:8-11``) inside one file per index (``database.go:49-69``).
Spark-first remodel: ONE table for all series, with the series name as a
partition-friendly column — a table-per-series layout is a small-files
anti-pattern at 100 TB, while ``partitionBy(series, date)`` gives the same
pruning the reference gets from its file-per-index + time-tree descent.

``ts`` stays authoritative BIGINT nanoseconds (Spark TimestampType is
µs-only); ``ts_utc`` is the derived µs timestamp used for calendar ops.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NS_PER_US = 1_000
NS_PER_SECOND = 1_000_000_000

#: Canonical tick table: the reference's open per-point field map
#: (schemaless, ``storage/point.go:8-11``) becomes a MapType column.
TICKS_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),  # epoch nanoseconds
        T.StructField("ts_utc", T.TimestampType(), True),  # derived, µs
        T.StructField("value", T.MapType(T.StringType(), T.DoubleType()), True),
        # Monotone per-batch sequence for last-write-wins upsert semantics
        # (reference replaces the whole value map on duplicate ts,
        # ``storage/node.go:235-237``).
        T.StructField("ingest_seq", T.LongType(), False),
    ]
)

#: Ingest document shape, mirroring the reference's HTTP POST body
#: ``PostData{Time, Index, Value}`` (``database.go:24-28``).
POST_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType(), False),
        T.StructField("index", T.StringType(), False),
        T.StructField("value", T.MapType(T.StringType(), T.DoubleType()), False),
    ]
)

# Calendar granularities the reference supports (levels in
# ``storage/node.go:8-24``; parse table ``query.go:20-59``). "second" is
# listed because we fix quirk B5 (reference maps seconds to minutes).
GRANULARITIES = ("second", "minute", "hour", "day", "month", "year")


def ns_to_ts(col: Column) -> Column:
    """BIGINT epoch-ns → TimestampType (µs truncation)."""
    return F.timestamp_micros((col / NS_PER_US).cast("long"))


def ts_to_ns(col: Column) -> Column:
    """TimestampType → BIGINT epoch-ns (µs-precise)."""
    return F.unix_micros(col) * NS_PER_US


def parse_time_ns(s: str | int | _dt.datetime) -> int:
    """Parse a time spec to epoch nanoseconds.

    Accepts epoch-ns ints, datetimes, and RFC3339-ish strings — the same
    surface the reference accepts via ``seriesly/timelib.ParseTime``
    (``database.go:79``, ``handlers.go:101``).
    """
    if isinstance(s, int):
        return s
    if isinstance(s, _dt.datetime):
        dt = s
    else:
        text = str(s).strip()
        if text.lstrip("-").isdigit():
            return int(text)
        dt = _dt.datetime.fromisoformat(text.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    delta = dt - epoch
    return (delta.days * 86_400 + delta.seconds) * NS_PER_SECOND + delta.microseconds * NS_PER_US
