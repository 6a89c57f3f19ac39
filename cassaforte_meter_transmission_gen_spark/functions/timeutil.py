"""Time-grain scalar functions (reference F1-F4, core.clj:48-66).

The reference floors Joda DateTimes field-by-field; in Spark each is a
single built-in ``date_trunc`` — JVM-side, codegen'd, usable as a
grouping key with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_to_min(ts: Column) -> Column:
    """Floor to minute (core.clj:48-51)."""
    return F.date_trunc("minute", ts)


def trunc_to_hour(ts: Column) -> Column:
    """Floor to hour (core.clj:53-56)."""
    return F.date_trunc("hour", ts)


def trunc_to_day(ts: Column) -> Column:
    """Floor to day (core.clj:58-61)."""
    return F.date_trunc("day", ts)


GRAIN_TRUNC = {
    "second": lambda c: F.date_trunc("second", c),
    "minute": trunc_to_min,
    "hour": trunc_to_hour,
    "day": trunc_to_day,
}


def hhmmss(ts: Column) -> Column:
    """Format as ``HH:mm:ss z`` in UTC (core.clj:63-66). The session is
    pinned to UTC (session.py) so ``z`` renders UTC like the reference."""
    return F.date_format(ts, "HH:mm:ss z")
