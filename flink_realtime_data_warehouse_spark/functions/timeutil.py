"""Time/date scalar functions (reference F1-F3).

The reference converts epoch-millis ↔ date strings at a *fixed* UTC+8
offset (reference utils/DateFormatUtil.java:10-38; the explicit
``ZoneOffset.ofHours(8)`` is at :21 — no DST, not a zone lookup).

We reproduce that with session-timezone-independent arithmetic: build a
TIMESTAMP_NTZ by adding a millisecond interval to the NTZ epoch, shifted
by the fixed offset. ``date_format`` / ``timestamp_diff`` on NTZ values
never consult the session timezone, so these functions return identical
results under any Spark session configuration — important because the
driver runs our queries in its own session.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed offset matching DateFormatUtil.java:21
SHANGHAI_OFFSET_MILLIS = 8 * 3600 * 1000

def _ntz_epoch() -> Column:
    # built lazily — F.expr needs an active SparkContext
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def millis_to_ntz(millis: Column, offset_millis: int = 0) -> Column:
    """epoch millis (bigint) → TIMESTAMP_NTZ wall clock at the given fixed offset.

    All-integer arithmetic (timestamp_add) so no precision is lost."""
    shifted = (millis + F.lit(offset_millis)).cast("bigint")
    return F.timestamp_add("MILLISECOND", shifted, _ntz_epoch())


def ntz_to_millis(ts_ntz: Column, offset_millis: int = 0) -> Column:
    """TIMESTAMP_NTZ wall clock at a fixed offset → epoch millis (bigint)."""
    micros = F.timestamp_diff("MICROSECOND", _ntz_epoch(), ts_ntz)
    return (micros / F.lit(1000)).cast("bigint") - F.lit(offset_millis)


def to_date_str(millis: Column, offset_millis: int = SHANGHAI_OFFSET_MILLIS) -> Column:
    """F1 ``toDate``: epoch millis → 'yyyy-MM-dd' at fixed +8 (DateFormatUtil.java:28-32)."""
    return F.date_format(millis_to_ntz(millis, offset_millis), "yyyy-MM-dd")


def to_ymd_hms(millis: Column, offset_millis: int = SHANGHAI_OFFSET_MILLIS) -> Column:
    """F2 ``toYmdHms``: epoch millis → 'yyyy-MM-dd HH:mm:ss' (DateFormatUtil.java:34-38)."""
    return F.date_format(millis_to_ntz(millis, offset_millis), "yyyy-MM-dd HH:mm:ss")


def to_ts(
    dt_str: Column, is_full: bool = False, offset_millis: int = SHANGHAI_OFFSET_MILLIS
) -> Column:
    """F3 ``toTs``: date(-time) string at fixed +8 → epoch millis (DateFormatUtil.java:13-26)."""
    fmt = "yyyy-MM-dd HH:mm:ss" if is_full else "yyyy-MM-dd"
    ntz = F.to_timestamp_ntz(dt_str, F.lit(fmt))
    return ntz_to_millis(ntz, offset_millis)
