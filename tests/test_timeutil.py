"""F1-F3 date function semantics (reference DateFormatUtil.java:10-38)."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.functions.timeutil import (
    to_date_str,
    to_ts,
    to_ymd_hms,
)


def test_to_date_and_ymd_hms_at_plus8(spark):
    # 2022-07-26 00:30:00 UTC == 2022-07-26 08:30:00 at +8
    millis = 1658795400000
    df = spark.range(1).select(
        to_date_str(F.lit(millis)).alias("d"),
        to_ymd_hms(F.lit(millis)).alias("dt"),
    )
    row = df.first()
    assert row["d"] == "2022-07-26"
    assert row["dt"] == "2022-07-26 08:30:00"


def test_midnight_boundary_shifts_date(spark):
    # 2022-07-26 17:00:00 UTC == 2022-07-27 01:00:00 at +8 → next day
    millis = 1658854800000
    assert spark.range(1).select(to_date_str(F.lit(millis))).first()[0] == "2022-07-27"


def test_to_ts_roundtrip(spark):
    df = spark.range(1).select(
        to_ts(F.lit("2022-07-26 08:30:00"), is_full=True).alias("full"),
        to_ts(F.lit("2022-07-26")).alias("date_only"),
    )
    row = df.first()
    assert row["full"] == 1658795400000
    # midnight at +8 == previous-day 16:00 UTC
    assert row["date_only"] == 1658795400000 - (8 * 3600 + 30 * 60) * 1000


def test_session_tz_independence(spark):
    """The functions must not consult the session timezone."""
    millis = 1658795400000
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Shanghai"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert spark.range(1).select(to_date_str(F.lit(millis))).first()[0] == "2022-07-26"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
