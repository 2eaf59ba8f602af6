from flink_realtime_data_warehouse_spark.functions.timeutil import (  # noqa: F401
    millis_to_ntz,
    ntz_to_millis,
    to_date_str,
    to_ts,
    to_ymd_hms,
)
