from flink_realtime_data_warehouse_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)
