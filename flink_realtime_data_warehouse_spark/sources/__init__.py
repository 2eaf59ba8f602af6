from flink_realtime_data_warehouse_spark.sources.tables import TABLES, load_tables  # noqa: F401
