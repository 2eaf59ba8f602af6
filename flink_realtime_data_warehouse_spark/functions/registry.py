"""SQL-visible function registry (§2.8 surface).

The reference has no SQL UDF registry (everything is inline anonymous
classes — SURVEY.md §2.8); our engine exposes its Python-side
functions to Spark SQL so users can call them from plain SQL over the
registered views.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import LongType


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register engine UDFs into the session's SQL namespace.

    Returns the registered names. Built-in expressions stay built-in —
    only genuinely-Python functions go through here.
    """
    from flink_realtime_data_warehouse_spark.functions.text import lang_id

    spark.udf.register("frdw_lang_id", lang_id)

    def _bounce_window_bucket(ts_ms: int) -> int:
        # example scalar helper: CEP window bucket for a millis timestamp
        return int(ts_ms // 10_000) if ts_ms is not None else None

    spark.udf.register("frdw_bounce_bucket", _bounce_window_bucket, LongType())
    return ["frdw_lang_id", "frdw_bounce_bucket"]
