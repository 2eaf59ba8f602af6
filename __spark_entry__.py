"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline surface) as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-equivalent SQL for each hash-checkable query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _load_registry():
    # importing the modules populates the central registry
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    queries_map, _ = _load_registry()
    return queries_map["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries_map, _ = _load_registry()
    return dict(queries_map)


def oracle_sql() -> dict[str, str]:
    _, oracles = _load_registry()
    return dict(oracles)
