"""SQL-facing surface: registered UDFs callable from spark.sql, and the
null-semantics edge cases a warehouse engine must honor."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.functions.registry import register_sql_functions
from flink_realtime_data_warehouse_spark.sources.tables import load_tables


def test_registered_udfs_callable_from_sql(spark):
    names = register_sql_functions(spark)
    assert set(names) == {"frdw_lang_id", "frdw_bounce_bucket"}
    row = spark.sql(
        "SELECT frdw_lang_id('the cat and the hat is in the bag') AS lang, "
        "frdw_bounce_bucket(25000) AS bucket"
    ).first()
    assert row["lang"] == "en"
    assert row["bucket"] == 2


def test_sql_over_registered_views(spark, sf_dir):
    load_tables(spark, sf_dir, ["orders", "customer"])
    got = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    ).collect()
    assert len(got) == 5
    assert all(r["n"] > 0 for r in got)


def test_null_join_and_agg_semantics(spark):
    """Null keys never match in equi-joins; aggregates skip nulls;
    count(*) counts them; null-safe equality (<=>) matches them."""
    left = spark.createDataFrame([(1, "a"), (None, "b"), (2, "c")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x"), (None, "y")], ["k", "rv"])

    inner = left.join(right, "k").collect()
    assert [(r["k"], r["lv"], r["rv"]) for r in inner] == [(1, "a", "x")]

    nullsafe = left.join(right, left["k"].eqNullSafe(right["k"])).count()
    assert nullsafe == 2  # 1=1 and null<=>null

    vals = spark.createDataFrame([(1.0,), (None,), (3.0,)], ["x"])
    agg = vals.agg(
        F.count("*").alias("n_rows"),
        F.count("x").alias("n_vals"),
        F.sum("x").alias("s"),
        F.avg("x").alias("m"),
    ).first()
    assert (agg["n_rows"], agg["n_vals"], agg["s"], agg["m"]) == (3, 2, 4.0, 2.0)


def test_empty_result_queries_are_clean(spark, sf_dir):
    """Empty results keep schema and hash-compare cleanly (driver edge)."""
    t = load_tables(spark, sf_dir, ["orders"], register=False)
    empty = t["orders"].filter(F.col("o_totalprice") < -1)
    assert empty.count() == 0
    assert empty.columns[:2] == ["o_orderkey", "o_custkey"]


def test_registry_queries_runnable_via_sql_with_oracle_hashes(spark, sf_dir):
    """VERDICT r3 #6: registry queries registered as temp views must be
    runnable through spark.sql by name and hash-match the SAME DuckDB
    oracles as their DataFrame form."""
    import __spark_entry__ as entrymod
    from flink_realtime_data_warehouse_spark.plans.sql_views import (
        register_base_views,
        register_query_views,
    )
    from tests.oracle_utils import compare_query_to_oracle

    oracles = entrymod.oracle_sql()
    names = [
        "q1_pricing_summary",
        "agg_cube_orders",
        "text_stats",
        "fn_json_access",
    ]
    register_base_views(spark, sf_dir)
    register_query_views(spark, sf_dir, names)
    for name in names:
        df = spark.sql(f"SELECT * FROM {name}")
        compare_query_to_oracle(df, oracles[name], sf_dir)


def test_query_views_compose_with_base_tables_in_sql(spark, sf_dir):
    """A registry view joins against a base view in one SQL statement —
    the analytics layer and the raw tables share a catalog."""
    from flink_realtime_data_warehouse_spark.plans.sql_views import (
        register_base_views,
        register_query_views,
    )

    register_base_views(spark, sf_dir)
    register_query_views(spark, sf_dir, ["st2_daily_unique_visitors"])
    got = spark.sql(
        """
        SELECT v.dt, count(DISTINCT v.user_id) AS uv,
               count(DISTINCT e.event_type) AS n_types
        FROM st2_daily_unique_visitors v
        JOIN events e ON to_date(e.ts) = v.dt
        GROUP BY v.dt ORDER BY v.dt
        """
    ).collect()
    assert len(got) >= 1
    assert all(r["uv"] > 0 and r["n_types"] > 0 for r in got)


def test_register_query_views_rejects_unknown_name(spark, sf_dir):
    import pytest

    from flink_realtime_data_warehouse_spark.plans.sql_views import (
        register_query_views,
    )

    with pytest.raises(KeyError, match="unknown registry query"):
        register_query_views(spark, sf_dir, ["no_such_query"])
