"""Scale mechanics: bucketed joins skip the shuffle; salting preserves
semantics while splitting hot keys."""

import pytest

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.scale import (
    salted_agg,
    salted_join,
    write_bucketed,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse dir is static config; bucketed tables land in the default
    # ./spark-warehouse (gitignored) and are dropped at the end
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], n_buckets=8)

    joined = (
        spark.table("lineitem_b")
        .join(
            spark.table("orders_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _physical_plan(joined)
    # co-located bucketed join: no exchange feeding the join (the only
    # allowed exchange is the final single-partition/groupBy one)
    assert "SortMergeJoin" in plan, plan[:800]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # and the result matches the plain join
    expected = {
        (r["o_orderpriority"], round(r["q"], 2))
        for r in lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    got = {(r["o_orderpriority"], round(r["q"], 2)) for r in joined.collect()}
    assert got == expected
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        (r["l_returnflag"]): (round(r["s"], 2), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_quantity").alias("c"))
        .collect()
    }
    salted = salted_agg(li, ["l_returnflag"], {"l_quantity": "sum"}, n_salts=8)
    got = {r["l_returnflag"]: round(r["sum_l_quantity"], 2) for r in salted.collect()}
    assert got == {k: v[0] for k, v in direct.items()}


def test_salted_join_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    direct = li.join(ords, "okey").count()
    salted = salted_join(li, ords, "okey", n_salts=4).count()
    assert salted == direct

def test_compact_parquet_dir_preserves_content(spark, tmp_path):
    from flink_realtime_data_warehouse_spark.operators.scale import compact_parquet_dir

    path = str(tmp_path / "many")
    # 20 tiny files
    spark.range(0, 2000).withColumn("v", F.col("id") * 2).repartition(20).write.parquet(path)
    before_rows = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    n_before, n_after = compact_parquet_dir(spark, path, target_rows_per_file=1000)
    assert n_before >= 20 and n_after == 2
    after_rows = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert after_rows == before_rows


def test_bucketed_table_gc_removes_dead_stamps(spark, sf_dir):
    """Stamps from previous sessions (present on disk, absent from the
    live catalog) are GC'd when a new bucketed table is created; live
    stamps keep their files (same fix class as the ANN stale-index GC)."""
    import os
    import shutil

    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _warehouse_root,
    )
    from flink_realtime_data_warehouse_spark.plans.functions_surface import (
        _bucketed_table,
    )

    root = _warehouse_root(spark)
    dead = os.path.join(root, "bkt_lineitem_deadbeef")
    os.makedirs(dead, exist_ok=True)
    try:
        live = _bucketed_table(
            spark, sf_dir, "lineitem", "l_orderkey", ["l_orderkey"], n_buckets=4
        )
        # force the create branch even if the live table pre-existed
        if os.path.isdir(dead):
            spark.sql(f"DROP TABLE IF EXISTS {live}")
            live = _bucketed_table(
                spark, sf_dir, "lineitem", "l_orderkey", ["l_orderkey"], n_buckets=4
            )
        assert not os.path.isdir(dead)
        assert os.path.isdir(os.path.join(root, live))
    finally:
        shutil.rmtree(dead, ignore_errors=True)
