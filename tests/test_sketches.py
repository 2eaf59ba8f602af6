"""Approximate sketch sanity: estimates must track exact values, and
the registered query's verdict columns must all be true (that is the
property the trivial all-true DuckDB oracle hashes against)."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.functions_surface import (
    sketch_approx_distinct,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def test_approx_sketches_track_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 1000)
            .cast("double")
            .alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(a["approx_p50"] - e["p50"]) / e["p50"] < 0.05


def test_sketch_checked_query_all_verdicts_true(spark, sf_dir):
    rows = sketch_approx_distinct(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["parts_ok"] and r["supps_ok"] and r["p50_ok"], str(r)
        assert r["exact_parts"] > 0 and r["exact_supps"] > 0
