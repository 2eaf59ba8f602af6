"""Approximate sketch sanity: estimates must track exact values."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.functions_surface import (
    sketch_approx_distinct,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def test_approx_sketches_track_exact(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in sketch_approx_distinct(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
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
