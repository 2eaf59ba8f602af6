"""Data-profiling operators: histogram binning and statistical outlier
detection — the exploration pass a pipeline runs before committing a
100 TB job, sibling to the dq contract suite (operators/dq.py).

Scale notes: the histogram is a map-only bucket projection + one tiny
aggregation (output = number of bins). Outlier detection deliberately
uses aggregate-then-broadcast-join-back rather than an unbounded
window over the full partition: two map-only scans plus a broadcast of
|group| rows beats shuffling every event row into per-key partitions,
and it cannot skew (no partition ever holds a whole hot key's rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

HIST_BIN_WIDTH = 50
ZSCORE_THRESHOLD = 2.5


@query(
    "agg_value_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) * {HIST_BIN_WIDTH}
             AS bin_lo,
           count(*) AS n,
           round(avg(value), 4) AS bin_avg
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bin_lo
    """,
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type. ``floor`` on doubles
    is exact in IEEE-754, so Spark and DuckDB bin identically; the
    whole operator is one projection + one (type, bin) aggregation."""
    ev = load_table(spark, sf_dir, "events")
    bin_lo = (
        F.floor(F.col("value") / HIST_BIN_WIDTH).cast("bigint") * HIST_BIN_WIDTH
    )
    return (
        ev.groupBy("event_type", bin_lo.alias("bin_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("bin_avg"),
        )
        .orderBy("event_type", "bin_lo")
    )


@query(
    "events_zscore_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) > {ZSCORE_THRESHOLD}
    ORDER BY e.event_id
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers: group stats in one aggregation pass,
    broadcast back, flag |z| > threshold in a second map-only pass.

    The alternative — an unbounded window partitioned by event_type —
    shuffles the ENTIRE fact table and concentrates each hot key on one
    task; this shape shuffles only |groups| stat rows and never skews.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_id")
    )
