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


# ---------------------------------------------------------------------------
# winsorized robust stats (exact quantile cut via bounded histogram)
# ---------------------------------------------------------------------------

WINSOR_LO_PCT = 1  #: clip below the p01 cut
WINSOR_HI_PCT = 99  #: clip above the p99 cut

_WINSOR_ORACLE = f"""
WITH q AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL),
hist AS (SELECT event_type, v, count(*) AS c FROM q GROUP BY 1, 2),
cum AS (
  SELECT event_type, v,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cc
  FROM hist),
n AS (SELECT event_type, count(*) AS n FROM q GROUP BY 1),
cuts AS (
  SELECT c.event_type,
         min(CASE WHEN cc >= ({WINSOR_LO_PCT} * n.n + 99) // 100 THEN v END) AS lo,
         min(CASE WHEN cc >= ({WINSOR_HI_PCT} * n.n + 99) // 100 THEN v END) AS hi
  FROM cum c JOIN n USING (event_type) GROUP BY 1),
w AS (
  SELECT q.event_type, least(greatest(q.v, cuts.lo), cuts.hi) AS wv,
         (q.v < cuts.lo)::INT AS clip_lo, (q.v > cuts.hi)::INT AS clip_hi
  FROM q JOIN cuts USING (event_type))
SELECT w.event_type, n.n AS n_events,
       CAST(cuts.lo AS BIGINT) AS p01_e2, CAST(cuts.hi AS BIGINT) AS p99_e2,
       CAST(sum(w.clip_lo) AS BIGINT) AS n_clipped_lo,
       CAST(sum(w.clip_hi) AS BIGINT) AS n_clipped_hi,
       CAST(sum(w.wv) // n.n AS BIGINT) AS winsor_mean_e2
FROM w JOIN n USING (event_type) JOIN cuts USING (event_type)
GROUP BY w.event_type, n.n, cuts.lo, cuts.hi
ORDER BY w.event_type
"""


@query("events_winsorized_stats", oracle=_WINSOR_ORACLE)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) robust statistics per event type: exact
    p01/p99 cuts, clip counts, and the winsorized mean — the robust
    alternative to the z-score pass when heavy tails make mean/stddev
    themselves unreliable.

    Scale shape: the value domain is integer-quantized (1e-2) and
    aggregated into a bounded per-group histogram; the EXACT percentile
    cut is a cumulative window over that tiny relation (the same
    bounded-integer-domain trick as ``curation_quality_tiers`` /
    ``sample_quality_quota`` — never a corpus-wide sort or an unbounded
    per-group window); cuts broadcast back for a map-only clip, and the
    final stats are one group-by over clipped integers, so every output
    is engine-exact.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    # NULL values are excluded up front ON BOTH SIDES: they carry no
    # winsorizable magnitude, and a NULL histogram row would otherwise
    # sort NULLS FIRST in Spark's cumulative window but NULLS LAST in
    # DuckDB's, shifting every cumulative count (the graph.py
    # NULL-ordering trap)
    q = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
    )
    hist = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cc",
        F.sum("c").over(
            Window.partitionBy("event_type")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    n = q.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    cuts = (
        cum.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.expr(f"cc >= ({WINSOR_LO_PCT} * n + 99) div 100"), F.col("v"))
            ).alias("lo"),
            F.min(
                F.when(F.expr(f"cc >= ({WINSOR_HI_PCT} * n + 99) div 100"), F.col("v"))
            ).alias("hi"),
        )
    )
    w = q.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi")).alias("wv"),
        (F.col("v") < F.col("lo")).cast("int").alias("clip_lo"),
        (F.col("v") > F.col("hi")).cast("int").alias("clip_hi"),
        "lo",
        "hi",
    )
    return (
        w.join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum("clip_lo").cast("bigint").alias("n_clipped_lo"),
            F.sum("clip_hi").cast("bigint").alias("n_clipped_hi"),
            F.expr("sum(wv) div n").cast("bigint").alias("winsor_mean_e2"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("lo").cast("bigint").alias("p01_e2"),
            F.col("hi").cast("bigint").alias("p99_e2"),
            "n_clipped_lo",
            "n_clipped_hi",
            "winsor_mean_e2",
        )
        .orderBy("event_type")
    )
