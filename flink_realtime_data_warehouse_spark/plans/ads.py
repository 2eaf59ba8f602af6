"""ADS-layer rollups — the reports the reference's warehouse exists to
serve (its DWS/ADS apps are absent from the snapshot; SURVEY.md §2.5
notes the DWD topics feed exactly these).

Each rollup composes the already-verified DWD semantics (ST2 per-day
UV, ST4 bounce, 30-min sessionization) into the daily numbers a
traffic dashboard reads: PV/UV/bounce-rate/session stats and D1/D7
retention cohorts. All pure window + aggregate plans: one shuffle per
stage, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

ENTRY_EVENT_TYPE = "view"  #: session-entry analogue (operators/visitors.py)
BOUNCE_WINDOW_SECONDS = 3600
SESSION_GAP_MIN = 30


@query(
    "ads_traffic_summary_daily",
    oracle=f"""
    WITH pv AS (
      SELECT CAST(ts AS DATE) AS dt, count(*) AS pv,
             count(DISTINCT user_id) AS uv
      FROM events GROUP BY 1),
    entries AS (
      SELECT CAST(ts AS DATE) AS dt, user_id, ts, event_type,
             lead(ts)         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_type
      FROM events),
    bounce AS (
      SELECT dt, count(*) AS bounces
      FROM entries
      WHERE event_type = '{ENTRY_EVENT_TYPE}'
        AND (nxt_ts IS NULL
             OR epoch_us(nxt_ts) - epoch_us(ts) > {BOUNCE_WINDOW_SECONDS * 1_000_000}
             OR nxt_type = '{ENTRY_EVENT_TYPE}')
      GROUP BY dt)
    SELECT pv.dt, pv.pv, pv.uv,
           COALESCE(bounces, 0) AS bounces,
           round(COALESCE(bounces, 0) * 1.0 / pv.pv, 6) AS bounce_rate
    FROM pv LEFT JOIN bounce ON pv.dt = bounce.dt
    ORDER BY pv.dt
    """,
)
def ads_traffic_summary_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily PV / UV / bounce count+rate — the reference's UV (ST2) and
    bounce (ST4 lead-form) semantics rolled up to the dashboard grain."""
    ev = load_table(spark, sf_dir, "events")
    dt = F.col("ts").cast("date")
    pv = ev.groupBy(dt.alias("dt")).agg(
        F.count("*").alias("pv"), F.countDistinct("user_id").alias("uv")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    entries = ev.select(
        dt.alias("b_dt"),
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("nxt_ts"),
        F.lead("event_type").over(w).alias("nxt_type"),
    )
    gap_us = F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("nxt_ts"))
    bounce = (
        entries.filter(
            (F.col("event_type") == ENTRY_EVENT_TYPE)
            & (
                F.col("nxt_ts").isNull()
                | (gap_us > BOUNCE_WINDOW_SECONDS * 1_000_000)
                | (F.col("nxt_type") == ENTRY_EVENT_TYPE)
            )
        )
        .groupBy("b_dt")
        .agg(F.count("*").alias("bounces"))
    )
    return (
        pv.join(F.broadcast(bounce), pv["dt"] == bounce["b_dt"], "left")
        .select(
            "dt",
            "pv",
            "uv",
            F.coalesce("bounces", F.lit(0)).alias("bounces"),
            F.round(F.coalesce("bounces", F.lit(0)) / F.col("pv"), 6).alias("bounce_rate"),
        )
        .orderBy("dt")
    )


@query(
    "ads_user_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_dt FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_dt FROM events),
    cohorts AS (
      SELECT f.cohort_dt, count(DISTINCT f.user_id) AS cohort_size,
             count(DISTINCT CASE WHEN a.active_dt = f.cohort_dt + INTERVAL 1 DAY
                                 THEN a.user_id END) AS d1,
             count(DISTINCT CASE WHEN a.active_dt = f.cohort_dt + INTERVAL 7 DAY
                                 THEN a.user_id END) AS d7
      FROM first_seen f JOIN activity a ON f.user_id = a.user_id
      GROUP BY f.cohort_dt)
    SELECT cohort_dt, cohort_size,
           round(d1 * 1.0 / cohort_size, 6) AS d1_retention,
           round(d7 * 1.0 / cohort_size, 6) AS d7_retention
    FROM cohorts ORDER BY cohort_dt
    """,
)
def ads_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7 retention cohorts: users by first-seen date, share active
    exactly N days later — the classic warehouse self-join expressed as
    first-seen agg → distinct-activity join → conditional distinct
    counts (one shuffle per stage; the cohort side is the small one
    and broadcasts)."""
    ev = load_table(spark, sf_dir, "events")
    dt = F.col("ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(dt).alias("cohort_dt"))
    activity = ev.select("user_id", dt.alias("active_dt")).distinct()
    joined = activity.join(F.broadcast(first_seen), "user_id")
    cohorts = joined.groupBy("cohort_dt").agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(
            F.when(F.col("active_dt") == F.date_add("cohort_dt", 1), F.col("user_id"))
        ).alias("d1"),
        F.countDistinct(
            F.when(F.col("active_dt") == F.date_add("cohort_dt", 7), F.col("user_id"))
        ).alias("d7"),
    )
    return cohorts.select(
        "cohort_dt",
        "cohort_size",
        F.round(F.col("d1") / F.col("cohort_size"), 6).alias("d1_retention"),
        F.round(F.col("d7") / F.col("cohort_size"), 6).alias("d7_retention"),
    ).orderBy("cohort_dt")


@query(
    "ads_funnel_view_signup",
    oracle="""
    WITH first_view AS (
      SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id),
    converted AS (
      SELECT DISTINCT f.user_id
      FROM first_view f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'signup'
       AND e.ts > f.v_ts AND e.ts <= f.v_ts + INTERVAL 7 DAY)
    SELECT count(*) AS n_viewers,
           (SELECT count(*) FROM converted) AS n_converted,
           round((SELECT count(*) FROM converted) * 1.0 / count(*), 6) AS conversion
    FROM first_view
    """,
)
def ads_funnel_view_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→signup funnel: users whose first view is followed by a
    signup within 7 days. First-touch agg, range-bounded semi join,
    scalar counts combined in one plan (broadcast crossJoin)."""
    ev = load_table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    converted = first_view.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("s_ts") > F.col("v_ts"))
        & (F.col("s_ts") <= F.col("v_ts") + F.expr("INTERVAL 7 DAYS")),
        "left_semi",
    )
    totals = first_view.agg(F.count("*").alias("n_viewers"))
    conv = converted.agg(F.count("*").alias("n_converted"))
    return (
        totals.crossJoin(F.broadcast(conv))
        .select(
            "n_viewers",
            "n_converted",
            # try_divide: a windowless day has zero viewers; NULL matches
            # DuckDB's x/0 (ANSI division would abort the whole job)
            F.round(F.try_divide(F.col("n_converted"), F.col("n_viewers")), 6).alias(
                "conversion"
            ),
        )
    )
