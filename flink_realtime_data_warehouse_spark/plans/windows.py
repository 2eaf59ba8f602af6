"""Time-window aggregations and temporal joins.

The reference snapshot has no DWS apps, but its DWD topics exist to
feed exactly these: tumbling/sliding/session windows (Flink
table-planner is on its classpath unused — reference
gmall-logger/pom.xml:81-96) and stream-stream interval joins
(SURVEY.md §2.4, §2.7). Batch forms here (with DuckDB oracles);
the streaming session-window job is in streaming/jobs.py and
exercised by tests with watermarks.

Scale: window aggregation shuffles once on (key, window); session
windows use Spark's native session_window merge. Interval joins hash
on the equi-key (user) and range-filter within the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table


@query(
    "win_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def win_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: the canonical DWS traffic rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "win_sliding_hourly",
    oracle="""
    SELECT ws AS window_start, count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM (
      SELECT e.user_id, e.ts, b.ws
      FROM events e,
           UNNEST([time_bucket(INTERVAL '30 minutes', e.ts),
                   time_bucket(INTERVAL '30 minutes', e.ts) - INTERVAL '30 minutes']) AS b(ws)
      WHERE e.ts >= b.ws AND e.ts < b.ws + INTERVAL '1 hour')
    GROUP BY ws
    ORDER BY window_start
    """,
)
def win_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30min windows (each event lands in two windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
        .orderBy("window_start")
    )


@query(
    "win_session_gaps",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes' THEN 1
                  WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM islands
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def win_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user.

    Spark's native session_window merges events whose gap is under 30
    minutes; window end = last event + gap. The oracle reproduces the
    same boundaries with a gaps-and-islands formulation.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "join_interval_conversion",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL '1 hour'
    ORDER BY view_id, purchase_id
    """,
)
def join_interval_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 1 hour after a view, per user.

    The batch face of a stream-stream interval join (watermark +
    time-bound condition in streaming). Equi-hash on user_id; the time
    predicate prunes within the partition.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("view_id", "purchase_id", "user_id")
        .orderBy("view_id", "purchase_id")
    )


@query(
    "join_asof_last_view",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           v.event_id AS last_view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS since_view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
    """,
)
def join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior view.

    Spark has no native ASOF JOIN; the idiomatic composition is a
    union of tagged streams + last_value(ignorenulls) over (user, time)
    — one shuffle, no range explosion. The oracle uses DuckDB's native
    ASOF JOIN, pinning our composition to the real operator's semantics.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    # views sort before purchases at identical ts (p.ts >= v.ts includes
    # equality), hence the event_type ordering key
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_type").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.withColumn("last_view_id", F.last("view_id", ignorenulls=True).over(w)).withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return (
        enriched.filter((F.col("event_type") == "purchase") & F.col("last_view_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_view_id"),
            F.timestamp_diff("MICROSECOND", F.col("last_view_ts"), F.col("ts")).alias("since_view_us"),
        )
        .orderBy("purchase_id")
    )


@query(
    "wf_moving_avg_1h",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER w, 4) AS mavg_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_in_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def wf_moving_avg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 1-hour trailing moving average — a RANGE (time-interval)
    window frame, not a ROWS frame: the frame is defined by event-time
    distance, so irregular event spacing is handled correctly.

    Spark range frames need a numeric ordering column; event time is
    projected to epoch microseconds with an NTZ-safe ``timestampdiff``
    (never a cast through session-tz instants) and the frame is
    ``rangeBetween(-1h_in_us, 0)`` — boundary-inclusive on both ends,
    matching DuckDB's ``RANGE INTERVAL PRECEDING``. One shuffle on
    user_id; frames are evaluated with a sliding accumulator per
    partition, not per-row rescans.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.withColumn("ts_us", us)
        .select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 4).alias("mavg_1h"),
            F.count(F.lit(1)).over(w).alias("n_in_1h"),
        )
        .orderBy("event_id")
    )
