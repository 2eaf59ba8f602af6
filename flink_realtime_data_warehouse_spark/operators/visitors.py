"""Visitor-state operators — batch-equivalent forms of the reference's
stateful streaming logic, expressed on the ``events`` table.

The reference keeps per-device (``mid``) ValueState to (a) correct the
``is_new`` flag (ST1, reference BaseLogApp.java:64-96), (b) emit at most
one record per device per day (ST2, DwdTrafficUniqueVisitorDetail.java:55-80)
and (c) detect bounces with a CEP pattern + 10s timeout (ST4,
DwdTrafficUserJumpDetail.java:88-136).

On Spark the *streaming* forms live in ``streaming/state.py``
(applyInPandasWithState). The batch-equivalent forms here are pure
window-function plans — they define the semantics, serve as the DuckDB
oracle surface, and are how a backfill over 100 TB of history would
actually run (window over partitioned key, single shuffle on user_id;
no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

#: CEP match window for bounce detection. The reference uses 10 s on app
#: page logs (DwdTrafficUserJumpDetail.java:106); the synthetic events
#: table is ~1 event/user/hour, so the equivalent "session" horizon here
#: is 1 h — the operator takes it as a parameter.
BOUNCE_WINDOW_SECONDS = 3600

#: which events count as "session entry" (analogue of
#: ``page.last_page_id IS NULL``, DwdTrafficUserJumpDetail.java:89-105)
ENTRY_EVENT_TYPE = "view"


@query(
    "st1_is_new_correction",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                THEN 1 ELSE 0 END AS is_new
    FROM events
    ORDER BY event_id
    """,
)
def st1_is_new_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 batch form: an event is "new" iff it falls on the user's first-seen date.

    Matches the steady-state semantics of the reference's ValueState
    rewrite (BaseLogApp.java:76-95): after the first day, every event
    carries is_new=0. One shuffle on user_id; at 100 TB the first-seen
    date would come from the DIM store instead of a full-history window.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_date = F.min(F.col("ts").cast("date")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("ts").cast("date") == first_date, F.lit(1)).otherwise(F.lit(0)).alias("is_new"),
    ).orderBy("event_id")


@query(
    "st2_daily_unique_visitors",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS DATE) AS dt
    FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY event_id
    """,
)
def st2_daily_unique_visitors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 batch form: first event per (user, day) — per-day UV dedup.

    Exact batch semantics of the reference's keyed stateful filter
    (DwdTrafficUniqueVisitorDetail.java:67-79). The window shuffles once
    on (user_id, day); a streaming pipeline uses dropDuplicates on the
    same key with a watermark (streaming/state.py).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", F.col("ts").cast("date").alias("dt"))
        .orderBy("event_id")
    )


@query(
    "st4_bounce_detection",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM (
      SELECT event_id, user_id, ts, event_type,
             lead(ts)         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_type
      FROM events)
    WHERE event_type = '{ENTRY_EVENT_TYPE}'
      AND (nxt_ts IS NULL
           OR epoch_us(nxt_ts) - epoch_us(ts) > {BOUNCE_WINDOW_SECONDS * 1_000_000}
           OR nxt_type = '{ENTRY_EVENT_TYPE}')
    ORDER BY event_id
    """,
)
def st4_bounce_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch form: CEP bounce pattern via lead().

    Reference pattern (DwdTrafficUserJumpDetail.java:88-136): entry event
    strictly followed by another entry event within the window → bounce
    (match path); entry event with no successor inside the window →
    bounce (timeout path); entry followed in-window by a non-entry event
    → not a bounce. ``lead`` over (user, time) reproduces all three
    cases in one window pass — the exact-timeout streaming state machine
    is in streaming/state.py.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_ts = F.lead("ts").over(w)
    nxt_type = F.lead("event_type").over(w)
    gap_us = F.timestamp_diff("MICROSECOND", F.col("ts"), nxt_ts)
    return (
        ev.withColumn("nxt_ts", nxt_ts)
        .withColumn("nxt_type", nxt_type)
        .withColumn("gap_us", gap_us)
        .filter(
            (F.col("event_type") == ENTRY_EVENT_TYPE)
            & (
                F.col("nxt_ts").isNull()
                | (F.col("gap_us") > BOUNCE_WINDOW_SECONDS * 1_000_000)
                | (F.col("nxt_type") == ENTRY_EVENT_TYPE)
            )
        )
        .select(
            "event_id",
            "user_id",
            F.timestamp_diff(
                "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), F.col("ts")
            ).alias("ts_us"),
        )
        .orderBy("event_id")
    )


@query(
    "t8_route_split",
    oracle="""
    SELECT CASE WHEN event_type = 'error'  THEN 'err'
                WHEN event_type = 'signup' THEN 'start'
                ELSE 'page' END AS route,
           count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1 ORDER BY route
    """,
)
def t8_route_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 stream-split analogue (reference BaseLogApp.java:97-162).

    The reference routes one pass over the log into err/start/page side
    outputs; here the discriminator is a column and each route is a
    filter over the same scan — Catalyst collapses this into one pass.
    """
    ev = load_table(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "err")
        .when(F.col("event_type") == "signup", "start")
        .otherwise("page")
    )
    return (
        ev.withColumn("route", route)
        .groupBy("route")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("route")
    )


@query(
    "t7_explode_words",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def t7_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 array-explode analogue (reference display/action explode, BaseLogApp.java:126-149)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )
