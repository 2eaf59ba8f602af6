"""Stream-vs-batch parity queries: the REAL streaming state machines
(applyInPandasWithState, availableNow trigger) run under the driver's
DuckDB oracle check.

The batch-window formulations in ``operators/visitors.py`` define the
semantics and already hash-match their oracles; these queries prove the
*streaming* execution path produces the identical answer on the same
input — reference topologies ST1/ST2/ST4 closed end-to-end
(BaseLogApp.java:64-96, DwdTrafficUniqueVisitorDetail.java:55-80,
DwdTrafficUserJumpDetail.java:88-136).

Mechanics: the events table is flattened to the visitor-event shape
(ts as NTZ epoch MICROseconds — session-timezone-proof and lossless),
written as a single parquet file, streamed back through the stateful
operator with an availableNow trigger into a parquet sink, and the
sink is read back as the query result. One file → one micro-batch, so
cross-batch ordering cannot diverge from the batch oracle; the
operators themselves already handle multi-chunk groups.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.streaming.table_format import (
    FORMAT,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table
from flink_realtime_data_warehouse_spark.streaming.state import (
    VISITOR_EVENT_SCHEMA,
    correct_is_new,
    daily_unique_visitors,
    detect_bounces,
)

#: same knobs as the batch forms (operators/visitors.py)
_BOUNCE_WINDOW_US = 3600 * 1_000_000
_ENTRY_EVENT_TYPE = "view"

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _flat_events(spark: SparkSession, sf_dir: str, for_bounce: bool = False) -> DataFrame:
    """events → visitor-event shape with ts = NTZ epoch µs."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts"))
    last_page = (
        F.when(F.col("event_type") == _ENTRY_EVENT_TYPE, F.lit(None).cast("string"))
        .otherwise(F.lit("np"))
        if for_bounce
        else F.lit(None).cast("string")
    )
    return ev.select(
        F.col("user_id").cast("string").alias("mid"),
        F.lit("1").alias("is_new"),
        F.col("event_id").cast("string").alias("page_id"),
        last_page.alias("last_page_id"),
        ts_us.alias("ts"),
    )


def _run_stream(spark: SparkSession, flat: DataFrame, op) -> DataFrame:
    """Materialize ``flat`` (one file), stream it through ``op``, return the sink."""
    root = tempfile.mkdtemp(prefix="frdw_parity_")
    src = os.path.join(root, "src")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    flat.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(VISITOR_EVENT_SCHEMA).parquet(src)
    out = op(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


_NTZ_DAY_US = 86_400_000_000


def _dt_from_ts_us(col: Column) -> Column:
    """NTZ epoch µs → DATE via pure integer math (no session tz)."""
    return F.date_add(
        F.lit("1970-01-01").cast("date"), F.floor(col / F.lit(_NTZ_DAY_US)).cast("int")
    )


@query(
    "st1_streaming_parity",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                THEN 1 ELSE 0 END AS is_new
    FROM events
    ORDER BY event_id
    """,
)
def st1_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 via the actual applyInPandasWithState pipeline.

    Every event claims is_new=1; the state machine keeps the claim only
    on the device's first-seen date — which is exactly the batch
    oracle's min-date window semantics.
    """
    flat = _flat_events(spark, sf_dir)
    sink = _run_stream(
        spark, flat, lambda s: correct_is_new(s, offset_ms=0, ts_per_ms=1000)
    )
    return sink.select(
        F.col("page_id").cast("bigint").alias("event_id"),
        F.col("mid").cast("bigint").alias("user_id"),
        F.col("is_new").cast("int").alias("is_new"),
    ).orderBy("event_id")


@query(
    "st2_streaming_parity",
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
def st2_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 via the actual applyInPandasWithState pipeline: the state
    machine's first-emission-per-day equals the batch first-row-per-
    (user, day) window (no (user, ts) ties in the events table)."""
    flat = _flat_events(spark, sf_dir)
    sink = _run_stream(
        spark, flat, lambda s: daily_unique_visitors(s, offset_ms=0, ts_per_ms=1000)
    )
    return sink.select(
        F.col("page_id").cast("bigint").alias("event_id"),
        F.col("mid").cast("bigint").alias("user_id"),
        _dt_from_ts_us(F.col("ts")).alias("dt"),
    ).orderBy("event_id")


@query(
    "win_streaming_tumbling_parity",
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
def win_streaming_tumbling_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING tumbling rollup (watermarked append-mode windowed
    aggregation) must produce the batch window oracle's exact rows.

    A single flush sentinel two hours past the last event advances the
    final watermark so every real window finalizes and emits (append
    mode only emits a window once the watermark passes its end; the
    sentinel's own window never finalizes and is filtered out).

    Session-tz proofing: the watermark column must be TIMESTAMP (LTZ),
    so the NTZ wall-clock rides as epoch µs, becomes an instant via
    ``timestamp_micros`` (hour windows align to epoch hours → identical
    buckets to the oracle's NTZ time_bucket), and the emitted window
    start is rebuilt into NTZ with pure integer arithmetic.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts")).alias("ts_us"),
        "event_type",
        "value",
    )
    sentinel = ev.agg(
        (F.max("ts_us") + F.lit(2 * 3600 * 1_000_000)).alias("ts_us"),
        F.lit("__flush").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    root = tempfile.mkdtemp(prefix="frdw_winparity_")
    src = os.path.join(root, "src")
    sink = os.path.join(root, "sink")
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "ts_us bigint, event_type string, value double"
    ).parquet(src)
    agg = (
        stream.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("event_time", "0 seconds")
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.timestamp_add(
                "MICROSECOND", F.unix_micros(F.col("w.start")), F.expr(_EPOCH_NTZ)
            ).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink)
        .filter(F.col("event_type") != "__flush")
        .orderBy("window_start", "event_type")
    )


@query(
    "st4_streaming_parity",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM (
      SELECT event_id, user_id, ts, event_type,
             lead(ts)         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_type
      FROM events)
    WHERE event_type = '{_ENTRY_EVENT_TYPE}'
      AND (nxt_ts IS NULL
           OR epoch_us(nxt_ts) - epoch_us(ts) > {_BOUNCE_WINDOW_US}
           OR nxt_type = '{_ENTRY_EVENT_TYPE}')
    ORDER BY event_id
    """,
)
def st4_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 via the actual applyInPandasWithState pipeline.

    A per-device flush sentinel (non-entry, one window past the
    device's last event) is appended to the input so every still-
    pending entry takes the in-batch timeout path before the stream
    ends — the batch lead() form counts a trailing entry as a bounce
    (nxt_ts IS NULL) the same way. Sentinels are non-entries and are
    never emitted themselves.
    """
    flat = _flat_events(spark, sf_dir, for_bounce=True)
    flush = (
        flat.groupBy("mid")
        .agg(F.max("ts").alias("mx"))
        .select(
            "mid",
            F.lit("1").alias("is_new"),
            F.lit("-1").alias("page_id"),
            F.lit("np").alias("last_page_id"),
            (F.col("mx") + F.lit(_BOUNCE_WINDOW_US + 1)).alias("ts"),
        )
    )
    sink = _run_stream(
        spark,
        flat.unionByName(flush),
        lambda s: detect_bounces(
            s.withColumn("event_time", F.timestamp_micros(F.col("ts"))).withWatermark(
                "event_time", "0 seconds"
            ),
            window=_BOUNCE_WINDOW_US,
            ts_per_ms=1000,  # ts is epoch-µs; GroupState timeouts are ms
        ),
    )
    return sink.select(
        F.col("page_id").cast("bigint").alias("event_id"),
        F.col("mid").cast("bigint").alias("user_id"),
        F.col("ts").alias("ts_us"),
    ).orderBy("event_id")


@query(
    "rollup_streaming_parity",
    oracle="""
    SELECT (epoch_us(ts) // 60000000) * 60000 AS bucket_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY 1 ORDER BY bucket_ms
    """,
)
def rollup_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL continuous-aggregate store (streaming/rollup.py)
    must serve exactly the batch minute aggregation: events are dumped
    as FOUR files and streamed one-file-per-trigger, so the store is
    assembled from four independent partial merges — the cross-batch
    additivity (count→sum, sum→sum, max→max) is what the oracle checks.

    Session-tz proofing: event time rides as NTZ epoch µs, truncated to
    ms with integer arithmetic; ``timestamp_millis``/``unix_millis``
    round-trip the instant exactly under any session timezone, and the
    store keys on the epoch-ms LONG itself. Minute truncation composes
    over the µs→ms truncation, so buckets equal the oracle's
    ``epoch_us // 60e6`` exactly.
    """
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        continuous_minute_rollup_job,
        read_minute_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    ts_us = F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts"))
    flat = ev.select(
        F.timestamp_millis((ts_us / F.lit(1000)).cast("bigint")).alias("event_time"),
        "value",
    )
    root = tempfile.mkdtemp(prefix="frdw_rollup_parity_")
    src = os.path.join(root, "src")
    flat.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("event_time timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = os.path.join(root, "store")
    q = continuous_minute_rollup_job(
        stream, store, os.path.join(root, "ckpt")
    )
    q.awaitTermination()
    return (
        read_minute_rollup(spark, store)
        .select(
            "bucket_ms",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
            F.round("max_value", 2).alias("max_value"),
        )
        .orderBy("bucket_ms")
    )


@query(
    "rollup_retention_audit",
    oracle="""
    WITH b AS (
      SELECT (epoch_us(ts) // 60000000) * 60000 AS bucket_ms, value
      FROM events WHERE ts IS NOT NULL),
    cut AS (
      SELECT min(day) AS cutoff FROM (
        SELECT DISTINCT bucket_ms // 86400000 AS day FROM b
        ORDER BY day DESC LIMIT 7))
    SELECT bucket_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value
    FROM b, cut
    WHERE bucket_ms // 86400000 >= cutoff
    GROUP BY bucket_ms ORDER BY bucket_ms
    """,
)
def rollup_retention_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy over the REAL continuous-aggregate store: the
    events stream builds the minute-partial store
    (``continuous_minute_rollup_job``), ``expire_rollup_chunks``
    drops every pday chunk outside the newest 7 PRESENT day-partitions
    (the data-defined ``keep_days`` form — no wall clock, so the
    oracle can state the cutoff), and the serving read must equal the
    batch aggregation restricted to those days. The cutoff is pure
    UTC-day integer arithmetic on ``bucket_ms`` — the tz-free pday
    derivation (see ``make_rollup_merger``) is what makes day-grain
    retention oracle-expressible at all. Expiry opens NO data file:
    chunks drop by directory rename from the partition name alone
    (the hypertable drop_chunks contract — 23 of 30 day-chunks drop
    at every SF, surviving bytes untouched)."""
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        continuous_minute_rollup_job,
        expire_rollup_chunks,
        read_minute_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    ts_us = F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts"))
    flat = ev.select(
        F.timestamp_millis((ts_us / F.lit(1000)).cast("bigint")).alias(
            "event_time"
        ),
        "value",
    )
    root = tempfile.mkdtemp(prefix="frdw_rollup_retention_")
    src = os.path.join(root, "src")
    flat.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("event_time timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = os.path.join(root, "store")
    continuous_minute_rollup_job(
        stream, store, os.path.join(root, "ckpt")
    ).awaitTermination()
    expire_rollup_chunks(spark, store, keep_days=7)
    return (
        read_minute_rollup(spark, store)
        .select(
            "bucket_ms",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
            F.round("max_value", 2).alias("max_value"),
        )
        .orderBy("bucket_ms")
    )


@query(
    "win_session_streaming_parity",
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
def win_session_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING session-window aggregation (gap-merged, watermarked
    append mode) must emit the batch gaps-and-islands oracle's exact
    rows — the session sibling of ``win_streaming_tumbling_parity``.

    One global flush sentinel past max(ts) + gap advances the final
    watermark beyond every real session's end (session end = last event
    + gap, and the watermark is global, not per-key), so every session
    finalizes and emits; the sentinel's own session is filtered out.
    Same NTZ-via-epoch-µs transport as the tumbling parity query.
    """
    GAP_US = 30 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts")).alias("ts_us"),
        F.col("user_id").cast("string").alias("uid"),
        "value",
    )
    sentinel = ev.agg(
        (F.max("ts_us") + F.lit(2 * GAP_US)).alias("ts_us"),
        F.lit("__flush").alias("uid"),
        F.lit(0.0).alias("value"),
    )
    root = tempfile.mkdtemp(prefix="frdw_sessparity_")
    src = os.path.join(root, "src")
    sink = os.path.join(root, "sink")
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts_us bigint, uid string, value double").parquet(src)
    agg = (
        stream.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("event_time", "0 seconds")
        .groupBy(F.session_window("event_time", "30 minutes").alias("w"), "uid")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.timestamp_add(
                "MICROSECOND", F.unix_micros(F.col("w.start")), F.expr(_EPOCH_NTZ)
            ).alias("session_start"),
            F.timestamp_add(
                "MICROSECOND", F.unix_micros(F.col("w.end")), F.expr(_EPOCH_NTZ)
            ).alias("session_end"),
            "uid",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink)
        .filter(F.col("uid") != "__flush")
        .select(
            F.col("uid").cast("bigint").alias("user_id"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "export_streaming_parity",
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id, CAST(max(n_events) AS BIGINT) AS n_events,
       coalesce(string_agg(event_type, '>' ORDER BY rn), '') AS seq
FROM r WHERE rn <= 64 GROUP BY user_id ORDER BY user_id
""",
)
def export_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING sequence accumulator (applyInPandasWithState,
    bounded per-user state) must reproduce the batch
    ``export_user_event_sequences`` answer — same capped ``a>b>c``
    prefix, same totals. Single-file availableNow run → one snapshot
    row per user; the cross-batch changelog form is pinned separately
    in tests/test_state_ops.py."""
    from flink_realtime_data_warehouse_spark.streaming.state import (
        SEQ_EVENT_SCHEMA,
        build_user_sequences,
    )

    ev = load_table(spark, sf_dir, "events")
    flat = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col("ts")).alias("ts"),
    )
    root = tempfile.mkdtemp(prefix="frdw_seqparity_")
    src = os.path.join(root, "src")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    flat.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SEQ_EVENT_SCHEMA).parquet(src)
    q = (
        build_user_sequences(stream, cap=64)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).orderBy("user_id")


def _gate_parity_oracle() -> str:
    """Batch statement of the full streaming near-dup-gate composition
    (start_history_dedup_ingest(near_dup_gate=True) over history batch
    then incoming batch): digest-first election per batch, history
    digests blocking incoming exact dups, df-capped banding with the
    batch-time df asymmetry (history vs accumulated), probe join."""
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        INCR_HISTORY_MOD,
        NGRAM_DF_CAP,
        _band_oracle_keys_from,
        _SIG_ORACLE_COLS,
    )

    shingle = (
        "SELECT DISTINCT doc_id, ('0x' || substr(md5(ws[i] || ' ' || ws[i+1]"
        " || ' ' || ws[i+2]), 1, 15))::BIGINT AS s\n"
        "  FROM {w}, UNNEST(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)"
        " ELSE [] END) AS t(i)"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text, md5(text) AS d,
         (doc_id % {INCR_HISTORY_MOD}) = {INCR_HISTORY_MOD - 1} AS incoming
  FROM documents),
hist_new AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, row_number() OVER (PARTITION BY d ORDER BY doc_id) AS rn
    FROM base WHERE NOT incoming) WHERE rn = 1),
hdig AS (SELECT DISTINCT d FROM base WHERE NOT incoming AND d IS NOT NULL),
inc_new AS (
  SELECT doc_id, text FROM (
    SELECT b.doc_id, b.text,
           row_number() OVER (PARTITION BY b.d ORDER BY b.doc_id) AS rn,
           coalesce(b.d IN (SELECT d FROM hdig), FALSE) AS in_hist
    FROM base b WHERE b.incoming)
  WHERE NOT in_hist AND rn = 1),
wh AS (SELECT doc_id, string_split(text, ' ') AS ws FROM hist_new),
sh_h0 AS (
  {shingle.format(w='wh')}),
wi AS (SELECT doc_id, string_split(text, ' ') AS ws FROM inc_new),
sh_i0 AS (
  {shingle.format(w='wi')}),
freq_h AS (SELECT s, count(*) AS df FROM sh_h0 GROUP BY s),
freq_a AS (SELECT s, sum(df) AS df FROM (
    SELECT s, count(*) AS df FROM sh_h0 GROUP BY s
    UNION ALL
    SELECT s, count(*) AS df FROM sh_i0 GROUP BY s) GROUP BY s),
sh_h AS (SELECT sh_h0.doc_id, sh_h0.s FROM sh_h0 JOIN freq_h USING (s)
         WHERE freq_h.df <= {NGRAM_DF_CAP}),
sh_i AS (SELECT sh_i0.doc_id, sh_i0.s FROM sh_i0 JOIN freq_a USING (s)
         WHERE freq_a.df <= {NGRAM_DF_CAP}),
sig_h AS (SELECT doc_id, {_SIG_ORACLE_COLS} FROM sh_h GROUP BY doc_id),
sig_i AS (SELECT doc_id, {_SIG_ORACLE_COLS} FROM sh_i GROUP BY doc_id),
bands_h AS (
{_band_oracle_keys_from("sig_h")}
),
bands_i AS (
{_band_oracle_keys_from("sig_i")}
)
SELECT DISTINCT n.doc_id AS doc_new, h.doc_id AS doc_hist
FROM bands_i n JOIN bands_h h ON n.band = h.band AND n.key = h.key
ORDER BY doc_new, doc_hist
"""


@query("histdedup_gate_streaming_parity", oracle=_gate_parity_oracle())
def histdedup_gate_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL streaming ingest composition under the oracle: the
    history slice (doc_id % 5 != 4) arrives as micro-batch 0 and the
    incoming slice as micro-batch 1 through the REAL
    ``start_history_dedup_ingest(near_dup_gate=True)`` job — exact
    dedup routing, digest store, df store, capped band index, probe —
    and the ``near_dups`` sink is read back as the result.

    The oracle states every semantic the composition stacks up: per-
    batch digest-first election (dup_batch copies never reach the
    gate), history digests blocking incoming exact re-crawls, history
    bands capped against the df KNOWN AT THEIR INGEST TIME (batch 0's
    own delta), incoming bands capped against the accumulated df
    (store + batch 1's delta), candidates = full-band collisions.
    This is the streaming sibling of ``dedup_incremental_lsh_dfcap``
    — same banding, but driven through checkpoints, pbatch partitions,
    and the persisted stores instead of one logical plan.
    """
    import shutil

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        INCR_HISTORY_MOD,
    )
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.pmod("doc_id", F.lit(INCR_HISTORY_MOD)) == INCR_HISTORY_MOD - 1
    root = tempfile.mkdtemp(prefix="frdw_gateparity_")
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)

    def _drop(df: DataFrame, name: str, mtime: float) -> None:
        tmp = os.path.join(root, f"slice_{name}")
        df.select(
            F.to_json(F.struct("doc_id", "text")).alias("v")
        ).coalesce(1).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, name)
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        if parts:
            shutil.move(os.path.join(tmp, parts[0]), dst)
        else:  # empty slice (zero-row tier): an empty file = empty batch
            open(dst, "w").close()
        os.utime(dst, (mtime, mtime))

    # modification times order the micro-batches: history first
    _drop(docs.filter(~is_inc).select("doc_id", "text"), "0.jsonl", 1_000_000_000.0)
    _drop(docs.filter(is_inc).select("doc_id", "text"), "1.jsonl", 1_000_000_100.0)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = os.path.join(root, "out")
    q = start_history_dedup_ingest(
        spark, stream, out, os.path.join(root, "ckpt"), near_dup_gate=True
    )
    q.awaitTermination()
    near_path = os.path.join(out, "near_dups")
    try:
        result = FORMAT.read(
            spark, near_path, "doc_id bigint, doc_hist bigint, pbatch string"
        )
    except Exception:  # zero-row tier: no batch ever wrote the sink
        result = spark.createDataFrame(
            [], "doc_id bigint, doc_hist bigint, pbatch string"
        )
    return (
        result.select(F.col("doc_id").alias("doc_new"), "doc_hist")
        .distinct()
        .orderBy("doc_new", "doc_hist")
    )


# ---------------------------------------------------------------------------
# streaming vector ingest (round 8): the two-level IVF index maintained
# by start_embedding_ingest, probed while it grows
# ---------------------------------------------------------------------------


def _ann_stream_recall_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _RECALL_CHECK_ORACLE,
    )

    return _RECALL_CHECK_ORACLE


#: recall floor for the stream-built index. Lower than the batch row's
#: 0.7 by design, NOT because the streaming machinery loses anything:
#: the quantizer here is trained on batch 0 alone (60% of the corpus —
#: the production backfill-then-stream posture) and the batch-twin
#: control (build on the same 60%, append the rest with
#: ``append_ann_ivf_vectors``) measures the IDENTICAL recall, so the
#: entire gap vs the fully-trained index (0.72-0.92 measured vs
#: 0.84-0.92 at sf0.001/0.01/0.1) is the standard subset-trained-IVF
#: trade. The floor carries ≥0.12 margin under the measured band.
ANN_STREAM_MIN_MEAN_RECALL = 0.6


@query("ann_ivf_streaming_ingest_checked", oracle=_ann_stream_recall_oracle())
def ann_ivf_streaming_ingest_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall verdict for the STREAM-BUILT two-level IVF index: the
    clean embedding corpus arrives as three micro-batches through
    ``start_embedding_ingest`` (batch 0 — 60% of the corpus, the
    backfill — cold-builds the hierarchical quantizer, batches 1-2
    land as pbatch-partitioned deltas, ``compact_every=3`` folds
    batch 1 into the cell partitions at the batch-2 boundary — so the
    probe exercises main cells AND the un-folded delta tail in one
    query), then the standard query block probes the composite index
    and the mean recall against in-plan brute force must clear
    ``ANN_STREAM_MIN_MEAN_RECALL`` (see that constant for why the
    floor differs from the batch row's — measured, it is exactly the
    subset-trained-quantizer cost, not the streaming machinery).
    """
    import shutil

    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _SCORED_SCHEMA,
        _load_emb,
        _query_block,
        _recall_verdict,
        ann_cosine_topk,
        ann_ivf_probe,
    )
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_embedding_ingest,
    )

    emb = _load_emb(spark, sf_dir)
    exact = ann_cosine_topk(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="frdw_annstream_")
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)

    def _drop(df: DataFrame, name: str, mtime: float) -> None:
        tmp = os.path.join(root, f"slice_{name}")
        df.select(F.to_json(F.struct("vec_id", "v")).alias("j")).coalesce(
            1
        ).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, name)
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        if parts:
            shutil.move(os.path.join(tmp, parts[0]), dst)
        else:  # zero-row tier: an empty file = an empty micro-batch
            open(dst, "w").close()
        os.utime(dst, (mtime, mtime))

    m5 = F.pmod("vec_id", F.lit(5))
    _drop(emb.filter(m5 < 3), "0.jsonl", 1_000_000_000.0)
    _drop(emb.filter(m5 == 3), "1.jsonl", 1_000_000_100.0)
    _drop(emb.filter(m5 == 4), "2.jsonl", 1_000_000_200.0)

    stream = (
        spark.readStream.schema("vec_id bigint, v array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    index_root = os.path.join(root, "index")
    q = start_embedding_ingest(
        spark,
        stream,
        index_root,
        os.path.join(root, "ckpt"),
        compact_every=3,
    )
    q.awaitTermination()

    if os.path.exists(os.path.join(index_root, "_built_pbatch")):
        qp = _query_block(spark, emb, sf_dir)
        approx = (
            ann_ivf_probe(spark, index_root, qp)
            if len(qp)
            else spark.createDataFrame([], _SCORED_SCHEMA + ", rank int")
        )
    else:  # zero-row corpus: the index was never built
        approx = spark.createDataFrame([], _SCORED_SCHEMA + ", rank int")
    return _recall_verdict(exact, approx, ANN_STREAM_MIN_MEAN_RECALL)


# ---------------------------------------------------------------------------
# retention (round 8): takedown purges composed over the whole lake
# ---------------------------------------------------------------------------

_TAKEDOWN_ORACLE = """
WITH base AS (
  SELECT doc_id, md5(text) AS d, (doc_id % 5) = 4 AS inc
  FROM documents),
elect AS (
  SELECT doc_id,
         row_number() OVER (
           PARTITION BY d, CASE WHEN d IS NULL THEN CAST(inc AS INT) ELSE 0 END
           ORDER BY inc, doc_id) AS rn
  FROM base)
SELECT doc_id FROM elect WHERE rn = 1 AND doc_id % 17 <> 3
ORDER BY doc_id
"""


@query("lake_takedown_audit", oracle=_TAKEDOWN_ORACLE)
def lake_takedown_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure over the REAL lake: ingest the corpus through
    ``start_history_dedup_ingest(near_dup_gate=True)`` (history slice
    then incoming slice — the same two micro-batches as the gate
    parity row), run ``takedown_documents`` for every ``doc_id % 17
    == 3``, and read the clean store back. The oracle states the whole
    composition: per-batch digest-first election (history first, then
    lowest doc_id; null-text docs elect per batch because a NULL hash
    never matches the digest store), MINUS the purged set. The purge
    set deliberately crosses every store: purged canonicals, purged
    duplicates (their evidence rows go, the canonical's digest stays),
    and purged gate candidates — so the row is green only if all five
    store rewrites compose without corrupting the election history.
    Digest policy is the default ``block_reingest=True`` (payload
    erased, content blocked), the posture takedown obligations want;
    the policy fork is test-pinned in tests/test_takedown.py.
    """
    import shutil

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )
    from flink_realtime_data_warehouse_spark.streaming.retention import (
        takedown_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.pmod("doc_id", F.lit(5)) == 4
    root = tempfile.mkdtemp(prefix="frdw_takedown_")
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)

    def _drop(df: DataFrame, name: str, mtime: float) -> None:
        tmp = os.path.join(root, f"slice_{name}")
        df.select(
            F.to_json(F.struct("doc_id", "text")).alias("v")
        ).coalesce(1).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, name)
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        if parts:
            shutil.move(os.path.join(tmp, parts[0]), dst)
        else:
            open(dst, "w").close()
        os.utime(dst, (mtime, mtime))

    _drop(docs.filter(~is_inc).select("doc_id", "text"), "0.jsonl", 1_000_000_000.0)
    _drop(docs.filter(is_inc).select("doc_id", "text"), "1.jsonl", 1_000_000_100.0)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = os.path.join(root, "out")
    q = start_history_dedup_ingest(
        spark, stream, out, os.path.join(root, "ckpt"), near_dup_gate=True
    )
    q.awaitTermination()

    takedown_documents(
        spark, out, docs.filter(F.pmod("doc_id", F.lit(17)) == 3).select("doc_id")
    )

    clean_path = os.path.join(out, "clean")
    try:
        result = FORMAT.read(
            spark, clean_path, "doc_id bigint, text string, pbatch string"
        )
    except Exception:  # zero-row tier: no batch ever wrote the sink
        result = spark.createDataFrame([], "doc_id bigint, text string, pbatch string")
    return result.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII-scrubbed ingest (round 9): the redact_pii flag composed with the
# digest election — payload scrubbed, classification on original bytes
# ---------------------------------------------------------------------------


def _pii_scrub_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.pii import (
        _PLANT_SQL,
        redact_sql,
    )

    return f"""
WITH planted AS ({_PLANT_SQL}),
base AS (
  SELECT doc_id, text, md5(text) AS d, (doc_id % 5) = 4 AS inc
  FROM planted),
elect AS (
  SELECT doc_id, text,
         row_number() OVER (
           PARTITION BY d, CASE WHEN d IS NULL THEN CAST(inc AS INT) ELSE 0 END
           ORDER BY inc, doc_id) AS rn
  FROM base)
SELECT doc_id, {redact_sql('text')} AS text
FROM elect WHERE rn = 1
ORDER BY doc_id
"""


@query("lake_pii_scrubbed_ingest", oracle=_pii_scrub_oracle())
def lake_pii_scrubbed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII-scrubbed lake: the planted-PII corpus (operators/pii.py
    fixture — email/IPv4/phone spans on deterministic doc_id classes)
    arrives as the usual two micro-batches (history slice then
    incoming) through ``start_history_dedup_ingest(redact_pii=True)``,
    and the clean store is read back. The oracle states the COMPOSED
    semantics: the per-batch digest-first election runs on the
    ORIGINAL planted bytes (md5 BEFORE redaction — so duplicates of
    raw content are blocked even though the lake never stores raw
    content), and the elected payload lands redacted. NULL-text docs
    elect per batch (NULL digest) and stay NULL through the scrub.
    Scale shape: the scrub adds three map-only ``regexp_replace``
    expressions to the clean sink's project — zero new shuffles,
    zero new scans."""
    import shutil

    from flink_realtime_data_warehouse_spark.operators.pii import _planted
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    docs = _planted(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    is_inc = F.pmod("doc_id", F.lit(5)) == 4
    root = tempfile.mkdtemp(prefix="frdw_piiscrub_")
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)

    def _drop(df: DataFrame, name: str, mtime: float) -> None:
        tmp = os.path.join(root, f"slice_{name}")
        df.select(
            F.to_json(F.struct("doc_id", "text")).alias("v")
        ).coalesce(1).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, name)
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        if parts:
            shutil.move(os.path.join(tmp, parts[0]), dst)
        else:
            open(dst, "w").close()
        os.utime(dst, (mtime, mtime))

    _drop(docs.filter(~is_inc), "0.jsonl", 1_000_000_000.0)
    _drop(docs.filter(is_inc), "1.jsonl", 1_000_000_100.0)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = os.path.join(root, "out")
    start_history_dedup_ingest(
        spark, stream, out, os.path.join(root, "ckpt"), redact_pii=True
    ).awaitTermination()

    try:
        result = FORMAT.read(
            spark,
            os.path.join(out, "clean"),
            "doc_id bigint, text string, pbatch string",
        )
    except Exception:  # zero-row tier: no batch ever wrote the sink
        result = spark.createDataFrame(
            [], "doc_id bigint, text string, pbatch string"
        )
    return result.select("doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Bloom-prefiltered history dedup (round 8, late): the exact ingest
# statuses driven through the partitioned-filter fast path
# ---------------------------------------------------------------------------

_BLOOM_PARITY_ORACLE = """
WITH d AS (
  SELECT doc_id, md5(text) AS ch, (doc_id % 5) = 4 AS inc FROM documents),
b0 AS (
  SELECT doc_id,
         CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY ch)
              THEN 'dup_batch' ELSE 'new' END AS status
  FROM d WHERE NOT inc),
hist AS (SELECT DISTINCT ch FROM d WHERE NOT inc AND ch IS NOT NULL),
b1 AS (
  SELECT d.doc_id,
         CASE WHEN h.ch IS NOT NULL THEN 'dup_history'
              WHEN d.doc_id > min(d.doc_id) OVER (PARTITION BY d.ch)
              THEN 'dup_batch' ELSE 'new' END AS status
  FROM d LEFT JOIN hist h ON d.ch = h.ch WHERE d.inc)
SELECT doc_id, status FROM b0
UNION ALL SELECT doc_id, status FROM b1
ORDER BY doc_id
"""


@query("histdedup_bloom_streaming_parity", oracle=_BLOOM_PARITY_ORACLE)
def histdedup_bloom_streaming_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact-dedup ingest statuses through the REAL
    ``start_history_dedup_ingest(bloom_prefilter=True)`` job: history
    slice (doc_id % 5 != 4) as micro-batch 0, incoming slice as
    micro-batch 1, every document's routed verdict read back from the
    clean/dups sinks. The oracle states plain per-batch digest
    semantics — batch-internal first-copy election (NULL digests form
    one group per batch), history digests blocking incoming re-crawls
    — and the row is green only if the Bloom access path (probe →
    maybe/clear split → filter OR-update or headroom rebuild →
    superset-ordered writes) changes NOTHING about the verdicts. The
    batch-0 cold build, the batch-1 probe, and at least one filter
    update all execute inside this row; the all-new skip, crash
    windows, and overflow rebuild are pinned in
    tests/test_bloom_stream.py.
    """
    import shutil

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.pmod("doc_id", F.lit(5)) == 4
    root = tempfile.mkdtemp(prefix="frdw_bloomparity_")
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)

    def _drop(df: DataFrame, name: str, mtime: float) -> None:
        tmp = os.path.join(root, f"slice_{name}")
        df.select(
            F.to_json(F.struct("doc_id", "text")).alias("v")
        ).coalesce(1).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, name)
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        if parts:
            shutil.move(os.path.join(tmp, parts[0]), dst)
        else:
            open(dst, "w").close()
        os.utime(dst, (mtime, mtime))

    _drop(docs.filter(~is_inc).select("doc_id", "text"), "0.jsonl", 1_000_000_000.0)
    _drop(docs.filter(is_inc).select("doc_id", "text"), "1.jsonl", 1_000_000_100.0)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = os.path.join(root, "out")
    q = start_history_dedup_ingest(
        spark, stream, out, os.path.join(root, "ckpt"), bloom_prefilter=True
    )
    q.awaitTermination()

    def _read(sub: str, schema: str) -> DataFrame:
        try:
            return FORMAT.read(spark, os.path.join(out, sub), schema)
        except Exception:  # zero-row tier: the sink was never written
            return spark.createDataFrame([], schema)

    clean = _read(
        "clean", "doc_id bigint, text string, pbatch string"
    ).select("doc_id", F.lit("new").alias("status"))
    dups = _read(
        "dups", "doc_id bigint, content_hash string, status string, pbatch string"
    ).select("doc_id", "status")
    return clean.unionByName(dups).orderBy("doc_id")
