"""Hypertable-style rollups, range joins, and heavy-hitter sketches.

Three scale-path operators the reference's DWS layer would grow into
(the reference ships DWD topics and no aggregation layer — SURVEY.md
§2.5); all are standard OLAP/time-series warehouse capabilities:

- ``rollup_hypertable``: a continuous-aggregate cascade. The minute
  grain is aggregated ONCE from raw events; the hour grain re-aggregates
  the minute partials and the day grain re-aggregates the hour partials.
  At 100 TB this is the difference between scanning the fact table three
  times and scanning it once: count/sum/max are decomposable, so each
  coarser grain reads only the next-finer aggregate (|minutes| rows, not
  |events|). Catalyst's ReuseExchange shares the single minute-level
  shuffle across all three union branches.

- ``join_range_binned``: a point-in-interval range join executed as an
  equi-join. Naively ``value BETWEEN lo AND hi`` is a theta-join —
  broadcast-nested-loop when one side is small, quadratic when both are
  big. Binning maps each interval to the fixed-width bins it overlaps
  (explode, ≤ ceil(width/bin)+1 rows per interval) and each point to
  exactly one bin, so the join becomes hash-partitionable on ``bin``
  with a cheap residual filter — the standard range-join optimization
  in warehouse engines (e.g. Databricks' range-join hints).

- ``sketch_topk_frequent``: heavy hitters via Spark's single-pass
  ``freqItems`` (Karp/Misra-Gries family). The sketch guarantees every
  item with frequency > support appears; the query emits exact counts
  plus that membership verdict, making the approximate structure
  driver-hashable (same pattern as ``sketch_approx_distinct``).
  Sketch state is O(1/support) per partition, merged on the driver —
  independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

# range-join geometry: bands of width 2*BIN overlapping at stride BIN,
# so every band spans exactly two bins and every point matches ≤ 2 bands.
RANGE_BIN = 25
RANGE_N_BANDS = 20

FREQ_SUPPORT = 0.1

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def int_div_sql(num: str, den: str) -> str:
    """SQL for integer division matching DuckDB's ``//`` exactly.

    ADVICE r3 flagged the interpolation quotient as relying on a
    positive-domain fixture to mask a supposed trunc-vs-floor
    divergence. Measurement says otherwise: DuckDB's integer ``//``
    TRUNCATES toward zero (``-7 // 2 = -3``), exactly like Spark's
    ``div`` — there is no divergence to fix, on any sign.
    ``tests/test_rollups.py::test_int_div_matches_duckdb_on_negatives``
    pins that agreement empirically so a semantics change in either
    engine fails loudly instead of silently skewing interpolation.
    """
    return f"({num}) div ({den})"


def _bucket_ntz(col: str, unit_us: int) -> F.Column:
    """Truncate a TIMESTAMP_NTZ column to a unit_us-sized bucket via
    epoch-micros integer arithmetic — session-tz independent (same
    pattern as wf_moving_avg_1h) and, unlike window(), free of injected
    isnotnull filters that would break exchange reuse across branches.
    Timestamps here are post-1970, so ``us % unit`` is non-negative."""
    us = f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})"
    return F.expr(
        f"timestampadd(MICROSECOND, {us} - {us} % {unit_us}, {_NTZ_EPOCH})"
    )


@query(
    "rollup_hypertable",
    oracle="""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS bucket,
             count(*) AS n_events,
             sum(value) AS sv,
             max(value) AS mx
      FROM events GROUP BY 1)
    SELECT 'minute' AS grain, bucket,
           n_events, round(sv, 2) AS total_value, round(mx, 2) AS max_value
    FROM minute
    UNION ALL
    SELECT 'hour', date_trunc('hour', bucket),
           CAST(sum(n_events) AS BIGINT), round(sum(sv), 2), round(max(mx), 2)
    FROM minute GROUP BY 2
    UNION ALL
    SELECT 'day', date_trunc('day', bucket),
           CAST(sum(n_events) AS BIGINT), round(sum(sv), 2), round(max(mx), 2)
    FROM minute GROUP BY 2
    ORDER BY grain, bucket
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute → hour → day continuous-aggregate cascade over events.

    Only the minute grain touches raw rows; hour aggregates minute
    partials and day aggregates hour partials (decomposable aggs:
    count→sum, sum→sum, max→max). The oracle mirrors the cascade from
    the same minute CTE so float summation grouping matches. Rounding
    happens once, at output.
    """
    ev = load_table(spark, sf_dir, "events")
    # Bucketing is epoch-micros arithmetic on TIMESTAMP_NTZ, NOT
    # date_trunc (coerces NTZ to session-tz timestamps — shifts under
    # non-UTC drivers) and NOT window() (NTZ-safe, but it injects an
    # isnotnull filter per nesting level; those push down differently
    # into each union branch's scan, the branches stop being canonically
    # equal, and ReuseExchange dies — three fact-table scans instead of
    # one). Pure arithmetic keeps all three minute-subtrees identical,
    # so the single minute shuffle is reused (pinned in test_rollups).
    minute = ev.groupBy(_bucket_ntz("ts", 60_000_000).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sv"),
        F.max("value").alias("mx"),
    )
    hour = minute.groupBy(_bucket_ntz("bucket", 3_600_000_000).alias("bucket")).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sv").alias("sv"),
        F.max("mx").alias("mx"),
    )
    day = hour.groupBy(_bucket_ntz("bucket", 86_400_000_000).alias("bucket")).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sv").alias("sv"),
        F.max("mx").alias("mx"),
    )

    def face(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "n_events",
            F.round("sv", 2).alias("total_value"),
            F.round("mx", 2).alias("max_value"),
        )

    return (
        face(minute, "minute")
        .unionByName(face(hour, "hour"))
        .unionByName(face(day, "day"))
        .orderBy("grain", "bucket")
    )


@query(
    "join_range_binned",
    oracle=f"""
    WITH bands AS (
      SELECT band_id,
             band_id * {RANGE_BIN} AS lo,
             band_id * {RANGE_BIN} + {2 * RANGE_BIN} AS hi
      FROM range({RANGE_N_BANDS}) t(band_id))
    SELECT b.band_id,
           count(*) AS n_events,
           round(avg(e.value), 4) AS avg_value,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1 ORDER BY band_id
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join, executed as a binned equi-join.

    Bands are half-open ``[25·b, 25·b + 50)`` — overlapping, stride 25 —
    so integer endpoints keep double comparisons bit-identical across
    engines. Each band explodes to the two width-25 bins it overlaps;
    each event maps to ``floor(value/25)``; the join is a plain hash
    join on ``bin`` plus the exact residual predicate. Here the band
    side is tiny (broadcast); at scale BOTH sides stay shuffle-
    partitionable on ``bin``, which a BETWEEN theta-join is not.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bin", F.floor(F.col("value") / RANGE_BIN).cast("bigint")
    )
    bands = spark.range(RANGE_N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * RANGE_BIN).cast("double").alias("lo"),
        (F.col("id") * RANGE_BIN + 2 * RANGE_BIN).cast("double").alias("hi"),
    )
    band_bins = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(F.array(F.col("band_id"), F.col("band_id") + 1)).alias("bin"),
    )
    return (
        ev.join(F.broadcast(band_bins), "bin")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("band_id")
    )


@query(
    "sketch_topk_frequent",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           count(*) > {FREQ_SUPPORT} * (SELECT count(*) FROM events) AS above_support,
           true AS in_sketch
    FROM events GROUP BY 1
    HAVING count(*) > {FREQ_SUPPORT} * (SELECT count(*) FROM events)
    ORDER BY n DESC, event_type
    """,
)
def sketch_topk_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: single-pass ``freqItems`` sketch, verified against
    exact counts and emitted as a deterministic verdict.

    ``freqItems(support)`` guarantees a SUPERSET of the items with
    frequency > support (it may also return lighter items, which are
    partition-layout dependent) — so the hashable output is restricted
    to the rows where the guarantee is deterministic: items above
    support, each carrying ``in_sketch`` (always true iff the sketch
    honors its contract). Sketch size is O(1/support); only that
    bounded list reaches the driver.
    """
    ev = load_table(spark, sf_dir, "events")
    sketch_row = ev.stat.freqItems(["event_type"], FREQ_SUPPORT).first()
    hits = [x for x in (sketch_row[0] or []) if x is not None] if sketch_row else []
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # corpus total re-aggregated from the group counts (every row lands in
    # exactly one group), so the fact table scans once, not twice
    total = counts.agg(F.sum("n").alias("tot"))
    above = F.col("n") > FREQ_SUPPORT * F.col("tot")
    in_sketch = (
        F.col("event_type").isin(hits) if hits else F.lit(False)
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(above)
        .select(
            "event_type",
            "n",
            above.alias("above_support"),
            in_sketch.alias("in_sketch"),
        )
        .orderBy(F.desc("n"), "event_type")
    )


# ---------------------------------------------------------------------------
# gap-filling + last-observation-carried-forward
# ---------------------------------------------------------------------------

GAPFILL_START = "2024-01-01 00:00:00"
GAPFILL_END = "2024-01-08 00:00:00"  #: first week — bounds the spine


def _gapfill_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per dense-spine slot, WITHOUT materializing a spine or
    joining it back: each observed bucket carries its successor's
    (value, hour) via one ``lead()`` window, then explodes the hours up
    to (not including) that successor. The union of [t, next_t) half-
    open segments over a user's observations is exactly the closed
    dense range [min bucket, max bucket] the spine-join produced — but
    the anchors every filled slot needs arrive ON the row (the segment
    endpoints), so no ignorenulls scan-back windows and no
    (user, bucket)-keyed join remain in the plan. Columns:

      user_id, tt (slot hour), t/v/v_e2 (left anchor = the observation
      opening the segment; ``v_e2`` is the decimal-exact bucket sum
      ×100 — deriving it from the double would re-introduce float
      truncation), nv/nt (right anchor, NULL only on each user's last
      observation, whose segment is the single observed slot).

    Scale shape: one groupBy shuffle + one user-partitioned lead window
    over OBSERVED rows only; the explode is map-side and emits exactly
    the output relation (spine-sized). The spine-join form paid a
    second (user, bucket) shuffle on the spine-sized relation plus four
    unbounded-frame ignorenulls windows over it."""
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit(GAPFILL_START).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(GAPFILL_END).cast("timestamp_ntz"))
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("user_id", _bucket_ntz("ts", 3_600_000_000).alias("bucket"), "value")
    )
    sum_dec = F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
    actual = ev.groupBy("user_id", "bucket").agg(
        sum_dec.cast("double").alias("v"),
        (sum_dec * 100).cast("bigint").alias("v_e2"),
    ).withColumn(
        "t",
        F.expr("timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', bucket)"),
    )
    w = Window.partitionBy("user_id").orderBy("t")
    seg = actual.withColumn("nv", F.lead("v_e2").over(w)).withColumn(
        "nt", F.lead("t").over(w)
    )
    return seg.select(
        "user_id",
        "t",
        "v",
        "v_e2",
        "nv",
        "nt",
        F.explode(
            F.sequence(F.col("t"), F.coalesce(F.col("nt") - 1, F.col("t")))
        ).alias("tt"),
    )


def _slot_bucket() -> F.Column:
    """The slot hour index back to its TIMESTAMP_NTZ bucket."""
    return F.expr(
        "timestampadd(HOUR, tt, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("bucket")


@query(
    "rollup_gapfill_locf",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value
      FROM events
      WHERE ts >= TIMESTAMP '{GAPFILL_START}' AND ts < TIMESTAMP '{GAPFILL_END}'
        AND user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
    actual AS (
      SELECT user_id, bucket,
             CAST(round(sum(value::DECIMAL(18,6)), 2) AS DOUBLE) AS v
      FROM ev GROUP BY 1, 2),
    rng AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM actual GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM rng),
    j AS (
      SELECT s.user_id, s.bucket, a.v
      FROM spine s LEFT JOIN actual a USING (user_id, bucket))
    SELECT user_id, bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS filled
    FROM j ORDER BY user_id, bucket
    """,
)
def rollup_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled series with last-observation-carried-forward.

    The TimescaleDB ``time_bucket_gapfill + locf`` capability: a dense
    per-user hourly spine over the user's own active range, observed
    buckets carry their (decimal-exact) hourly sum, missing buckets are
    filled from the last observation and flagged.

    Scale shape (segment explode, round 5): gaps fill from their
    segment's LEFT ANCHOR directly — ``_gapfill_segments`` puts the
    last observation on every slot row, so the carried value is a
    map-side CASE, not an ignorenulls scan-back window over the dense
    spine. Dense slots are generated per user from that user's own
    observation segments (never a global calendar × entity cross join);
    the time-range filter pushes to the scan; the only shuffles are the
    hourly groupBy and one lead() window over OBSERVED rows.
    """
    seg = _gapfill_segments(spark, sf_dir)
    return seg.select(
        "user_id",
        _slot_bucket(),
        # the slot's LOCF value IS its segment's opening observation
        F.col("v").alias("value_locf"),
        F.when(F.col("tt") == F.col("t"), F.lit(0)).otherwise(F.lit(1)).alias("filled"),
    ).orderBy("user_id", "bucket")


@query(
    "rollup_gapfill_interp",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value
      FROM events
      WHERE ts >= TIMESTAMP '{GAPFILL_START}' AND ts < TIMESTAMP '{GAPFILL_END}'
        AND user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
    actual AS (
      SELECT user_id, bucket,
             (round(sum(value::DECIMAL(18,6)), 2) * 100)::BIGINT AS v_e2
      FROM ev GROUP BY 1, 2),
    rng AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM actual GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM rng),
    j AS (
      SELECT s.user_id, s.bucket,
             date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', s.bucket) AS t,
             a.v_e2
      FROM spine s LEFT JOIN actual a USING (user_id, bucket)),
    anchored AS (
      SELECT user_id, bucket, t, v_e2,
             last_value(v_e2 IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v_e2 IS NOT NULL THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v_e2 IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v_e2 IS NOT NULL THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j)
    SELECT user_id, bucket,
           (CASE WHEN v_e2 IS NOT NULL THEN v_e2
                 ELSE (pv * (nt - t) + nv * (t - pt)) // (nt - pt) END) / 100.0
             AS value_interp,
           CASE WHEN v_e2 IS NULL THEN 1 ELSE 0 END AS filled
    FROM anchored ORDER BY user_id, bucket
    """,
)
def rollup_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with LINEAR interpolation between observations
    (TimescaleDB ``interpolate()``) — the LOCF sibling for gauges that
    drift rather than hold.

    Interpolated value = time-weighted blend of the two anchoring
    observations, computed entirely in scaled integers. Division is
    trunc-toward-zero on BOTH engines (Spark ``div`` and DuckDB ``//``
    — measured, not assumed; see ``int_div_sql``), so negative gauges
    interpolate identically too (ADVICE r3 closed by pinned test, the
    fixture's positive domain is not load-bearing). The /100.0 at the
    end is one IEEE double division, identical everywhere.

    Scale shape (segment explode, round 5): every filled slot's two
    anchors are its segment's ENDPOINTS, which ``_gapfill_segments``
    delivers on the row — the four unbounded-frame ignorenulls windows
    and the spine join of the first formulation are gone; interior gaps
    always have both anchors because a gap slot only exists inside a
    segment (nt NOT NULL by construction).
    """
    seg = _gapfill_segments(spark, sf_dir)
    interp_e2 = F.when(F.col("tt") == F.col("t"), F.col("v_e2")).otherwise(
        F.expr(int_div_sql("v_e2 * (nt - tt) + nv * (tt - t)", "nt - t"))
    )
    return seg.select(
        "user_id",
        _slot_bucket(),
        (interp_e2 / 100.0).alias("value_interp"),
        F.when(F.col("tt") == F.col("t"), F.lit(0)).otherwise(F.lit(1)).alias("filled"),
    ).orderBy("user_id", "bucket")
