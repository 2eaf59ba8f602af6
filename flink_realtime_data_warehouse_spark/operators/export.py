"""Training-export operators: behavioral sequence serialization and
temporal train/test splitting with an embargo gap.

Both are export-side bookkeeping a training pipeline runs after
curation: turning the event log into model-consumable sequences, and
cutting time-ordered data so the test period cannot leak into training
(the temporal sibling of the near-dup-aware ``split_leakage_safe``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

SEQ_MAX_EVENTS = 64  #: context-length cap per exported user sequence

_SEQ_ORACLE = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id, CAST(max(n_events) AS BIGINT) AS n_events,
       coalesce(string_agg(event_type, '>' ORDER BY rn), '') AS seq
FROM r WHERE rn <= {SEQ_MAX_EVENTS} GROUP BY user_id ORDER BY user_id
"""


@query("export_user_event_sequences", oracle=_SEQ_ORACLE)
def export_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-sequence export: each user's event types in strict
    (ts, event_id) order serialized as one ``a>b>c`` string, capped at
    the first ``SEQ_MAX_EVENTS`` events (the context-length budget),
    with the user's TOTAL event count carried for truncation auditing.

    Design for 100 TB: ONE shuffle keyed by user — the rank and the
    total-count windows share the same partitioning, the cap filter
    drops everything past the context budget BEFORE any list is
    materialized (no unbounded per-user collect), and the final
    aggregation reuses the window's hash partitioning, so Catalyst
    plans no second exchange. Per-group state is bounded by the cap,
    not by the heaviest user's history.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_order).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_events"),
    )
    return (
        ranked.filter(F.col("rn") <= SEQ_MAX_EVENTS)
        .groupBy("user_id")
        .agg(
            F.max("n_events").cast("bigint").alias("n_events"),
            F.concat_ws(
                ">",
                F.expr(
                    "transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"
                ),
            ).alias("seq"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# temporal split with embargo
# ---------------------------------------------------------------------------

EMBARGO_TRAIN_PCT = 70  #: train period ends at this % of the time range
EMBARGO_TEST_PCT = 75  #: test period starts here — the 5% between is embargoed

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

_TEMPORAL_ORACLE = f"""
WITH b AS (SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events),
c AS (
  SELECT lo + ((hi - lo) * {EMBARGO_TRAIN_PCT}) // 100 AS cut_lo,
         lo + ((hi - lo) * {EMBARGO_TEST_PCT}) // 100 AS cut_hi
  FROM b)
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(e.ts) < c.cut_lo THEN 'train'
            WHEN epoch_us(e.ts) >= c.cut_hi THEN 'test'
            ELSE 'embargo' END AS split
FROM events e CROSS JOIN c
ORDER BY e.event_id
"""


@query("split_temporal_embargo", oracle=_TEMPORAL_ORACLE)
def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an embargo gap: train is the
    first 70% of the event time range, test the last 25%, and the 5%
    between is EXCLUDED — no training example's forward-looking
    features can overlap the test period (the standard time-series
    leakage guard; the temporal sibling of ``split_leakage_safe``).

    Cutoffs are derived in integer epoch-microseconds (exact on both
    engines, and tz-proof because the NTZ wall clock never routes
    through a session zone). One scan computes the min/max bounds, the
    two cutoffs broadcast as a 1-row relation, and assignment is a
    map-only CASE — at 100 TB this is a metadata-cheap full-scan label
    pass, and the bounds agg prunes to parquet footer statistics.
    """
    ev = load_table(spark, sf_dir, "events")

    def us(c: str) -> F.Column:
        return F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), F.expr(c))

    bounds = ev.agg(
        us("min(ts)").alias("lo"), us("max(ts)").alias("hi")
    )
    cuts = bounds.select(
        F.expr(f"lo + ((hi - lo) * {EMBARGO_TRAIN_PCT}) div 100").alias("cut_lo"),
        F.expr(f"lo + ((hi - lo) * {EMBARGO_TEST_PCT}) div 100").alias("cut_hi"),
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .select(
            "event_id",
            "user_id",
            F.when(us("ts") < F.col("cut_lo"), "train")
            .when(us("ts") >= F.col("cut_hi"), "test")
            .otherwise("embargo")
            .alias("split"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# deterministic corpus shuffle → training shards
# ---------------------------------------------------------------------------

N_SHARDS = 8  #: export shard count (one file/prefix per shard downstream)
_SHARD_BUCKETS = 256  #: md5-rank prefix buckets for the per-shard prefix-sum


_SHUFFLE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rk
  FROM documents WHERE doc_id IS NOT NULL)
SELECT doc_id,
       ('0x' || substr(rk, 1, 15))::BIGINT % {N_SHARDS} AS shard,
       CAST(row_number() OVER (
         PARTITION BY ('0x' || substr(rk, 1, 15))::BIGINT % {N_SHARDS}
         ORDER BY rk, doc_id) - 1 AS BIGINT) AS pos
FROM r ORDER BY shard, pos
"""


@query("export_shuffled_shards", oracle=_SHUFFLE_ORACLE)
def export_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into training shards — the
    step between curation and the data loader: every epoch-0 batch
    stream needs the corpus in a reproducible pseudorandom order,
    sharded so loaders can read in parallel. Shard and within-shard
    position both derive from ``md5(doc_id)``, so the permutation is a
    pure function of the data (re-runs, retries, and other engines
    agree byte-for-byte — the oracle IS the proof).

    Design for 100 TB: the naive plan is a global ORDER BY hash — an
    all-data range sort whose skew is invisible until the last stage.
    Here position is computed with the same two-pass prefix-sum as
    ``assign_stable_ids`` but GROUPED: the md5 rank's first byte gives
    {_SHARD_BUCKETS} perfectly uniform buckets per shard (hash output,
    so equal-width really is equal-mass), the (shard, bucket) counts
    collect as ≤ {N_SHARDS}×{_SHARD_BUCKETS} scalars, and each window
    sorts only one bucket's rows — {N_SHARDS}×{_SHARD_BUCKETS}-way
    parallel, no single-reducer funnel anywhere. The export writer then
    partitions by shard and sorts within partitions by the same rank.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    r = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("rk")
    ).select(
        "doc_id",
        "rk",
        F.expr(
            f"CAST(conv(substring(rk, 1, 15), 16, 10) AS BIGINT) % {N_SHARDS}"
        ).alias("shard"),
        F.expr("CAST(conv(substring(rk, 1, 2), 16, 10) AS INT)").alias("_bkt"),
    )
    counts = {
        (row["shard"], row["_bkt"]): row["cnt"]
        for row in r.groupBy("shard", "_bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = []
    for s in range(N_SHARDS):
        acc = 0
        for b in range(_SHARD_BUCKETS):
            offsets.append((s, b, acc))
            acc += counts.get((s, b), 0)
    off_df = spark.createDataFrame(offsets, "shard long, _bkt int, _off long")
    w = Window.partitionBy("shard", "_bkt").orderBy("rk", "doc_id")
    return (
        r.join(F.broadcast(off_df), ["shard", "_bkt"])
        .select(
            "doc_id",
            "shard",
            (F.col("_off") + F.row_number().over(w) - F.lit(1))
            .cast("bigint")
            .alias("pos"),
        )
        .orderBy("shard", "pos")
    )
