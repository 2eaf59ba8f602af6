"""Time-series similarity search over per-user activity series —
sorted-neighborhood blocking, never all-pairs (pattern from the
distributed time-series similarity literature, e.g. EDBT 2019's
streaming series similarity; the blocking is the classic
sorted-neighborhood method, justified here by an exact metric bound).

The corpus: each user's hourly activity-value series from the events
fact table, kept SPARSE (one row per active (user, hour) — a 100 TB
event log never materializes dense per-entity vectors). Similarity is
exact L1 distance on the integer-quantized series. Candidates come
from a 1-D projection: ``L1(a, b) >= |total_a - total_b|`` (reverse
triangle inequality on the mass), so genuinely-similar pairs sit close
in total-mass order — each user is compared only to its K neighbors in
that order, giving n·K candidates instead of n²/2. A shape signature
would be the orthogonal refinement, but collapses when the population
shares one shape (measured: the uniform fixture put 1500 users in one
block); the mass projection cannot collapse because it blocks on the
quantity the distance itself bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

TS_TOPK = 10
TS_NEIGHBORS = 8  #: sorted-neighborhood window in total-mass order

#: fixed grid anchor (any constant works — hour indices may go negative)
_ANCHOR = "1970-01-01 00:00:00"

_TS_ORACLE = f"""
WITH hs AS (
  SELECT user_id,
         date_diff('hour', TIMESTAMP '{_ANCHOR}', date_trunc('hour', ts)) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT user_id, sum(v) AS total,
         row_number() OVER (ORDER BY sum(v), user_id) AS rn
  FROM hs GROUP BY 1),
cand AS (
  SELECT least(a.user_id, b.user_id) AS ua, greatest(a.user_id, b.user_id) AS ub
  FROM tot a JOIN tot b ON b.rn > a.rn AND b.rn <= a.rn + {TS_NEIGHBORS}),
signed AS (
  SELECT c.ua, c.ub, hs.h, hs.v AS d FROM cand c JOIN hs ON hs.user_id = c.ua
  UNION ALL
  SELECT c.ua, c.ub, hs.h, -hs.v AS d FROM cand c JOIN hs ON hs.user_id = c.ub),
diffs AS (
  SELECT ua, ub, h, sum(d) AS dh FROM signed GROUP BY 1, 2, 3),
dist AS (
  SELECT ua, ub, CAST(sum(abs(dh)) AS BIGINT) AS l1_e2 FROM diffs GROUP BY 1, 2)
SELECT ua, ub, l1_e2,
       CAST(row_number() OVER (ORDER BY l1_e2, ua, ub) AS BIGINT) AS rnk
FROM dist ORDER BY l1_e2, ua, ub LIMIT {TS_TOPK}
"""


@query("ts_similarity_pairs", oracle=_TS_ORACLE)
def ts_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-similar user pairs by exact L1 distance between their
    hourly activity series.

    Pipeline: (1) sparse hourly series — value quantized to integer
    cents BEFORE summing, so every aggregate is order-independent and
    engine-exact (a double sum here would flip rounding boundaries
    between engines); (2) sorted-neighborhood candidates — each user
    vs its ``TS_NEIGHBORS`` successors in total-mass order, sound
    because ``L1 >= |Δtotal|`` puts similar pairs adjacent in that
    projection; (3) exact L1 via a signed union (a-side +v, b-side −v)
    aggregated per (pair, hour) then per pair — sparse alignment
    without a dense grid or a per-pair full-outer join.

    Design for 100 TB: the series stays sparse end-to-end; candidates
    are n·K, not n²; the heavy stage shuffles (pair, hour) keys whose
    volume is candidates × per-user active hours. The rank window runs
    over the |users|-row totals relation (entity-level, tiny relative
    to the fact table; at extreme entity counts substitute
    range-partition banding on total for the global rank — the bound
    argument is unchanged). Final top-k is a TakeOrdered, not a global
    sort.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = F.expr(f"TIMESTAMP_NTZ '{_ANCHOR}'")
    # NULL user_id must not form a phantom series: least/greatest over a
    # (NULL, u) candidate both collapse to u, minting a degenerate (u,u)
    # pair with L1 = 0 that seizes rank 1 (same guard as the PageRank
    # edge scan); NULL values are dropped so no user's total can go NULL
    # and hit the Spark-vs-DuckDB NULL-ordering divergence in the rank
    ev = ev.filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
    hs = (
        ev.select(
            "user_id",
            F.timestamp_diff("HOUR", anchor, F.date_trunc("hour", "ts")).alias("h"),
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
        .groupBy("user_id", "h")
        .agg(F.sum("vc").alias("v"))
    )
    tot = (
        hs.groupBy("user_id")
        .agg(F.sum("v").alias("total"))
        .withColumn("rn", F.row_number().over(Window.orderBy("total", "user_id")))
    )
    a, b = tot.alias("a"), tot.alias("b")
    cand = (
        a.join(
            F.broadcast(b),
            (F.col("b.rn") > F.col("a.rn"))
            & (F.col("b.rn") <= F.col("a.rn") + TS_NEIGHBORS),
        )
        .select(
            F.least("a.user_id", "b.user_id").alias("ua"),
            F.greatest("a.user_id", "b.user_id").alias("ub"),
        )
    )
    hs_a = hs.withColumnRenamed("user_id", "ua")
    hs_b = hs.withColumnRenamed("user_id", "ub")
    signed = cand.join(hs_a, "ua").select(
        "ua", "ub", "h", F.col("v").alias("d")
    ).unionByName(
        cand.join(hs_b, "ub").select("ua", "ub", "h", (-F.col("v")).alias("d"))
    )
    dist = (
        signed.groupBy("ua", "ub", "h")
        .agg(F.sum("d").alias("dh"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.abs("dh")).cast("bigint").alias("l1_e2"))
    )
    w_rank = Window.orderBy("l1_e2", "ua", "ub")
    return (
        dist.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= TS_TOPK)
        .orderBy("l1_e2", "ua", "ub")
    )
