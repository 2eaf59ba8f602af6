"""Similarity search over an embedding column (array<float>).

Two paths:
- ``ann_cosine_topk`` — brute-force exact top-k: broadcast the query
  block against the corpus, per-partition partial top-k via window.
  Exact baseline; cost |Q| × |corpus|.
- ``ann_lsh_topk`` — random-hyperplane LSH bucketing: 100 TB scale
  path. Hyperplane weights are derived deterministically from md5, so
  results are reproducible run-to-run (no RNG state); buckets shrink
  the candidate set before exact re-scoring. Approximate → validated
  by a recall test against the brute-force baseline, not a SQL oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_realtime_data_warehouse_spark.operators.dedup import cosine_expr
from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

TOPK = 5
N_QUERIES = 10  #: queries() demo uses vec_id < N_QUERIES as the query block
LSH_TABLES = 10  #: independent hash tables (recall amplification)
LSH_ROWS = 5  #: hyperplanes per table (precision per bucket)
EMBED_DIM = 64


_ANN_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(qv, x -> x * x)))
              * sqrt(list_sum(list_transform(e.v, x -> x * x)))) AS cs
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, round(cs, 3) AS cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cs, 3) DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
WHERE rank <= {TOPK} ORDER BY query_id, rank
"""


@query("ann_cosine_topk", oracle=_ANN_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a block of query vectors.

    The query block is broadcast (small side); ranking is a window over
    query_id — ties broken on rounded similarity then neighbor_id so the
    result is fully deterministic.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(queries_df), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(n_planes: int, dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(plane:dim) — no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_table_buckets(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """array of LSH_TABLES bucket ids — table t uses planes [t*ROWS, (t+1)*ROWS)."""
    buckets = []
    for t in range(LSH_TABLES):
        bucket = F.lit(0).cast("bigint")
        for i, plane in enumerate(planes[t * LSH_ROWS : (t + 1) * LSH_ROWS]):
            w = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(F.zip_with(vec, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
            bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        buckets.append(bucket)
    return F.array(*buckets)


@query("ann_lsh_topk")  # approximate — validated by recall test, no SQL oracle
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k (the scale path).

    Random-hyperplane LSH with L=10 independent tables of 5 sign bits:
    a neighbor is a candidate if it shares a bucket in ANY table
    (recall amplification — a single fine table collapses recall for
    mid-range cosines). Candidates are exact-re-scored and ranked.
    At 100 TB (table, bucket) becomes the partition key: each query
    probes L partitions instead of scanning the corpus. Recall vs the
    brute-force baseline is pinned in tests/test_similarity_dedup.py.
    """
    planes = _hyperplanes(LSH_TABLES * LSH_ROWS)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("buckets", lsh_table_buckets(F.col("v"), planes))
    corpus = bucketed.select(
        "vec_id", "v", F.posexplode("buckets").alias("table_id", "bucket")
    )
    queries_df = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    candidates = (
        corpus.join(
            F.broadcast(queries_df),
            (F.col("table_id") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
        .dropDuplicates(["query_id", "neighbor_id"])  # union over tables
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )
