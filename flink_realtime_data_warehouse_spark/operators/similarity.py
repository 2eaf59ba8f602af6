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


_SCORED_SCHEMA = "query_id bigint, neighbor_id bigint, cos_sim double"


def _score_against_queries(spark: SparkSession, emb: DataFrame, queries_pdf) -> DataFrame:
    """Stream the corpus through a NumPy block kernel scoring every row
    against the broadcast query block; emits (query_id, neighbor_id, cos)."""
    import numpy as np

    q_ids = queries_pdf["vec_id"].to_numpy()
    q_mat = np.stack(queries_pdf["v"].to_numpy())
    q_n = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_n))

    def _score(batches):
        import pandas as pd

        ids_q, qn = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            block = np.stack(pdf["v"].to_numpy())
            block_n = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block_n @ qn.T, 3)  # (batch, n_queries)
            rows_i, cols_j = np.nonzero(ids[:, None] != ids_q[None, :])
            yield pd.DataFrame(
                {
                    "query_id": ids_q[cols_j],
                    "neighbor_id": ids[rows_i],
                    "cos_sim": sims[rows_i, cols_j],
                }
            )

    return emb.mapInPandas(_score, schema=_SCORED_SCHEMA)


@query("ann_cosine_topk", oracle=_ANN_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a block of query vectors.

    The query block is broadcast as a normalized NumPy matrix; the
    corpus streams through an Arrow-batched matmul (payload vectors
    never shuffle — only (query, neighbor, score) triples do). Ranking
    is a window over query_id with rounded-score + neighbor_id
    tie-breaks, so results are fully deterministic.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries_pdf = emb.filter(F.col("vec_id") < N_QUERIES).toPandas()
    scored = _score_against_queries(spark, emb, queries_pdf)
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


def _make_bucket_matrix(n_tables: int, n_rows: int):
    """Build the bucket-id kernel as a standalone closure.

    Returned function is self-contained (no references to this module),
    so cloudpickle ships it BY VALUE to executors — the worker Python
    processes of a driver-created session cannot import this package.
    """

    def bucket_matrix(mat, planes):
        import numpy as np

        proj = mat @ planes.T > 0  # (n, L*ROWS) booleans
        weights = np.array([1 << i for i in range(n_rows)])
        return np.stack(
            [proj[:, t * n_rows : (t + 1) * n_rows] @ weights for t in range(n_tables)],
            axis=1,
        )

    return bucket_matrix


_bucket_matrix = _make_bucket_matrix(LSH_TABLES, LSH_ROWS)


@query("ann_lsh_topk")  # approximate — validated by recall test, no SQL oracle
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k (the scale path).

    Random-hyperplane LSH with L=10 independent tables of 5 sign bits:
    a neighbor is a candidate if it shares a bucket in ANY table
    (recall amplification — a single fine table collapses recall for
    mid-range cosines). Candidates are exact-re-scored, all inside one
    NumPy block kernel per Arrow batch. At 100 TB (table, bucket)
    becomes the partition key: each query probes L partitions instead
    of scanning the corpus. Recall vs the brute-force baseline is
    pinned in tests/test_similarity_dedup.py.
    """
    import numpy as np

    planes = np.array(_hyperplanes(LSH_TABLES * LSH_ROWS))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries_pdf = emb.filter(F.col("vec_id") < N_QUERIES).toPandas()
    q_ids = queries_pdf["vec_id"].to_numpy()
    q_mat = np.stack(queries_pdf["v"].to_numpy())
    q_n = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_buckets = _bucket_matrix(q_mat, planes)  # (nq, L)
    bc = spark.sparkContext.broadcast((q_ids, q_n, q_buckets, planes))

    bucket_matrix = _make_bucket_matrix(LSH_TABLES, LSH_ROWS)

    def _probe(batches):
        import pandas as pd

        ids_q, qn, qb, pl = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            block = np.stack(pdf["v"].to_numpy())
            bb = bucket_matrix(block, pl)  # (batch, L)
            # candidate iff any table's bucket matches: (batch, nq)
            cand = (bb[:, None, :] == qb[None, :, :]).any(axis=2)
            cand &= ids[:, None] != ids_q[None, :]
            block_n = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block_n @ qn.T, 3)
            rows_i, cols_j = np.nonzero(cand)
            yield pd.DataFrame(
                {
                    "query_id": ids_q[cols_j],
                    "neighbor_id": ids[rows_i],
                    "cos_sim": sims[rows_i, cols_j],
                }
            )

    scored = emb.mapInPandas(_probe, schema=_SCORED_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )
