"""Full-text retrieval over the documents corpus: Okapi BM25 top-k.

A training-data pipeline needs corpus search for inspection, targeted
curation ("show me docs about X"), and retrieval-based eval-set
construction. This module implements the classic sparse path: an
inverted (term -> doc) index with BM25 scoring, expressed as plain
DataFrame aggregations so Catalyst keeps every step in whole-stage
codegen.

Design for 100 TB:
- term frequencies come from one explode restricted to the query
  vocabulary *before* the aggregation shuffle (the filter prunes the
  exploded stream to matching terms, so the shuffle moves only
  |matching (doc, term)| rows, not every word), and the per-doc length
  rides through the explode as a constant recovered by max() in the
  same aggregation — no corpus-sized doc-length join;
- corpus scalars (N, avgdl) cost one extra column-pruned scan (they
  need every doc, matched or not); at a real deployment they are table
  statistics maintained by ingest, not recomputed per query;
- document frequencies derive from the TF table (no second corpus
  scan) and are broadcast back (|query vocabulary| rows);
- corpus scalars (N, avgdl) travel as a 1-row broadcast cross join —
  the same decorrelation shape as the TPC-H scalar subqueries;
- per-term score contributions are quantized to integers (1e-6) and
  summed as BIGINT, so the per-(query, doc) sum is exact and
  independent of float summation order — bit-identical across engines
  and across partitionings;
- the final top-k is a per-query window over only scored candidates.

Reference parity: the reference engine has no retrieval surface; this
extends the LLM-data-pipeline operator family (SURVEY.md "beyond the
reference" §2 footer) alongside TF-IDF keyword extraction
(textops.py::text_tfidf_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.similarity import EMB_CLEAN_SQL
from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

#: the benchmark query set: (query_id, term) pairs. Fixed so the DuckDB
#: oracle can inline the identical relation.
BM25_QUERIES: list[tuple[str, str]] = [
    ("q_stream", "spark"),
    ("q_stream", "stream"),
    ("q_stream", "window"),
    ("q_join", "hash"),
    ("q_join", "join"),
    ("q_join", "merge"),
]

_QUERY_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)

#: shared CTE chain (query terms -> per-doc BM25 ranks) reused by the
#: plain BM25 oracle and the hybrid RRF fusion oracle
_BM25_RANKED_CTE = f"""qt(query_id, term) AS (VALUES {_QUERY_VALUES}),
corpus AS (
  SELECT count(*)::DOUBLE AS n,
         avg(len(string_split(text, ' ')))::DOUBLE AS avgdl
  FROM documents),
dl AS (
  SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents),
w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM w
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
contrib AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (corpus.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / corpus.avgdl))
           * 1000000.0) AS BIGINT) AS c_e6
  FROM tf
  JOIN qt USING (term)
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus),
scored AS (
  SELECT query_id, doc_id, sum(c_e6) AS score_e6
  FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, CAST(score_e6 AS BIGINT) AS score_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_e6 DESC, doc_id) AS rnk
  FROM scored)"""

_BM25_ORACLE = f"""
WITH {_BM25_RANKED_CTE}
SELECT query_id, doc_id, score_e6, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {BM25_TOPK}
ORDER BY query_id, rnk
"""


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """Okapi BM25 top-k documents per query over ``docs(doc_id, text)``.

    ``queries`` is (query_id, term) pairs. Returns
    (query_id, doc_id, score_e6, rnk) with the score quantized to 1e-6
    and summed in exact integer arithmetic.
    """
    qt = spark.createDataFrame(queries, "query_id string, term string")
    vocab = sorted({t for _, t in queries})

    corpus = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    # carry the doc length THROUGH the explode so tf never needs a
    # corpus-sized join back to a doc-length table: dl is constant per
    # doc, so max() over the (doc, term) group recovers it for free
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    words = ws.select(
        "doc_id",
        F.size("ws").cast("double").alias("dl"),
        F.explode("ws").alias("term"),
    ).filter(F.col("term").isin(vocab))
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.max("dl").alias("dl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("c_e6"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_e6").alias("score_e6")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e6"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "doc_id", F.col("score_e6").cast("bigint"), "rnk")
        .orderBy("query_id", "rnk")
    )


@query("search_bm25_topk", oracle=_BM25_ORACLE)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval benchmark entry: the fixed two-query set over the
    documents corpus. See module docstring for the 100 TB shuffle
    budget."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(spark, docs, BM25_QUERIES)


# ---------------------------------------------------------------------------
# hybrid retrieval: sparse (BM25) + dense (embedding cosine) rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60  #: the standard reciprocal-rank-fusion damping constant
HYBRID_TOPK = 10
#: per-query dense anchors: the query's embedding is played by a fixed
#: corpus vector (in production the encoder embeds the query text)
HYBRID_ANCHORS: list[tuple[str, int]] = [("q_stream", 0), ("q_join", 1)]

_ANCHOR_VALUES = ", ".join(f"('{q}', {a})" for q, a in HYBRID_ANCHORS)

_HYBRID_ORACLE = f"""
WITH {_BM25_RANKED_CTE},
sparse AS (
  SELECT query_id, doc_id, rnk AS r_sparse FROM ranked WHERE rnk <= {HYBRID_TOPK}),
anchors(query_id, anchor_id) AS (VALUES {_ANCHOR_VALUES}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {EMB_CLEAN_SQL}),
av AS (SELECT a.query_id, e.v AS av FROM anchors a JOIN e ON e.vec_id = a.anchor_id),
dscore AS (
  SELECT av.query_id, e.vec_id AS doc_id,
         CAST(round(
           list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * av.av[i]))
           / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
              * sqrt(list_sum(list_transform(av.av, x -> x * x))))
           * 1000000.0) AS BIGINT) AS cs_e6
  FROM e CROSS JOIN av),
dense AS (
  SELECT query_id, doc_id, r_dense FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cs_e6 DESC, doc_id) AS r_dense
    FROM dscore)
  WHERE r_dense <= {HYBRID_TOPK}),
fused AS (
  SELECT coalesce(s.query_id, d.query_id) AS query_id,
         coalesce(s.doc_id, d.doc_id) AS doc_id,
         coalesce(1000000 // ({RRF_K} + s.r_sparse), 0)
           + coalesce(1000000 // ({RRF_K} + d.r_dense), 0) AS rrf_e6
  FROM sparse s FULL OUTER JOIN dense d
    ON s.query_id = d.query_id AND s.doc_id = d.doc_id)
SELECT query_id, doc_id, CAST(rrf_e6 AS BIGINT) AS rrf_e6,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT query_id, doc_id, rrf_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_e6 DESC, doc_id) AS rnk
  FROM fused)
WHERE rnk <= {HYBRID_TOPK}
ORDER BY query_id, rnk
"""


@query("search_hybrid_rrf", oracle=_HYBRID_ORACLE)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion: the BM25 lexical
    top-k and an embedding-cosine dense top-k merge per query with
    ``score = Σ 1/(60 + rank)`` (Cormack et al.'s RRF, the standard
    rank-level fusion that needs no score calibration between arms).
    A doc present in only one arm still fuses (outer join; the absent
    arm contributes zero) — realistic, since at corpus scale not every
    document carries an embedding.

    Scale shape: each arm is already a scale-shaped top-k (BM25's
    query-vocabulary-restricted inverted index; the dense arm streams
    the embedding table past a broadcast anchor block — at real scale
    the IVF/PQ probe replaces the linear scan, same contract). Fusion
    itself touches only 2·k rows per query: a per-query outer join and
    a window over ≤ 2·k rows. All scores integer (1e-6 quantized),
    ranking engine-exact.
    """
    from pyspark.sql.window import Window

    from flink_realtime_data_warehouse_spark.operators.dedup import cosine_expr

    docs = load_table(spark, sf_dir, "documents")
    sparse = (
        bm25_topk(spark, docs, BM25_QUERIES, topk=HYBRID_TOPK)
        .select("query_id", "doc_id", F.col("rnk").alias("r_sparse"))
    )
    from flink_realtime_data_warehouse_spark.operators.similarity import _load_emb

    # shared dirty-row guard: a NULL/ragged/zero-norm vector must drop
    # out of BOTH the corpus and the anchor side identically on both
    # engines (round-5 dirty-embeddings hardening)
    emb = _load_emb(spark, sf_dir)
    anchors = spark.createDataFrame(
        HYBRID_ANCHORS, "query_id string, anchor_id bigint"
    )
    av = (
        emb.join(F.broadcast(anchors), emb["vec_id"] == anchors["anchor_id"])
        .select("query_id", F.col("v").alias("av"))
    )
    dscore = emb.crossJoin(F.broadcast(av)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_expr(F.col("v"), F.col("av")) * 1_000_000.0)
        .cast("bigint")
        .alias("cs_e6"),
    )
    w_dense = Window.partitionBy("query_id").orderBy(F.col("cs_e6").desc(), "doc_id")
    dense = (
        dscore.withColumn("r_dense", F.row_number().over(w_dense))
        .filter(F.col("r_dense") <= HYBRID_TOPK)
        .select("query_id", "doc_id", "r_dense")
    )
    fused = (
        sparse.join(dense, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + r_sparse)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + r_dense)"), F.lit(0)
                )
            ).alias("rrf_e6"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.col("rrf_e6").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(w_f))
        .filter(F.col("rnk") <= HYBRID_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.col("rrf_e6").cast("bigint").alias("rrf_e6"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )
