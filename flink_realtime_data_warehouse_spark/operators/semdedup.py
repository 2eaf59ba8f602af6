"""Semantic deduplication (SemDeDup-style): cluster the embedding
space cheaply, find near-duplicate pairs only WITHIN clusters, keep one
representative per connected near-dup group.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540) prune web corpora by
k-means-clustering embeddings and deduplicating within clusters. The
structure that matters at 100 TB is identical here: an O(N²) similarity
problem is made tractable by a cheap partitioner that only co-locates
plausible duplicates, so the quadratic work happens inside small
buckets, each an independent task.

This implementation uses a deterministic sign-bit code (the sign of six
fixed embedding coordinates -> 64 buckets) as the partitioner instead
of trained k-means centroids: the bucketing is then a pure column
expression — SQL-expressible, so the DuckDB oracle can replay the
byte-identical pipeline end-to-end (a trained quantizer is available in
operators/similarity.py::ann_ivf_topk when recall matters more than
replayability; swap `bucket_expr` for its assignment and the rest of
the operator is unchanged).

Pipeline: bucket (map-only) -> ONE bucket-keyed shuffle -> within each
Arrow task: exact pairwise cosine (NumPy) + union-find over the bucket's
threshold graph -> min-id representative emitted directly. The bucket
code PARTITIONS the corpus (every vector has exactly one code), so a
near-dup component can never span buckets — the global connected-
components machinery the first design ran over the pair graph was
provably redundant, and at a 30× measurement corpus it dominated the
wall (~200 s of min-label join rounds over tens of millions of
within-bucket pairs that never needed to leave their task). Output is
|corpus| rows; the pair relation never materializes outside the task.
``semantic_bucket_pairs`` still exposes the explicit pair relation for
diagnostics and the scaling harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.similarity import EMB_CLEAN_SQL
from flink_realtime_data_warehouse_spark.plans.registry import query

SEMDEDUP_COS_THRESHOLD = 0.4  #: within-bucket near-dup cosine cut
#: 1-based embedding coordinates whose signs form the bucket code
SEMDEDUP_SIGN_DIMS = (1, 10, 19, 28, 37, 46)

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN v[{d}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j, d in enumerate(SEMDEDUP_SIGN_DIMS)
)

_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE {EMB_CLEAN_SQL}),
coded AS (
  SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM coded a JOIN coded b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(
      list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 3)
    >= {SEMDEDUP_COS_THRESHOLD}),
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL
  SELECT vec_b AS src, vec_a AS dst FROM pairs),
reach(id, label) AS (
  SELECT vec_id, vec_id FROM e
  UNION
  SELECT edges.src, reach.label FROM edges JOIN reach ON edges.dst = reach.id)
SELECT id AS vec_id, min(label) AS rep_id, min(label) = id AS is_kept
FROM reach GROUP BY id ORDER BY vec_id
"""


def _bucket_col(sign_dims: tuple[int, ...]):
    """The sign-bit bucket code as a pure column expression (the same
    arithmetic the oracle's ``_BUCKET_SQL`` states)."""
    bucket = None
    for j, d in enumerate(sign_dims):
        bit = F.when(F.element_at("v", d) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def semantic_bucket_pairs(
    emb: DataFrame,
    threshold: float,
    sign_dims: tuple[int, ...] = SEMDEDUP_SIGN_DIMS,
) -> DataFrame:
    """Within-bucket exact pairwise cosine pairs >= threshold.

    ``emb`` is (vec_id, v: array<double>). The sign-bit bucket is the
    shuffle key; each bucket's pairwise similarity runs as one NumPy
    matmul inside an Arrow-batched task. Bucket population is ~N/64
    here; at real scale raise the bit count via ``sign_dims`` (or
    substitute the trained IVF assignment) so buckets stay task-sized —
    the operator shape does not change. tools/measure_scaling.py
    measures the knob across a 30× corpus range (SCALING.json →
    exponents): frozen 6-bit comparisons fit exponent 2.00, scaled
    sign bits 1.51 (raw sign bits lose discriminative power on
    correlated dims), and the trained k-means cell assignment 0.91
    with comparisons-per-vector flat — at real scale use the trained
    assignment via ``similarity.two_level_cell_assignment`` (same cell
    budget, √k driver footprint; SCALING.json → quantizer) through
    ``semantic_dedup(bucket_df=…)``.
    """
    coded = emb.select("vec_id", "v", _bucket_col(sign_dims).alias("bucket"))

    thr = threshold

    def _pairs(key, pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, 3)
        ii, jj = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids[jj], "cos_sim": sims[ii, jj]}
        )

    return coded.groupBy("bucket").applyInPandas(
        _pairs, "vec_a bigint, vec_b bigint, cos_sim double"
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_COS_THRESHOLD,
    sign_dims: tuple[int, ...] = SEMDEDUP_SIGN_DIMS,
    bucket_col=None,
    bucket_df: DataFrame | None = None,
) -> DataFrame:
    """Full SemDeDup pass: (vec_id, rep_id, is_kept) for every vector.

    ``is_kept`` marks the minimum-id representative of each within-
    bucket near-dup component; singletons keep themselves. Downstream
    curation joins on ``is_kept`` to drop semantic duplicates.
    ``sign_dims`` is the bucket-partitioner knob — raise the bit count
    with the corpus so bucket populations stay task-sized (the scaling
    harness times exactly this configuration at each corpus scale).
    ``bucket_col`` overrides the sign-bit code with ANY partitioning
    Column over ``(vec_id, v)`` — pass the trained IVF cell assignment
    (the configuration the 100× measurement shows holds comparisons per
    vector flat, SCALING.json → exponents) and the rest of the operator
    is unchanged; the dedup scope is then "within a cell", exactly as
    SemDeDup's paper formulation dedups within k-means clusters.

    One pass: the bucket code partitions the corpus, so the transitive
    near-dup closure is bucket-local by construction — each Arrow task
    computes its bucket's pairwise cosines AND the union-find fixpoint
    over them, emitting (vec_id, rep_id) directly. Equivalent to
    running connected components over ``semantic_bucket_pairs`` (the
    oracle states exactly that recursive closure), without ever
    shuffling a pair relation: per-task work is the same matmul as
    before plus an O(pairs α(n)) union-find, and the operator's output
    is |corpus| rows regardless of how dense a bucket's dup graph is.

    ``bucket_df`` is the DataFrame-shaped partitioner override for
    assignments that aren't expressible as a Column — pass
    ``similarity.two_level_cell_assignment``'s (vec_id, cell) output
    (renamed or not; the second column is taken as the bucket) to run
    the sub-linear-driver trained quantizer; the join is on vec_id and
    the rest of the operator is unchanged.
    """
    if bucket_df is not None:
        b = bucket_df
        bcol = [c for c in b.columns if c != "vec_id"][0]
        coded = emb.join(
            b.select("vec_id", F.col(bcol).alias("bucket")), "vec_id"
        ).select("vec_id", "v", "bucket")
    else:
        if bucket_col is None:
            bucket_col = _bucket_col(sign_dims)
        coded = emb.select("vec_id", "v", bucket_col.alias("bucket"))

    thr = threshold

    def _labels(key, pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if n <= 1:
            return pd.DataFrame({"vec_id": ids, "rep_id": ids})
        m = np.stack(pdf["v"].to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, 3)
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(sims >= thr, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp_min: dict[int, int] = {}
        for pos in range(n):
            r = find(pos)
            v = int(ids[pos])
            if r not in comp_min or v < comp_min[r]:
                comp_min[r] = v
        return pd.DataFrame(
            {"vec_id": ids, "rep_id": [comp_min[find(p)] for p in range(n)]}
        )

    labels = coded.groupBy("bucket").applyInPandas(
        _labels, "vec_id bigint, rep_id bigint"
    )
    return labels.select(
        "vec_id",
        "rep_id",
        (F.col("rep_id") == F.col("vec_id")).alias("is_kept"),
    ).orderBy("vec_id")


@query("dedup_semantic_groups", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark entry: semantic dedup over the embeddings table."""
    from flink_realtime_data_warehouse_spark.operators.similarity import _load_emb

    return semantic_dedup(_load_emb(spark, sf_dir))
