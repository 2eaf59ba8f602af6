"""Dirty-embeddings PARITY tier (round-5 hardening): NULL, ragged
(wrong-dim), and zero-norm vectors are definitionally not similarity
candidates — at 100 TB a single such row must neither abort the job
(np.stack on a ragged batch) nor poison verdicts (a zero-norm vector
normalizes to NaN, and NaN's "largest double" comparison semantics
would out-rank every real neighbor / flag an entire corpus as
contaminated). Both engines must exclude the same rows: the Spark side
rides ``_load_emb``'s guard, every vector-math oracle filters its
embeddings CTE with the shared ``EMB_CLEAN_SQL`` predicate, and this
tier hash-checks the whole embedding family against its oracles on a
corpus with all three dirt classes planted."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

_TABLES_PASSTHROUGH = (
    "region nation customer supplier part orders lineitem events documents"
).split()

#: every registry query whose plan does vector math over `embeddings`
_EMBEDDING_FAMILY = [
    "dedup_embedding_pairs",
    "dedup_semantic_groups",
    "ann_cosine_topk",
    "ann_hard_negatives",
    "ann_lsh_topk_checked",
    "ann_ivf_topk_checked",
    "ann_ivf_streaming_ingest_checked",
    "ann_pq_topk_checked",
    "search_hybrid_rrf",
    "decontam_semantic_overlap",
]


@pytest.fixture(scope="module")
def dirty_emb_sf_dir(tmp_path_factory, sf_dir):
    """sf0.001 with all FIVE dirt classes planted in `embeddings`:
    ragged (vec_id % 101 == 5 → 3 elements), zero-norm
    (vec_id % 103 == 7), NULL row (vec_id % 107 == 9), NULL element
    (vec_id % 109 == 11 — DuckDB's list_sum IGNORES it while Spark's
    fold propagates, the exact divergence EMB_CLEAN_SQL's no-NULL-
    element clause closes), NaN element (vec_id % 113 == 13 — passes a
    plain sumsq > 0 on BOTH engines, then NumPy NaN >= thr is False
    while SQL NaN >= thr is True). ~5% of rows, including vec_ids
    5/7/9 inside the ANN query block, so the query side of every
    operator is exercised too."""
    d = tmp_path_factory.mktemp("dirty_emb_sf")
    for t in _TABLES_PASSTHROUGH:
        duckdb.sql(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    duckdb.sql(
        f"""COPY (SELECT vec_id,
        CASE WHEN vec_id % 107 = 9 THEN NULL
             WHEN vec_id % 101 = 5 THEN embedding[1:3]
             WHEN vec_id % 103 = 7 THEN list_transform(embedding, x -> 0.0::FLOAT)
             WHEN vec_id % 109 = 11
               THEN embedding[1:4] || [NULL::FLOAT] || embedding[6:64]
             WHEN vec_id % 113 = 13
               THEN embedding[1:2] || ['NaN'::FLOAT] || embedding[4:64]
             ELSE embedding END AS embedding,
        label
        FROM '{sf_dir}/embeddings.parquet')
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    return str(d)


@pytest.mark.parametrize("name", _EMBEDDING_FAMILY)
def test_dirty_embeddings_parity(spark, dirty_emb_sf_dir, name):
    from tests.oracle_utils import compare_query_to_oracle

    df = entrymod.queries()[name](spark, dirty_emb_sf_dir)
    compare_query_to_oracle(
        df, entrymod.oracle_sql()[name], dirty_emb_sf_dir
    )


def test_dirty_rows_are_actually_planted(dirty_emb_sf_dir):
    """Guard the fixture itself: all five dirt classes present."""
    n = duckdb.sql(
        f"""SELECT
        sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END),
        sum(CASE WHEN len(embedding) = 3 THEN 1 ELSE 0 END),
        sum(CASE WHEN len(embedding) = 64
                  AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) = 0
             THEN 1 ELSE 0 END),
        sum(CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
             THEN 1 ELSE 0 END),
        sum(CASE WHEN NOT isfinite(
                  list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
             THEN 1 ELSE 0 END)
        FROM '{dirty_emb_sf_dir}/embeddings.parquet'"""
    ).fetchone()
    assert all(v and v > 0 for v in n), n
