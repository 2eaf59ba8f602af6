"""Planted-case tests for the round-4 operators: BM25 retrieval,
incremental history dedup, semantic dedup, duplicated-span coverage,
and the corpus data card."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_realtime_data_warehouse_spark.operators.dedup import incremental_dedup
from flink_realtime_data_warehouse_spark.operators.retrieval import bm25_topk
from flink_realtime_data_warehouse_spark.operators.semdedup import (
    semantic_bucket_pairs,
    semantic_dedup,
)


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark stream window spark stream filler filler"),
            (2, "spark filler filler filler filler filler filler"),
            (3, "nothing relevant here at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(spark, docs, [("q", "spark"), ("q", "stream")]).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1  # two terms, higher tf
    assert 2 in ids and 3 not in ids  # no-match docs never scored
    assert all(r.score_e6 > 0 for r in out)
    assert [r.rnk for r in out] == list(range(1, len(out) + 1))


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf for the term; the longer doc is penalized by the b term
    docs = spark.createDataFrame(
        [
            (1, "spark " + "pad " * 4),
            (2, "spark " + "pad " * 40),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(spark, docs, [("q", "spark")]).collect()
    assert [r.doc_id for r in out] == [1, 2]


def test_incremental_dedup_statuses(spark):
    history = spark.createDataFrame(
        [("already seen text",)], "text string"
    ).select(F.md5("text").alias("content_hash"))
    incoming = spark.createDataFrame(
        [
            (10, "already seen text"),  # dup_history
            (11, "fresh text a"),  # new
            (12, "fresh text a"),  # dup_batch (11 is first)
            (13, "fresh text b"),  # new
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.status for r in incremental_dedup(incoming, history).collect()}
    assert rows == {10: "dup_history", 11: "new", 12: "dup_batch", 13: "new"}


def test_incremental_dedup_history_beats_batch_order(spark):
    # a digest both in history AND duplicated in-batch is dup_history for
    # every copy — history membership dominates
    history = spark.createDataFrame([("t",)], "text string").select(
        F.md5("text").alias("content_hash")
    )
    incoming = spark.createDataFrame(
        [(1, "t"), (2, "t")], "doc_id long, text string"
    )
    statuses = {r.status for r in incremental_dedup(incoming, history).collect()}
    assert statuses == {"dup_history"}


def _vec(base, eps=0.0, dim=8):
    v = [0.0] * dim
    v[0] = base
    v[1] = 1.0
    v[2] = eps
    return v


def test_semantic_dedup_groups_planted_near_dups(spark):
    # vectors 1 and 2 are nearly identical (cos ~ 1); 3 is orthogonal
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] * 8),
            (2, [1.0, 0.5, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0] * 8),
            (3, [-1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0] * 8),
        ],
        "vec_id long, v array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.9).collect()}
    assert out[1].rep_id == 1 and out[1].is_kept
    assert out[2].rep_id == 1 and not out[2].is_kept
    assert out[3].rep_id == 3 and out[3].is_kept


def test_semantic_bucket_pairs_only_within_bucket(spark):
    # opposite sign on the first coded dimension -> different buckets ->
    # never compared, even though cosine would clear the threshold on
    # the shared tail mass
    emb = spark.createDataFrame(
        [
            (1, [1.0] + [1.0] * 63),
            (2, [-0.001] + [1.0] * 63),
        ],
        "vec_id long, v array<double>",
    )
    assert semantic_bucket_pairs(emb, threshold=0.1).count() == 0


def test_span_stats_flags_cross_doc_gram(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, _ = load_all()
    out = queries["dedup_substring_span_stats"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.dup_grams <= r.n_grams
        assert 0 <= r.dup_bp <= 10000
        if r.n_grams:
            assert r.dup_bp == (r.dup_grams * 10000) // r.n_grams


def test_corpus_report_totals_consistent(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    queries, _ = load_all()
    rep = queries["corpus_summary_report"](spark, sf_dir)
    total_docs = sum(r.n_docs for r in rep.collect())
    assert total_docs == load_table(spark, sf_dir, "documents").count()


@pytest.mark.parametrize(
    "name",
    [
        "search_bm25_topk",
        "dedup_incremental_history",
        "dedup_semantic_groups",
        "dedup_substring_span_stats",
        "corpus_summary_report",
    ],
)
def test_round4_oracle_parity(spark, sf_dir, name):
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import compare_query_to_oracle

    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, oracles = load_all()
    compare_query_to_oracle(queries[name](spark, sf_dir), oracles[name], sf_dir)


def test_hard_negatives_never_same_label(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    queries, _ = load_all()
    out = queries["ann_hard_negatives"](spark, sf_dir)
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    rows = out.collect()
    assert rows
    for r in rows:
        assert labels[r.query_id] != r.neighbor_label
        assert labels[r.neighbor_id] == r.neighbor_label


def test_class_balanced_equal_counts(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, _ = load_all()
    out = queries["sample_class_balanced"](spark, sf_dir)
    counts = [r["c"] for r in out.groupBy("label").agg(F.count("*").alias("c")).collect()]
    assert len(set(counts)) == 1  # every class at exactly the min size


@pytest.mark.parametrize("name", ["ann_hard_negatives", "sample_class_balanced"])
def test_round4_wave2_oracle_parity(spark, sf_dir, name):
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import compare_query_to_oracle

    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, oracles = load_all()
    compare_query_to_oracle(queries[name](spark, sf_dir), oracles[name], sf_dir)


def test_lsh_recall_verdict_green(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, _ = load_all()
    row = queries["dedup_lsh_recall_checked"](spark, sf_dir).collect()[0]
    assert row.n_true > 0  # the fixture plants near-dups
    assert row.n_caught <= row.n_true
    assert row.verdict  # banded LSH must clear the 80% recall gate


def test_quality_tiers_partition_corpus(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.loader import load_all
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    queries, _ = load_all()
    rows = queries["curation_quality_tiers"](spark, sf_dir).collect()
    assert [r.tier for r in rows] == [1, 2, 3, 4]
    assert sum(r.n_docs for r in rows) == load_table(spark, sf_dir, "documents").count()
    # tiers are ordered, non-overlapping score ranges
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_score_e4 < hi.min_score_e4
        assert lo.min_score_e4 <= lo.avg_score_e4 <= lo.max_score_e4


@pytest.mark.parametrize("name", ["dedup_lsh_recall_checked", "curation_quality_tiers"])
def test_round4_wave3_oracle_parity(spark, sf_dir, name):
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import compare_query_to_oracle

    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, oracles = load_all()
    compare_query_to_oracle(queries[name](spark, sf_dir), oracles[name], sf_dir)


def test_lsh_index_build_append_probe_matches_inplan(spark, tmp_path, sf_dir):
    """The persisted band index (build + append) probed by the incoming
    slice must emit exactly the in-plan query's candidates, and append
    must not rewrite existing index files."""
    import os

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        INCR_HISTORY_MOD,
        append_dedup_lsh_index,
        build_dedup_lsh_index,
        probe_dedup_lsh_index,
    )
    from flink_realtime_data_warehouse_spark.plans.loader import load_all
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    queries, _ = load_all()
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.pmod("doc_id", F.lit(INCR_HISTORY_MOD)) == INCR_HISTORY_MOD - 1
    hist = docs.filter(~is_inc)
    inc = docs.filter(is_inc)

    idx = str(tmp_path / "lsh_idx")
    # build from the first half of history, append the rest — split on
    # a different modulus so both parts are non-trivial
    first = hist.filter(F.pmod("doc_id", F.lit(2)) == 0)
    rest = hist.filter(F.pmod("doc_id", F.lit(2)) == 1)
    build_dedup_lsh_index(first, idx)

    def file_bytes():
        out = {}
        for root, _, files in os.walk(idx):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p), os.path.getsize(p)
        return out

    before = file_bytes()
    append_dedup_lsh_index(rest, idx)
    after = file_bytes()
    for p, stamp in before.items():
        assert after[p] == stamp, f"existing index file rewritten: {p}"
    assert len(after) > len(before)  # append added files

    probed = {
        (r.doc_new, r.doc_hist)
        for r in probe_dedup_lsh_index(spark, inc, idx).collect()
    }
    inplan = {
        (r.doc_new, r.doc_hist)
        for r in queries["dedup_incremental_lsh"](spark, sf_dir).collect()
    }
    assert probed == inplan


def test_round4_incr_lsh_oracle_parity(spark, sf_dir):
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import compare_query_to_oracle

    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    queries, oracles = load_all()
    compare_query_to_oracle(
        queries["dedup_incremental_lsh"](spark, sf_dir),
        oracles["dedup_incremental_lsh"],
        sf_dir,
    )


def test_semantic_dedup_transitive_chain_within_bucket(spark):
    # a~b and b~c clear the threshold but a~c does not (0deg / 45deg /
    # 90deg in the first two coordinates): the in-kernel union-find must
    # still close the chain into ONE component labeled by the min id —
    # the closure the oracle states recursively, pinned at unit scale
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0] + [0.0] * 62),
            (2, [0.7071, 0.7071] + [0.0] * 62),
            (3, [0.0, 1.0] + [0.0] * 62),
        ],
        "vec_id long, v array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.6).collect()}
    assert out[1].rep_id == 1 and out[1].is_kept
    assert out[2].rep_id == 1 and not out[2].is_kept
    assert out[3].rep_id == 1 and not out[3].is_kept


def test_semantic_dedup_degenerate_single_component_bucket(spark):
    # worst-case skew for the in-kernel union-find: many near-identical
    # vectors land in ONE bucket and form ONE component — the kernel
    # must close it to a single min-id representative without the pair
    # relation ever leaving the task (500 members = ~125k in-task pairs)
    rows = [(i, [1.0, 0.5, i * 1e-9] + [0.0] * 61) for i in range(100, 600)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = semantic_dedup(emb, threshold=0.9).collect()
    assert len(out) == 500
    assert all(r.rep_id == 100 for r in out)
    assert sum(r.is_kept for r in out) == 1


def test_semantic_dedup_custom_bucket_column(spark):
    # the trained-quantizer hook: any partitioning Column can replace
    # the sign-bit code. Bucketing by vec_id parity separates vectors 1
    # and 3 (identical direction -> dup under one bucket) into different
    # buckets, so each keeps itself; 1 and 5 share the odd bucket and
    # dedup. Pins that the bucket_col override actually drives the scope.
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0] + [0.0] * 62),
            (3, [1.0, 0.0] + [0.0] * 62),
            (5, [1.0, 0.001] + [0.0] * 62),
        ],
        "vec_id long, v array<double>",
    )
    default = {r.vec_id: r.rep_id for r in semantic_dedup(emb, threshold=0.9).collect()}
    assert default == {1: 1, 3: 1, 5: 1}  # sign code: all one bucket
    parity = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(
            emb, threshold=0.9, bucket_col=F.col("vec_id") % 2
        ).collect()
    }
    assert parity == {1: 1, 3: 1, 5: 1}  # all odd -> still one bucket
    half = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(
            emb, threshold=0.9, bucket_col=(F.col("vec_id") > 3).cast("int")
        ).collect()
    }
    assert half == {1: 1, 3: 1, 5: 5}  # 5 isolated in its own bucket
