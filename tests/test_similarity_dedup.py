"""Behavioral tests for the approximate operators: LSH ANN recall vs the
brute-force baseline, and MinHash-LSH finding planted near-duplicates."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.dedup import (
    minhash_signatures,
    word_shingles,
)
from flink_realtime_data_warehouse_spark.operators.similarity import (
    TOPK,
    ann_cosine_topk,
    ann_lsh_topk,
)


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    exact = ann_cosine_topk(spark, sf_dir).collect()
    approx = ann_lsh_topk(spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # recall across queries: bucketing must find a reasonable share of
    # true top-k (8 hyperplanes / 256 buckets on 500 docs is coarse)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert total == len(exact_sets) * TOPK
    assert hits / total >= 0.2, f"LSH recall collapsed: {hits}/{total}"
    # approximate results must still be *true* similarities: every
    # reported neighbor's cosine matches the exact scorer's value
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cos_sim"] - exact_cos[key]) < 1e-9


def test_minhash_lsh_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    near = base.replace("green", "dark")  # one-word change → high Jaccard
    far = "completely different text about spark sql engines and shuffle partitions with columnar storage"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sig = minhash_signatures(docs)
    rows = {r["doc_id"]: [r[f"h{j}"] for j in range(12)] for r in sig.collect()}
    # near-dup pair agrees on most minhash components; unrelated doc on none
    agree_12 = sum(a == b for a, b in zip(rows[1], rows[2]))
    agree_13 = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert agree_12 >= 6
    assert agree_13 == 0


def test_word_shingles_short_doc_guard(spark):
    docs = spark.createDataFrame([(1, "one two"), (2, "a b c d")], ["doc_id", "text"])
    out = docs.select("doc_id", word_shingles("text").alias("sh")).collect()
    got = {r["doc_id"]: r["sh"] for r in out}
    assert got[1] == []
    assert got[2] == ["a b c", "b c d"]
