"""Behavioral pins for stratified sampling and TF-IDF beyond oracle
parity: stability under corpus growth (the property RNG sampling lacks)
and a hand-computed TF-IDF fixture.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from flink_realtime_data_warehouse_spark.operators.sampling import (
    SAMPLE_PCT,
    hash_bucket,
)
from flink_realtime_data_warehouse_spark.operators.textops import TFIDF_TOPK
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def test_stratified_membership_stable_under_growth(spark, sf_dir, tmp_path):
    """A document sampled in the small corpus is still sampled after the
    corpus doubles — membership is a pure function of the key, never of
    corpus composition."""
    docs = load_table(spark, sf_dir, "documents")
    small = docs.filter(F.col("doc_id") % 2 == 0)

    def sampled_ids(df):
        return {
            r["doc_id"]
            for r in df.filter(hash_bucket(F.col("doc_id")) < SAMPLE_PCT)
            .select("doc_id")
            .collect()
        }

    small_ids = sampled_ids(small)
    grown_ids = sampled_ids(docs)
    assert small_ids <= grown_ids
    # and restricting the grown sample to the small universe is identical
    assert {i for i in grown_ids if i % 2 == 0} == small_ids


def test_tfidf_hand_fixture(spark):
    """3-doc fixture with hand-computed smoothed TF-IDF."""
    from flink_realtime_data_warehouse_spark.operators.textops import (
        text_tfidf_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana", "en", "s", 18),
            (2, "banana cherry", "en", "s", 13),
            (3, "cherry cherry cherry durian", "en", "s", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = text_tfidf_topk(spark, d).collect()

    def idf(df_count: int, n: int = 3) -> float:
        return math.log((n + 1) / (df_count + 1)) + 1

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = {r["term"]: r for r in by_doc[1]}
    assert d1["apple"]["rnk"] == 1
    assert abs(d1["apple"]["score"] - round(2 * idf(1), 6)) < 1e-9
    assert abs(d1["banana"]["score"] - round(1 * idf(2), 6)) < 1e-9
    # doc 3: cherry tf=3 df=2 vs durian tf=1 df=1 → cherry wins
    d3 = {r["term"]: r for r in by_doc[3]}
    assert d3["cherry"]["rnk"] == 1 and d3["durian"]["rnk"] == 2
    # top-k bound respected
    assert all(len(v) <= TFIDF_TOPK for v in by_doc.values())


def test_pack_training_sequences_stable_under_corpus_growth(spark, sf_dir, tmp_path):
    """Packing is per-bucket prefix-stable: adding documents with higher
    doc_ids must not move any existing doc's offsets or packs — the
    property that lets a 100 TB pipeline pack incrementally instead of
    re-packing the corpus on every ingest."""
    import duckdb

    from flink_realtime_data_warehouse_spark.operators.sampling import (
        pack_training_sequences,
    )

    d = str(tmp_path / "subset")
    import os

    os.makedirs(d, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id < 250) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    full = {
        r["doc_id"]: (r["bucket"], r["tok_start"], r["pack_first"], r["pack_last"])
        for r in pack_training_sequences(spark, sf_dir).collect()
        if r["doc_id"] < 250
    }
    subset = {
        r["doc_id"]: (r["bucket"], r["tok_start"], r["pack_first"], r["pack_last"])
        for r in pack_training_sequences(spark, d).collect()
    }
    assert full == subset
    assert subset, "fixture subset must not be empty"


def test_leakage_safe_split_never_straddles_pairs(spark, sf_dir):
    """Every LSH near-dup pair lands in ONE split (the whole point)."""
    from pyspark.sql import functions as F
    from flink_realtime_data_warehouse_spark.operators.curation import split_leakage_safe
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
    )
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    assigned = split_leakage_safe(spark, sf_dir)
    pairs = minhash_lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))
    a = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    b = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    straddle = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    assert straddle.count() == 0
    # and the assignment covers every document exactly once
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert assigned.count() == n_docs


def test_weighted_mixture_is_monotone_under_weight_increase(spark, sf_dir):
    """Raising one domain's weight only ADDS members to the mixture —
    exercised through the operator's own per-source rate chain."""
    from pyspark.sql import functions as F
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        MIXTURE_WEIGHTS,
        hash_bucket,
        mixture_rate,
    )
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bumped = dict(MIXTURE_WEIGHTS)
    bumped["src3"] = MIXTURE_WEIGHTS["src3"] + 30
    kept_low = docs.filter(hash_bucket(F.col("doc_id")) < mixture_rate(MIXTURE_WEIGHTS))
    kept_high = docs.filter(hash_bucket(F.col("doc_id")) < mixture_rate(bumped))
    # no doc selected under the lower weights disappears under the higher
    assert kept_low.join(kept_high, "doc_id", "left_anti").count() == 0
    # and the bump strictly grows exactly the bumped source
    grew = kept_high.join(kept_low, "doc_id", "left_anti")
    assert grew.count() > 0
    assert grew.select("source").distinct().collect()[0]["source"] == "src3"
