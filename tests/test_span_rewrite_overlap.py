"""Property tests for the round-4 additions: duplicated-span rewrite,
cross-source overlap matrix, per-language quality quota.

The oracle-parity suite already hash-checks each against DuckDB; these
pin the semantic properties a hash can't articulate (idempotence,
bounds, rank shape)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from flink_realtime_data_warehouse_spark.operators.dedup import SPAN_CHUNK_WORDS
from flink_realtime_data_warehouse_spark.operators.sampling import QUOTA_PER_LANG

_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def span_rewrite(spark, sf_dir):
    return _QUERIES["dedup_span_rewrite"](spark, sf_dir).cache()


def test_span_rewrite_covers_every_doc_and_bounds(span_rewrite, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert span_rewrite.count() == docs.count()
    bad = span_rewrite.filter(
        (F.col("kept_chunks") > F.col("n_chunks")) | (F.col("kept_chunks") < 0)
    )
    assert bad.count() == 0


def test_span_rewrite_clean_text_matches_kept_count(span_rewrite):
    # kept text must contain exactly the surviving chunks' words; the
    # last chunk of a doc may be shorter than SPAN_CHUNK_WORDS, so word
    # count is bounded by kept*CHUNK and positive whenever kept > 0
    bad = span_rewrite.filter(
        (F.col("kept_chunks") > 0)
        & (
            (F.size(F.split("clean_text", " ")) > F.col("kept_chunks") * SPAN_CHUNK_WORDS)
            | (F.length("clean_text") == 0)
        )
    )
    assert bad.count() == 0


def test_span_rewrite_idempotent(span_rewrite, spark):
    """Re-deduplicating the cleaned corpus removes nothing. Re-chunking
    ``clean_text`` reproduces the kept chunk list exactly (every kept
    chunk is 5 words except possibly the doc's original final chunk,
    which sorts last), and by construction the kept set holds exactly
    one occurrence of each distinct chunk — so every re-derived chunk
    must be globally unique."""
    rechunked = span_rewrite.filter(F.col("kept_chunks") > 0).select(
        F.explode(
            F.expr(
                "transform(sequence(0, (size(split(clean_text, ' ')) - 1) "
                f"div {SPAN_CHUNK_WORDS}), i -> concat_ws(' ', "
                f"slice(split(clean_text, ' '), i*{SPAN_CHUNK_WORDS}+1, {SPAN_CHUNK_WORDS})))"
            )
        ).alias("chunk")
    )
    dup = rechunked.groupBy("chunk").count().filter(F.col("count") > 1)
    assert dup.count() == 0


def test_source_overlap_bounds_and_symmetry(spark, sf_dir):
    df = _QUERIES["dq_source_overlap"](spark, sf_dir).cache()
    rows = df.collect()
    assert all(r["src_a"] < r["src_b"] for r in rows)  # each pair once
    assert all(0 <= r["ov_bp"] <= 10000 for r in rows)
    assert all(r["n_shared"] >= 1 for r in rows)
    df.unpersist()


def test_quality_quota_rank_shape(spark, sf_dir):
    df = _QUERIES["sample_quality_quota"](spark, sf_dir).cache()
    per_lang = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rn").alias("max_rn"),
        F.min("rn").alias("min_rn"),
    )
    for r in per_lang.collect():
        assert r["n"] <= QUOTA_PER_LANG
        assert r["min_rn"] == 1 and r["max_rn"] == r["n"]  # dense ranks
    # scores non-increasing along rn within each lang
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy("rn")
    bad = df.withColumn("prev", F.lag("score_e4").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("score_e4") > F.col("prev"))
    )
    assert bad.count() == 0
    df.unpersist()
