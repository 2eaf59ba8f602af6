"""Entity-resolution fuzzy matcher: planted typos, blocking behavior."""

from pyspark.sql import Row

from flink_realtime_data_warehouse_spark.operators.entity import blocked_fuzzy_pairs


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id bigint, text string"
    )


def test_typo_pair_matches_within_block(spark):
    base = "acme corporation global sales division annual report two thousand"
    typo = "acme corporatio global sales divsion annual report two thousand"
    docs = _docs(spark, [(1, base), (2, typo), (3, None)])
    rows = blocked_fuzzy_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    # 2 real edits + up to 2 tail chars shifted into the fixed-length
    # prefix window by the deletions
    assert 0 < rows[0]["dist"] <= 4


def test_different_first_word_never_compared(spark):
    # identical except the blocking word: blocked apart, no pair emitted
    docs = _docs(
        spark,
        [
            (1, "acme corporation global sales division annual report"),
            (2, "apex corporation global sales division annual report"),
        ],
    )
    assert blocked_fuzzy_pairs(docs).count() == 0


def test_distance_threshold_filters(spark):
    a = "acme " + " ".join(f"x{i}" for i in range(8))
    b = "acme " + " ".join(f"y{i}" for i in range(8))
    docs = _docs(spark, [(1, a), (2, b)])
    assert blocked_fuzzy_pairs(docs, max_dist=2).count() == 0
    assert blocked_fuzzy_pairs(docs, max_dist=60).count() == 1
