"""The scaling-evidence tools must stay runnable: the generator is
deterministic and fixture-shaped, and the measurement helpers compute
the collision bound correctly (SCALING.json / BASELINE.md round-5
table depend on both)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.gen_scale_corpus import generate_corpus  # noqa: E402
from tools.measure_scaling import _pairs_bound  # noqa: E402


def test_generator_deterministic_and_fixture_shaped(spark, tmp_path):
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    c1 = generate_corpus(d1, mult=0.1, seed=7)
    c2 = generate_corpus(d2, mult=0.1, seed=7)
    assert c1 == c2 == {
        "documents": 500,
        "embeddings": 200,
        "events": 10000,
        "customer": 1500,
    }

    docs = load_table(spark, d1, "documents")
    rows = {r.doc_id: r for r in docs.collect()}
    # same seed -> identical corpus
    docs2 = {r.doc_id: r.text for r in load_table(spark, d2, "documents").collect()}
    assert {k: v.text for k, v in rows.items()} == docs2
    # planted near-dups: every 20th doc is its predecessor + " dup"
    assert rows[19].text == rows[18].text + " dup"
    assert rows[39].text == rows[38].text + " dup"
    # fixture schema contract
    assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert rows[0].n_chars == len(rows[0].text)

    emb = load_table(spark, d1, "embeddings")
    r0 = emb.filter("vec_id IN (24, 25)").collect()
    assert len(r0[0].embedding) == 64
    ev = load_table(spark, d1, "events")
    assert ev.count() == 10000
    assert set(ev.columns) == {"event_id", "ts", "user_id", "event_type", "value", "props"}


def test_pairs_bound_is_sum_of_group_pairs(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)], ["k"]
    )
    # 3 choose 2 + 2 choose 2 + 1 choose 2 = 3 + 1 + 0
    assert _pairs_bound(df, ["k"]) == 4
