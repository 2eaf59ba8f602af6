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


def test_candidate_growth_exponents_stay_linear(spark, tmp_path):
    """The 100 TB scaling claims as a CI property, not a one-off run.

    SCALING.json's full-scale fits (1x/10x/30x: LSH 0.99, ER 1.00,
    overlap postings 1.07 vs the naive pair-space exponent of 2.0) are
    measurements; this test re-derives mini-scale exponents from two
    freshly generated corpora so any future change to a candidate
    generator (a blocking key dropped, a distinct lost, a band widened)
    that bends a bound toward quadratic fails the suite. Thresholds
    carry margin over the measured mini-scale values (LSH 1.0, ER 1.37
    — ER's small-vocab blocks are relatively denser at this size; it
    measures 1.00 across the 30x range — overlap 1.06); all are far
    below 2.0, and every candidate relation must also stay a sliver of
    the naive pair space.
    """
    import math

    from pyspark.sql import functions as F

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
        _exploded_shingle_hashes,
    )
    from flink_realtime_data_warehouse_spark.operators.entity import ER_LEN_BUCKET
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    res = {}
    for mult in (0.5, 1.5):
        d = str(tmp_path / f"m{mult}")
        generate_corpus(d, mult=mult, seed=7)
        docs = load_table(spark, d, "documents")
        er_k = docs.filter(F.col("text").isNotNull()).select(
            F.split("text", " ").getItem(0).alias("w1"),
            F.floor(F.size(F.split("text", " ")) / ER_LEN_BUCKET).alias("lb"),
        )
        postings = (
            _exploded_shingle_hashes(docs)
            .join(docs.select("doc_id", "source"), "doc_id")
            .select("s", "source")
            .distinct()
        )
        res[mult] = {
            "n": docs.count(),
            "lsh": minhash_lsh_candidate_pairs(docs).count(),
            "er": _pairs_bound(er_k, ["w1", "lb"]),
            "overlap": postings.count(),
        }

    def exponent(fam: str) -> float:
        a, b = res[0.5][fam], res[1.5][fam]
        assert a > 0 and b > 0, f"{fam}: degenerate candidate count"
        return math.log(b / a) / math.log(res[1.5]["n"] / res[0.5]["n"])

    assert exponent("lsh") <= 1.2
    assert exponent("er") <= 1.6
    assert exponent("overlap") <= 1.25
    # and nowhere near the naive pair space at either scale
    for mult, r in res.items():
        naive = r["n"] * (r["n"] - 1) // 2
        assert r["lsh"] <= naive * 0.01
        assert r["er"] <= naive * 0.05


def test_zipf_mode_plants_all_four_skew_axes(spark, tmp_path):
    """--zipf must plant boilerplate shingles, a Zipfian source mix,
    a power-law user, and a dominant embedding cluster — and leave the
    uniform mode byte-identical (same rng draw order when off)."""
    from pyspark.sql import functions as F

    from flink_realtime_data_warehouse_spark.sources.tables import load_table
    from tools.gen_scale_corpus import BOILERPLATE

    dz = str(tmp_path / "z")
    du = str(tmp_path / "u")
    du2 = str(tmp_path / "u2")
    generate_corpus(dz, mult=0.2, seed=7, zipf=True)
    generate_corpus(du, mult=0.2, seed=7)
    generate_corpus(du2, mult=0.2, seed=7, zipf=False)

    docs = load_table(spark, dz, "documents")
    n = docs.count()
    boiler = docs.filter(F.col("text").contains(BOILERPLATE)).count()
    assert abs(boiler / n - 0.3) < 0.05  # ~30% incidence (dups can add)

    top_src = (
        docs.groupBy("source").count().orderBy(F.desc("count")).first()
    )
    assert top_src["count"] / n > 0.25  # Zipf s=1.2 top source ~34%

    ev = load_table(spark, dz, "events")
    top_user = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    assert top_user["count"] / ev.count() > 0.08  # ~1/H(n_users)

    emb = load_table(spark, dz, "embeddings")
    top_cl = emb.groupBy("label").count().orderBy(F.desc("count")).first()
    assert top_cl["count"] / emb.count() > 0.4  # s=1.5 over 10 ≈ 50%

    # uniform mode untouched by the zipf code path
    u1 = {r.doc_id: r.text for r in load_table(spark, du, "documents").collect()}
    u2 = {r.doc_id: r.text for r in load_table(spark, du2, "documents").collect()}
    assert u1 == u2
    assert not any(BOILERPLATE in t for t in u1.values())


def test_dfcap_drops_boilerplate_keeps_planted_dups(spark, tmp_path):
    """The production df-capped near-dup path on a boilerplate corpus:
    hot shingles are exactly the boilerplate, every planted near-dup
    pair survives the cap, and no pair survives on boilerplate overlap
    alone — while the uncapped path drowns in it."""
    from pyspark.sql import functions as F

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _ngram_pair_counts,
        _ngram_pair_counts_capped,
        _shingle_df,
        _shingle_df_capped,
    )

    boiler = "the data table scan filter join"
    rows = []
    # 400 docs, distinct 10-word bodies, 50% carry the boilerplate tail
    for i in range(400):
        body = " ".join(f"w{i}x{j}" for j in range(10))
        rows.append((i, body + (" " + boiler if i % 2 == 0 else "")))
    # planted near-dup pair on boilerplate-free docs
    rows.append((1000, rows[1][1] + " dup"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    sh_all = _shingle_df(docs)
    sh_cap = _shingle_df_capped(docs, cap=64)
    dropped = sh_all.select("s").distinct().count() - sh_cap.select(
        "s"
    ).distinct().count()
    assert dropped == 4  # exactly the 4 boilerplate 3-grams

    capped = _ngram_pair_counts_capped(docs, cap=64)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(1, 1000)}  # planted pair only, no boilerplate pairs

    # the uncapped path on the same corpus: every even-doc pair collides
    uncapped = _ngram_pair_counts(docs).count()
    assert uncapped >= 200 * 199 // 2  # drowned in boilerplate pairs


def test_boilerplate_cliff_and_dfcap_exponent(spark, tmp_path):
    """The skew-axis claim as a CI property: on Zipfian mini-corpora
    the UNCAPPED inverted-index bound grows ~quadratically with the
    boilerplate population while the df-capped candidate relation
    tracks the planted-dup count (exponent ≈ 1). Mirrors
    test_candidate_growth_exponents_stay_linear for the skew axis."""
    import math

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _ngram_pair_counts_capped,
        _shingle_df,
    )
    from flink_realtime_data_warehouse_spark.sources.tables import load_table
    from tools.gen_scale_corpus import generate_corpus
    from tools.measure_scaling import _pairs_bound

    # mults ≥ 2 so the Heaps-law vocab scaling is active: below that
    # the fixed 31-word vocab makes NATURAL collisions quadratic and
    # the measurement reflects the fixture, not the operator (the same
    # 1×-point caveat SCALING.json documents)
    res = {}
    for mult in (2, 6):
        d = str(tmp_path / f"z{mult}")
        generate_corpus(d, mult=mult, seed=7, zipf=True)
        docs = load_table(spark, d, "documents")
        n = docs.count()
        res[mult] = {
            "n": n,
            "planted": n // 20,
            "bound": _pairs_bound(_shingle_df(docs), ["s"]),
            "capped": _ngram_pair_counts_capped(docs).count(),
        }
    g = math.log(3)  # 3x corpus growth
    exp_bound = math.log(res[6]["bound"] / res[2]["bound"]) / g
    # the cliff: boilerplate postings square (measured 1.96 here,
    # 450.6 M absolute at the 10x corpus)
    assert exp_bound > 1.6, res
    # the defense: capped candidates TRACK the planted dups (measured
    # 938/500 and 1515/1500 — accidental collisions dilute with vocab)
    for mult, r in res.items():
        assert r["capped"] <= 2 * r["planted"] + 50, res
    # and the capped relation is a sliver of the uncapped bound
    assert res[6]["capped"] * 1000 < res[6]["bound"]
