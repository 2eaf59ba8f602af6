"""Approximate sketch sanity: estimates must track exact values, and
the registered query's verdict columns must all be true (that is the
property the trivial all-true DuckDB oracle hashes against)."""

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.functions_surface import (
    sketch_approx_distinct,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def test_approx_sketches_track_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 1000)
            .cast("double")
            .alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(a["approx_p50"] - e["p50"]) / e["p50"] < 0.05


def test_sketch_checked_query_all_verdicts_true(spark, sf_dir):
    rows = sketch_approx_distinct(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["parts_ok"] and r["supps_ok"] and r["p50_ok"], str(r)
        assert r["exact_parts"] > 0 and r["exact_supps"] > 0


def _exact_topk(docs, k):
    words = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    return [
        (r["term"], r["n"])
        for r in words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(k)
        .collect()
    ]


def test_heavy_hitters_exact_under_tiny_capacity_skewed_stream(spark):
    """Capacity 8 on a skewed stream: the MG summaries carry real
    error mass (decrement rounds fire), yet the shortlist + rescore
    result must equal the exact top-k — the superset guarantee
    exercised, not just stated."""
    from flink_realtime_data_warehouse_spark.operators.sketches import (
        _mg_word_summaries,
        heavy_hitters,
    )

    rows = []
    # 5 hot terms (~60 occurrences each) + 300 distinct tail singletons:
    # the tail churns the 8-slot counters, the hot terms must survive
    for i in range(60):
        rows.append((i, " ".join(f"hot{j}" for j in range(5))))
    for i in range(300):
        rows.append((1000 + i, f"tail{i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(2)

    summ = _mg_word_summaries(docs, 8)
    err = (
        summ.filter(F.col("term").isNull())
        .agg(F.sum("c").alias("e"))
        .collect()[0]["e"]
    )
    assert err > 0  # the adversarial stream actually triggered evictions

    got = [
        (r["term"], r["n"])
        for r in heavy_hitters(docs, k=3, capacity=8).collect()
    ]
    assert got == _exact_topk(docs, 3)
    assert {t for t, _ in got} == {"hot0", "hot1", "hot2"}


def test_heavy_hitters_falls_back_exact_when_capacity_undersized(spark):
    """A flat distribution at capacity 8: E ≥ T_K, the superset proof
    does not apply, and the operator must return the exact answer via
    the fallback — correctness never degrades, only the shuffle
    saving."""
    from flink_realtime_data_warehouse_spark.operators.sketches import (
        heavy_hitters,
    )

    # 400 terms, each appearing exactly twice — no term is "heavy"
    rows = [(i, f"w{i % 400}") for i in range(800)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(2)
    got = [
        (r["term"], r["n"])
        for r in heavy_hitters(docs, k=10, capacity=8).collect()
    ]
    assert got == _exact_topk(docs, 10)
    assert all(n == 2 for _, n in got)


def test_heavy_hitters_empty_and_small_vocab(spark):
    from flink_realtime_data_warehouse_spark.operators.sketches import (
        heavy_hitters,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty, k=5, capacity=8).count() == 0
    # fewer distinct terms than k: all of them, exactly counted
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], ["doc_id", "text"]
    )
    got = [
        (r["term"], r["n"])
        for r in heavy_hitters(docs, k=10, capacity=8).collect()
    ]
    assert got == [("a", 2), ("b", 2), ("c", 1)]


def test_hash_reservoir_partition_invariant_and_exact_k(spark, tmp_path):
    """The hash-rank reservoir must be a pure function of the data:
    identical sample under any file/partition layout (the property RNG
    reservoirs lack), with exactly min(k, n_class) rows per class."""
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        RESERVOIR_K,
        sample_hash_reservoir,
    )

    rows = [(i, "en" if i % 3 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"]).withColumn(
        "text", F.lit("x")
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    df.repartition(1).write.parquet(f"{d1}/documents.parquet")
    df.repartition(13).write.parquet(f"{d2}/documents.parquet")

    s1 = [(r.doc_id, r.lang) for r in sample_hash_reservoir(spark, d1).collect()]
    s2 = [(r.doc_id, r.lang) for r in sample_hash_reservoir(spark, d2).collect()]
    assert s1 == s2
    from collections import Counter

    per_class = Counter(lang for _, lang in s1)
    assert per_class == {"en": RESERVOIR_K, "fr": RESERVOIR_K}


def test_grouped_heavy_hitters_tiny_capacity_and_null_group(spark):
    """Grouped MG at capacity 8: per-group skewed streams with real
    eviction mass, a NULL-lang group, and the per-group shortlist must
    all reproduce the exact per-group top-k."""
    from pyspark.sql.window import Window

    from flink_realtime_data_warehouse_spark.operators.sketches import (
        grouped_heavy_hitters,
    )

    rows = []
    for i in range(50):  # en: hot terms + churn tail
        rows.append((i, "en", " ".join(f"ehot{j}" for j in range(4))))
    for i in range(200):
        rows.append((100 + i, "en", f"etail{i}"))
    for i in range(40):  # fr: different hitters
        rows.append((1000 + i, "fr", " ".join(f"fhot{j}" for j in range(3))))
    for i in range(150):
        rows.append((2000 + i, "fr", f"ftail{i}"))
    for i in range(30):  # NULL lang is a group of its own
        rows.append((3000 + i, None, "nhot nhot2"))
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"]).repartition(3)

    got = [
        (r["lang"], r["term"], r["n"])
        for r in grouped_heavy_hitters(docs, k=2, capacity=8).collect()
    ]
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    rk = Window.partitionBy("lang").orderBy(F.desc("n"), "term")
    exact = [
        (r["lang"], r["term"], r["n"])
        for r in words.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 2)
        .select("lang", "term", "n")
        .orderBy("lang", F.desc("n"), "term")
        .collect()
    ]
    assert got == exact
    langs = {lang for lang, _, _ in got}
    assert langs == {"en", "fr", None}
    assert ("en", "ehot0", 50) in got and ("fr", "fhot0", 40) in got


def test_grouped_heavy_hitters_falls_back_when_one_group_flat(spark):
    """One well-skewed group plus one flat group: the flat group's
    E ≥ T_K must force the exact fallback, and the result is still the
    exact per-group answer."""
    from flink_realtime_data_warehouse_spark.operators.sketches import (
        grouped_heavy_hitters,
    )

    rows = [(i, "en", " ".join("hot" for _ in range(5))) for i in range(30)]
    rows += [(100 + i, "fr", f"f{i % 300}") for i in range(600)]  # flat
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"]).repartition(2)
    got = [
        (r["lang"], r["term"], r["n"])
        for r in grouped_heavy_hitters(docs, k=3, capacity=8).collect()
    ]
    assert ("en", "hot", 150) in got
    fr = [(t, n) for lang, t, n in got if lang == "fr"]
    assert fr == [("f0", 2), ("f1", 2), ("f10", 2)]  # exact ties, term asc
