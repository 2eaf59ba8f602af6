"""assign_stable_ids: dense deterministic global numbering WITHOUT the
Exchange SinglePartition a naive row_number() OVER (ORDER BY k) plans.

The oracle row (ids_stable_assign) proves value-parity with exactly
that naive plan; these tests pin the properties the oracle can't see —
the plan SHAPE (no single-partition funnel), determinism across runs,
density/uniqueness under skewed and tiny key ranges, and the top-edge
bucket clamp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.scale import assign_stable_ids


def _ids(df, col="k", **kw):
    out = assign_stable_ids(df, col, **kw)
    rows = out.orderBy(col).collect()
    return [r["stable_id"] for r in rows]


def test_dense_ids_follow_key_order(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    assert _ids(df, n_buckets=16) == list(range(1000))


def test_skewed_key_range_still_dense(spark):
    # 90% of keys in the bottom 1% of the range: equal-width buckets
    # are heavily unbalanced, numbering must stay exact regardless
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.col("id"))
        .otherwise((F.col("id") - 900) * 100_000 + 10_000)
        .alias("k")
    )
    got = _ids(df, n_buckets=32)
    assert got == list(range(1000))


def test_single_value_span_and_tiny_inputs(spark):
    one = spark.range(7, 8).select(F.col("id").alias("k"))
    assert _ids(one) == [0]
    two = spark.createDataFrame([(5,), (-3,)], "k long")
    assert _ids(two, n_buckets=256) == [0, 1]


def test_empty_input_keeps_schema(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    out = assign_stable_ids(df, "k")
    assert out.count() == 0
    assert dict(out.dtypes)["stable_id"] == "bigint"


def test_deterministic_across_runs(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 2654435761 % 100_000).alias("k")
    ).dropDuplicates(["k"])
    assert _ids(df, n_buckets=64) == _ids(df, n_buckets=64)


def test_sampled_boundaries_exact_on_all_shapes(spark):
    for mk in (
        lambda: spark.range(0, 1000).select(F.col("id").alias("k")),
        # 99% of keys clustered in [0, 990), 1% flung across a huge range
        lambda: spark.range(0, 1000).select(
            F.when(F.col("id") < 990, F.col("id"))
            .otherwise((F.col("id") - 990) * 10_000_000 + 1_000_000)
            .alias("k")
        ),
    ):
        assert _ids(mk(), n_buckets=16, boundaries="sample") == list(range(1000))


def _bucket_counts(df, bucket_col):
    return [
        r["count"]
        for r in df.select(bucket_col.alias("b")).groupBy("b").count().collect()
    ]


def test_sampled_boundaries_balance_clustered_range(spark):
    """The reason 'sample' exists: equal-width serializes a clustered
    range into ~one bucket; equi-depth boundaries must spread it. Both
    bucketings are replicated here with the op's own expressions (the
    op itself only exposes the final ids, which are identical)."""
    df = spark.range(0, 2000).select(
        F.when(F.col("id") < 1980, F.col("id"))
        .otherwise((F.col("id") - 1980) * 50_000_000 + 100_000_000)
        .alias("k")
    )
    hi = (2000 - 1980 - 1) * 50_000_000 + 100_000_000
    span = float(hi + 1)
    width = F.least(
        F.floor(F.col("k").cast("double") * 16.0 / span), F.lit(15)
    )
    assert max(_bucket_counts(df, width)) >= 1980  # the pile-up

    # equi-depth: replicate the op's deterministic hash-sample cuts
    rate = max(1, 2000 // (16 * 128))
    sampled = sorted(
        r["k"]
        for r in df.filter(F.pmod(F.xxhash64("k"), F.lit(rate)) == 0).collect()
    )
    step = max(1, len(sampled) // 16)
    cuts = sorted({int(x) for x in sampled[step::step][:15]})
    arr = ", ".join(f"{c}L" for c in cuts)
    depth = F.expr(f"size(filter(array({arr}), x -> x <= k))")
    assert max(_bucket_counts(df, depth)) <= 1000  # no serialization


def test_no_single_partition_exchange(spark, sf_dir):
    """The whole point: the distributed numbering must not funnel the
    corpus through one reducer the way the oracle's global window does."""
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = assign_stable_ids(docs, "doc_id", n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(_bkt" in plan
