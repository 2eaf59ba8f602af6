"""Property tests for the generic CEP matcher: determinism under input
order/partitioning, output invariants, and randomized streaming-vs-batch
equivalence (the two execution forms must be the same operator).
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_realtime_data_warehouse_spark.streaming.cep import (
    match_sequence,
    match_sequence_batch,
)

_STEPS = ["typ = 'A'", "typ = 'B'", "typ = 'C'"]
_WITHIN = 100


def _events_strategy():
    event = st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.sampled_from(["A", "B", "C", "x"]),
        st.integers(min_value=0, max_value=500),
    )
    return st.lists(event, min_size=0, max_size=40)


def _run(spark, rows, contiguity, shuffle_seed=None, partitions=1):
    indexed = [(k, t, ts, i) for i, (k, t, ts) in enumerate(rows)]
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(indexed)
    df = spark.createDataFrame(
        indexed, "k string, typ string, ts long, ord long"
    ).repartition(partitions)
    res = match_sequence_batch(
        df,
        steps=_STEPS,
        within=_WITHIN,
        key_col="k",
        ts_col="ts",
        payload_col="typ",
        order_col="ord",
        contiguity=contiguity,
    )
    return sorted(tuple(r) for r in res.collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_events_strategy(), contiguity=st.sampled_from(["strict", "relaxed"]))
def test_cep_invariant_to_row_order_and_partitioning(spark, rows, contiguity):
    """Emissions are a pure function of the per-key (ts, ord)-sorted
    history — physical row order and partition count must not matter."""
    base = _run(spark, rows, contiguity)
    assert _run(spark, rows, contiguity, shuffle_seed=7, partitions=5) == base
    assert _run(spark, rows, contiguity, shuffle_seed=13, partitions=2) == base


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_events_strategy(), contiguity=st.sampled_from(["strict", "relaxed"]))
def test_cep_output_invariants(spark, rows, contiguity):
    """Structural invariants: matches complete all steps inside the
    window; timeouts are strictly partial; ts0 <= last_ts <= ts0+within."""
    for key, kind, step_count, ts0, last_ts, payload0 in _run(
        spark, rows, contiguity
    ):
        assert kind in ("match", "timeout")
        assert ts0 <= last_ts <= ts0 + _WITHIN
        if kind == "match":
            assert step_count == len(_STEPS)
        else:
            assert 1 <= step_count < len(_STEPS)


_PAGE_SCHEMA = StructType(
    [
        StructField("k", StringType(), True),
        StructField("typ", StringType(), True),
        StructField("ts", LongType(), True),
        StructField("ord", LongType(), True),
        StructField("event_time", TimestampType(), True),
    ]
)


def test_cep_streaming_equals_batch_on_random_stream(spark, tmp_path):
    """The streaming (applyInPandasWithState) and batch (applyInPandas)
    forms share one kernel contract: identical emissions on a random
    event stream. Per-key far-future sentinels flush trailing partials
    through the streaming in-batch timeout path, mirroring the batch
    form's end-of-history timeout (the sentinel is present in BOTH
    inputs, so the comparison is exact, not approximate)."""
    rng = random.Random(42)
    keys = [f"d{i}" for i in range(8)]
    rows = []
    for i in range(200):
        rows.append(
            (
                rng.choice(keys),
                rng.choice(["A", "B", "C", "x"]),
                rng.randrange(0, 2_000),
            )
        )
    # flush sentinels: beyond every possible window end, match no step
    rows += [(k, "zz", 1_000_000) for k in keys]
    indexed = [(k, t, ts, i) for i, (k, t, ts) in enumerate(rows)]

    batch_df = spark.createDataFrame(
        indexed, "k string, typ string, ts long, ord long"
    )
    batch = sorted(
        tuple(r)
        for r in match_sequence_batch(
            batch_df,
            steps=_STEPS,
            within=_WITHIN,
            key_col="k",
            ts_col="ts",
            payload_col="typ",
            order_col="ord",
        ).collect()
    )

    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    stream_rows = [(k, t, ts, i, None) for (k, t, ts, i) in indexed]
    (
        spark.createDataFrame(stream_rows, _PAGE_SCHEMA)
        .withColumn("event_time", F.timestamp_millis(F.col("ts")))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema(_PAGE_SCHEMA)
        .parquet(src)
        .withWatermark("event_time", "0 seconds")
    )
    q = (
        match_sequence(
            stream,
            steps=_STEPS,
            within=_WITHIN,
            key_col="k",
            ts_col="ts",
            payload_col="typ",
            ts_per_ms=1,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert streamed == batch
