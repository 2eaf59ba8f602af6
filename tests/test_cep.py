"""Generic sequence-pattern (CEP) operator: bounce-fixture equivalence
with the dedicated ST4 operator, strict-vs-relaxed contiguity, N-step
generality, and timeout emission."""

import os

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
from flink_realtime_data_warehouse_spark.streaming.state import detect_bounces

_PAGE_SCHEMA = StructType(
    [
        StructField("mid", StringType(), True),
        StructField("page_id", StringType(), True),
        StructField("last_page_id", StringType(), True),
        StructField("ts", LongType(), True),
        StructField("event_time", TimestampType(), True),
    ]
)

#: reference test vectors (DwdTrafficUserJumpDetail.java:57-65) plus a
#: consecutive-entries device: 101 lone entry → timeout bounce; 102
#: entry then in-window navigation → no bounce; 103 two entries within
#: the window → first is a match-path bounce, second times out later
_BOUNCE_FIXTURE = [
    ("101", "home", None, 10_000),
    ("102", "home", None, 12_000),
    ("102", "good_list", "home", 15_000),
    ("102", "good_list", "detail", 30_000),
    ("103", "home", None, 20_000),
    ("103", "cart", None, 25_000),
    # sentinel far past every window so trailing partials flush
    # through the in-batch timeout path (non-entry: arms nothing)
    ("101", "zz", "x", 500_000),
    ("102", "zz", "x", 500_000),
    ("103", "zz", "x", 500_000),
]


def _stream_through(spark, tmp_path, name, op):
    src = str(tmp_path / f"{name}_src")
    sink = str(tmp_path / f"{name}_sink")
    ckpt = str(tmp_path / f"{name}_ckpt")
    rows = [
        (mid, page, last, ts, None) for (mid, page, last, ts) in _BOUNCE_FIXTURE
    ]
    df = (
        spark.createDataFrame(rows, _PAGE_SCHEMA)
        .withColumn("event_time", F.timestamp_millis(F.col("ts")))
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(_PAGE_SCHEMA)
        .parquet(src)
        .withWatermark("event_time", "0 seconds")
    )
    q = (
        op(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


def test_match_sequence_reproduces_bounce_fixture(spark, tmp_path):
    """The dedicated ST4 operator is the 2-step instance of the general
    matcher: identical bounces on the reference fixture (both the CEP
    match path and the timeout path)."""
    bounces = _stream_through(
        spark, tmp_path, "st4", lambda s: detect_bounces(s, window=10_000)
    )
    general = _stream_through(
        spark,
        tmp_path,
        "cep",
        lambda s: match_sequence(
            s,
            steps=["last_page_id IS NULL", "last_page_id IS NULL"],
            within=10_000,
            key_col="mid",
            ts_col="ts",
            payload_col="page_id",
            ts_per_ms=1,
        ),
    )
    via_st4 = sorted((r["mid"], r["page_id"], r["ts"]) for r in bounces.collect())
    # every emission of the (entry, entry) pattern — match AND timeout —
    # is a bounce of its FIRST event, exactly the reference's union
    via_general = sorted(
        (r["key"], r["payload0"], r["ts0"]) for r in general.collect()
    )
    assert via_st4 == via_general
    assert via_st4 == [("101", "home", 10_000), ("103", "cart", 25_000), ("103", "home", 20_000)]


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        [(k, t, ts, i) for i, (k, t, ts) in enumerate(rows)],
        "k string, typ string, ts long, ord long",
    )


def _run_batch(spark, rows, steps, within, **kw):
    df = _mk_batch(spark, rows)
    res = match_sequence_batch(
        df, steps=steps, within=within, key_col="k", ts_col="ts",
        payload_col="typ", order_col="ord", **kw
    )
    return sorted(
        (r["key"], r["kind"], r["step_count"], r["ts0"], r["last_ts"])
        for r in res.collect()
    )


_ABC = ["typ = 'A'", "typ = 'B'", "typ = 'C'"]


def test_strict_vs_relaxed_contiguity(spark):
    """A x B x C: strict (Flink next) breaks on x; relaxed (followedBy)
    skips non-matching events and completes the match."""
    rows = [("u", "A", 10), ("u", "x", 20), ("u", "B", 30), ("u", "x", 40), ("u", "C", 50)]
    strict = _run_batch(spark, rows, _ABC, within=100, contiguity="strict")
    relaxed = _run_batch(spark, rows, _ABC, within=100, contiguity="relaxed")
    assert strict == []  # A broken by x; nothing else arms step 0
    assert relaxed == [("u", "match", 3, 10, 50)]


def test_four_step_pattern_with_repeat(spark):
    """N-generality beyond the bounce shape: A B B C matches a 4-step
    pattern with a repeated middle predicate."""
    steps = ["typ = 'A'", "typ = 'B'", "typ = 'B'", "typ = 'C'"]
    rows = [("u", "A", 10), ("u", "B", 20), ("u", "B", 30), ("u", "C", 40)]
    assert _run_batch(spark, rows, steps, within=100) == [("u", "match", 4, 10, 40)]
    # a single B cannot satisfy both middle steps
    rows2 = [("u", "A", 10), ("u", "B", 20), ("u", "C", 30)]
    assert _run_batch(spark, rows2, steps, within=100, emit_timeouts=False) == []


def test_timeout_emission_paths(spark):
    """Both timeout paths: window elapsing before a later event, and
    end-of-history partials."""
    rows = [
        ("u", "A", 10), ("u", "B", 15),   # partial (2 steps), then gap > within
        ("u", "A", 200),                   # re-arms; end of history → timeout(1)
        ("v", "A", 10), ("v", "C", 20),   # strict break in-window: silent
    ]
    got = _run_batch(spark, rows, _ABC, within=50)
    assert got == [
        ("u", "timeout", 1, 200, 200),
        ("u", "timeout", 2, 10, 15),
    ]
    # with emit_timeouts=False the same input is silent
    assert _run_batch(spark, rows, _ABC, within=50, emit_timeouts=False) == []


def test_rearm_last_overlap(spark):
    """rearm_last lets a completed match's final event start the next
    sequence (the bounce chain): with steps (E, E) a run of three
    entries yields two matches sharing middle events."""
    steps = ["typ = 'E'", "typ = 'E'"]
    rows = [("u", "E", 10), ("u", "E", 20), ("u", "E", 30)]
    got = _run_batch(spark, rows, steps, within=100)
    # E@10+E@20 match, E@20 re-arms → E@20+E@30 match, E@30 re-arms →
    # end-of-history timeout
    assert got == [
        ("u", "match", 2, 10, 20),
        ("u", "match", 2, 20, 30),
        ("u", "timeout", 1, 30, 30),
    ]
    restart = _run_batch(spark, rows, steps, within=100, rearm_last=False)
    # without re-arm the 3rd E starts fresh and times out
    assert restart == [
        ("u", "match", 2, 10, 20),
        ("u", "timeout", 1, 30, 30),
    ]
