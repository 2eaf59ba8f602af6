"""Streaming windowed aggregations: watermark-driven finalization in
append mode, across two availableNow runs (checkpoint recovery)."""

import json
import os

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.parse import parse_with_dirty
from flink_realtime_data_warehouse_spark.schemas import BEHAVIOR_LOG_SCHEMA
from flink_realtime_data_warehouse_spark.sources.streams import read_jsonl_stream
from flink_realtime_data_warehouse_spark.streaming.windows import tumbling_traffic_rollup

H = 3600_000
BASE = 1658793600000  # 2022-07-26 00:00 UTC


def _ev(mid, ts, page_id="home"):
    return json.dumps({"common": {"mid": mid, "is_new": "0"}, "page": {"page_id": page_id}, "ts": ts})


def _write(dir_, name, lines):
    os.makedirs(dir_, exist_ok=True)
    with open(os.path.join(dir_, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _run(spark, src, out, ckpt):
    raw = read_jsonl_stream(spark, src)
    clean, _ = parse_with_dirty(raw, BEHAVIOR_LOG_SCHEMA)
    ev = clean.select(
        F.col("common.mid").alias("mid"),
        F.lit("page").alias("event_type"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    rollup = tumbling_traffic_rollup(ev, window="1 hour", watermark="0 seconds")
    q = (
        rollup.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)


def test_tumbling_rollup_append_finalization(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    # hour-0: three events / two devices; hour-1: one event
    _write(src, "b1.jsonl", [
        _ev("A", BASE + 10_000),
        _ev("B", BASE + 20_000),
        _ev("A", BASE + 30_000),
        _ev("A", BASE + H + 10_000),
    ])
    _run(spark, src, out, ckpt)

    # watermark after run 1 = BASE+H+10s → hour-0 window is final
    got = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("2022-07-26T00:00:00", 3) in got

    # run 2: an event two hours later finalizes the hour-1 window
    _write(src, "b2.jsonl", [_ev("C", BASE + 3 * H)])
    _run(spark, src, out, ckpt)
    got2 = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("2022-07-26T01:00:00", 1) in got2


def test_lang_id_udf(spark):
    from flink_realtime_data_warehouse_spark.functions.text import lang_id

    rows = [
        ("the cat sat on the mat and that is that",),
        ("le chat est sur la table et il est content",),
        ("der Hund ist nicht in das Haus und schläft",),
        ("el perro es grande y la casa es bonita",),
        ("我是一个人，他不是，我们都在这里",),
        ("",),
    ]
    df = spark.createDataFrame(rows, ["text"]).select(lang_id("text").alias("lang"))
    assert [r["lang"] for r in df.collect()] == ["en", "fr", "de", "es", "zh", "und"]


def test_sliding_rollup_overlapping_windows(spark, tmp_path):
    """Each event lands in window/slide overlapping windows; finalized
    windows carry the summed counts."""
    from flink_realtime_data_warehouse_spark.streaming.windows import (
        sliding_traffic_rollup,
    )

    src, out, ckpt = str(tmp_path / "s2"), str(tmp_path / "o2"), str(tmp_path / "c2")
    _write(src, "b1.jsonl", [
        _ev("A", BASE + 10_000),           # hour-0 early
        _ev("B", BASE + 45 * 60_000),      # hour-0 late (also in :30 window)
        _ev("A", BASE + 3 * H),            # far ahead → advances watermark
    ])
    raw = read_jsonl_stream(spark, src)
    clean, _ = parse_with_dirty(raw, BEHAVIOR_LOG_SCHEMA)
    ev = clean.select(
        F.col("common.mid").alias("mid"),
        F.lit("page").alias("event_type"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    rollup = sliding_traffic_rollup(ev, window="1 hour", slide="30 minutes",
                                    watermark="0 seconds")
    q = (
        rollup.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)
    got = {(r["window_start"].minute, r["window_start"].hour): r["n_events"]
           for r in spark.read.parquet(out).collect()}
    # window [-0:30, 0:30) holds the :10 event; [0:00, 1:00) holds both;
    # [0:30, 1:30) holds the :45 event
    assert sum(got.values()) >= 4  # 2 events x 2 windows each (finalized subset)
