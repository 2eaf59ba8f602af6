"""Streaming contamination gate: planted overlap routes to quarantine;
replays land idempotently."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.streaming.jobs import (
    release_job_caches,
    start_streaming_decontam,
)

EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta"


def _eval_docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1000, text=EVAL_TEXT)], "doc_id bigint, text string"
    )


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, tmp_path, ckpt_name):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "docs"))
    )
    q = start_streaming_decontam(
        spark,
        stream,
        _eval_docs(spark),
        str(tmp_path / "clean"),
        str(tmp_path / "quarantine"),
        str(tmp_path / ckpt_name),
    )
    q.awaitTermination(150)
    # the gate cached the eval gram hashes for its lifetime; the caller
    # owns the release (ADVICE r3 — repeated gate starts in one session
    # must not accumulate executor cache)
    release_job_caches(q)
    assert all(not df.is_cached for df in q._frdw_caches)


def test_contaminated_docs_quarantined_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)
    _write_batch(src, "b1.jsonl", [
        # shares a 5-gram with the eval doc → quarantine. The doc_id
        # arrives TWICE in the batch — the gate must emit one verdict
        # row, not a fan-out join (ADVICE r3)
        {"doc_id": 1, "text": "intro beta gamma delta epsilon zeta outro"},
        {"doc_id": 1, "text": "intro beta gamma delta epsilon zeta outro"},
        {"doc_id": 2, "text": "totally unrelated words in this clean document here"},
    ])
    _write_batch(src, "b2.jsonl", [
        {"doc_id": 3, "text": EVAL_TEXT},  # verbatim eval doc → quarantine
        {"doc_id": 4, "text": "another clean training document with enough words"},
    ])
    _run(spark, tmp_path, "ckpt")

    clean = spark.read.parquet(str(tmp_path / "clean"))
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    assert quar.count() == 2  # exactly one row per doc_id, no dup fan-out
    qrows = {r["doc_id"]: r for r in quar.collect()}
    assert sorted(qrows) == [1, 3]
    assert qrows[3]["overlap_frac"] == 1.0
    assert qrows[1]["n_hits"] >= 1
    # batches landed in separate pbatch partitions (replay-idempotent layout)
    assert clean.select("pbatch").distinct().count() == 2


def test_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)
    _write_batch(src, "b1.jsonl", [
        {"doc_id": 1, "text": "intro beta gamma delta epsilon zeta outro"},
        {"doc_id": 2, "text": "totally unrelated words in this clean document here"},
    ])
    _run(spark, tmp_path, "ckpt1")
    # full replay with a fresh checkpoint: same batch ids, same
    # partitions — dynamic overwrite replaces instead of duplicating
    _run(spark, tmp_path, "ckpt2")
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert [r["doc_id"] for r in clean.collect()] == [2]
    assert spark.read.parquet(str(tmp_path / "quarantine")).count() == 1


BASE_MS = 1700000000000


def test_training_ingest_pipeline_end_to_end(spark, tmp_path):
    """dedup → decontam → quality routing in one streaming job; every
    input doc lands in exactly one sink (or is dropped as a replay)."""
    from pyspark.sql import functions as F
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_training_ingest_pipeline,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)
    good = ("a solid training document with plenty of distinct useful words "
            "covering the needed range of the quality features nicely")
    _write_batch(src, "b1.jsonl", [
        {"doc_id": 1, "text": good, "ts": BASE_MS},
        {"doc_id": 2, "text": good, "ts": BASE_MS + 1000},  # exact replay → dropped
        {"doc_id": 3, "text": "intro beta gamma delta epsilon zeta outro", "ts": BASE_MS + 2000},  # contaminated
        # one repeated long word: unique-ratio and word-length features
        # collapse → scores far below the keep threshold
        {"doc_id": 4, "text": "zzzzzzzzzz zzzzzzzzzz zzzzzzzzzz zzzzzzzzzz", "ts": BASE_MS + 3000},
    ])
    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts bigint")
        .json(src)
        .withColumn("event_time", F.timestamp_millis(F.col("ts")))
    )
    q = start_training_ingest_pipeline(
        spark,
        stream,
        _eval_docs(spark),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(150)

    clean = [r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out/clean")).collect()]
    quar = [r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out/quarantine")).collect()]
    lowq = [r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out/low_quality")).collect()]
    assert clean == [1]
    assert quar == [3]
    assert lowq == [4]
