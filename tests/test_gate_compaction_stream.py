"""Compaction composed INTO the streaming near-dup gate (round-8 item 3):
``start_history_dedup_ingest(near_dup_gate=True, compact_every=N)`` folds
the lsh stores every N batches without changing a single verdict —
probes across a compaction boundary match an uncompacted twin run,
a crash MID-compaction-swap converges on replay, and a crash AFTER
compaction but before the checkpoint commit replays idempotently
(the in-flight batch's partition is excluded from the fold)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.dedup import (
    COMPACTED_PBATCH,
)
from flink_realtime_data_warehouse_spark.streaming.jobs import (
    start_history_dedup_ingest,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

BATCHES = [
    [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": "totally different words entirely over here"},
    ],
    [
        {"doc_id": 3, "text": BASE + " lambda"},  # near-dup of 1
        {"doc_id": 4, "text": "unrelated fresh content appears in this doc"},
    ],
    # arrives AFTER the compact_every=2 boundary: must still probe
    # against the folded (sentinel-partition) history of docs 1-4
    [
        {"doc_id": 5, "text": BASE + " mu"},  # near-dup of 1 and 3
        {"doc_id": 6, "text": "yet another wholly novel document body"},
    ],
    [
        {"doc_id": 7, "text": "unrelated fresh content appears in this doc too"},
    ],
]


def _write_batches(src, batches=BATCHES):
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows) + "\n")
        # FileStreamSource orders batches by modification time; files
        # written inside one clock tick would arrive in arbitrary order
        os.utime(p, (1_000_000_000.0 + i, 1_000_000_000.0 + i))


def _run(spark, root, ckpt="ckpt", out="out", compact_every=None):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(os.path.join(root, "docs"))
    )
    q = start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(root, out),
        os.path.join(root, ckpt),
        near_dup_gate=True,
        compact_every=compact_every,
    )
    q.awaitTermination(300)


def _near_pairs(spark, out_dir):
    return sorted(
        (r.doc_id, r.doc_hist)
        for r in spark.read.parquet(os.path.join(out_dir, "near_dups")).collect()
    )


def _clean_ids(spark, out_dir):
    return sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(out_dir, "clean")).collect()
    )


def test_cadenced_compaction_matches_uncompacted_twin(spark, tmp_path):
    root = str(tmp_path)
    _write_batches(os.path.join(root, "docs"))
    _run(spark, root, ckpt="ckpt_c", out="out_c", compact_every=2)
    _run(spark, root, ckpt="ckpt_u", out="out_u", compact_every=None)

    # verdicts byte-identical across the compaction boundary: batch 2's
    # probe ran against the folded sentinel partition in out_c and the
    # raw per-batch partitions in out_u
    assert _near_pairs(spark, os.path.join(root, "out_c")) == _near_pairs(
        spark, os.path.join(root, "out_u")
    )
    assert (3, 1) in _near_pairs(spark, os.path.join(root, "out_c"))
    assert {(5, 1), (5, 3)} <= set(_near_pairs(spark, os.path.join(root, "out_c")))
    assert _clean_ids(spark, os.path.join(root, "out_c")) == _clean_ids(
        spark, os.path.join(root, "out_u")
    ) == [1, 2, 3, 4, 5, 6, 7]

    # the folded df store is one row per shingle on the sentinel
    # partition (batches 0-2 folded by the batch-3 compaction; batch 3
    # itself excluded from the fold, so its delta partition survives)
    df_store = spark.read.parquet(os.path.join(root, "out_c", "lsh", "df"))
    pbatches = {r.pbatch for r in df_store.select("pbatch").distinct().collect()}
    assert COMPACTED_PBATCH in pbatches
    assert len(pbatches) == 2  # sentinel + the excluded in-flight batch
    sent = df_store.filter(F.col("pbatch") == COMPACTED_PBATCH)
    assert sent.count() == sent.select("s").distinct().count()

    # accumulated df preserved exactly: per-shingle totals match the
    # uncompacted twin's
    totals_c = {
        r.s: r.total
        for r in df_store.groupBy("s").agg(F.sum("df").alias("total")).collect()
    }
    df_u = spark.read.parquet(os.path.join(root, "out_u", "lsh", "df"))
    totals_u = {
        r.s: r.total
        for r in df_u.groupBy("s").agg(F.sum("df").alias("total")).collect()
    }
    assert totals_c == totals_u

    # band rows cover the same documents either way
    bands_c = spark.read.parquet(os.path.join(root, "out_c", "lsh", "bands"))
    bands_u = spark.read.parquet(os.path.join(root, "out_u", "lsh", "bands"))
    assert sorted(
        map(tuple, bands_c.select("doc_id", "band", "key").collect())
    ) == sorted(map(tuple, bands_u.select("doc_id", "band", "key").collect()))


def test_crash_mid_compaction_swap_in_stream_converges(spark, tmp_path, monkeypatch):
    """Kill the job between compaction's rename-away and rename-in of
    the bands store — the store is MISSING on disk at that instant —
    then restart from the same checkpoint: the gate's repair sweep must
    restore the store before the existence probe (never an empty cold
    start), the batch must replay to identical verdicts, and the
    retried compaction must complete."""
    root = str(tmp_path)
    _write_batches(os.path.join(root, "docs"))

    real_rename = os.rename
    state = {"armed": True}

    def faulty_rename(src, dst):
        if (
            state["armed"]
            and "__tmp_" in str(src)
            and str(dst).endswith(os.path.join("lsh", "bands"))
        ):
            state["armed"] = False
            raise RuntimeError("injected mid-compaction-swap crash")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", faulty_rename)
    with pytest.raises(Exception, match="injected|Injected|STREAM"):
        _run(spark, root, ckpt="ckpt", out="out", compact_every=2)
    monkeypatch.setattr(os, "rename", real_rename)

    # the fault landed mid-swap: bands dir renamed away, backup stranded
    lsh = os.path.join(root, "out", "lsh")
    assert not os.path.isdir(os.path.join(lsh, "bands"))
    assert any(d.startswith("bands__old_") for d in os.listdir(lsh))

    _run(spark, root, ckpt="ckpt", out="out", compact_every=2)

    # converged to exactly the clean-run state
    _run(spark, root, ckpt="ckpt_ref", out="out_ref", compact_every=2)
    assert _near_pairs(spark, os.path.join(root, "out")) == _near_pairs(
        spark, os.path.join(root, "out_ref")
    )
    assert _clean_ids(spark, os.path.join(root, "out")) == [1, 2, 3, 4, 5, 6, 7]
    # no swap debris left behind
    assert not [d for d in os.listdir(lsh) if "__old_" in d or "__tmp_" in d]
    df_store = spark.read.parquet(os.path.join(lsh, "df"))
    sent = df_store.filter(F.col("pbatch") == COMPACTED_PBATCH)
    assert sent.count() == sent.select("s").distinct().count()


def test_replay_after_completed_compaction_is_idempotent(spark, tmp_path):
    """Crash AFTER compaction succeeded but BEFORE the checkpoint
    commit: the redelivered batch must re-derive identical stores. This
    only holds because compaction excludes the in-flight batch's
    partition from the fold — folding it would double-count its df
    delta on replay."""
    root = str(tmp_path)
    # 2 batches, compact_every=2: compaction runs on the LAST batch
    _write_batches(os.path.join(root, "docs"), BATCHES[:2])
    _run(spark, root, compact_every=2)

    out = os.path.join(root, "out")
    before_near = _near_pairs(spark, out)
    df_path = os.path.join(out, "lsh", "df")
    bands_path = os.path.join(out, "lsh", "bands")
    before_df = sorted(map(tuple, spark.read.parquet(df_path).collect()))
    before_bands = sorted(map(tuple, spark.read.parquet(bands_path).collect()))

    shutil.rmtree(os.path.join(root, "ckpt", "commits"))
    _run(spark, root, compact_every=2)

    assert _near_pairs(spark, out) == before_near == [(3, 1)]
    assert sorted(map(tuple, spark.read.parquet(df_path).collect())) == before_df
    assert (
        sorted(map(tuple, spark.read.parquet(bands_path).collect()))
        == before_bands
    )
    assert _clean_ids(spark, out) == [1, 2, 3, 4]


def _run_plain(spark, root, ckpt="ckpt", out="out", compact_every=None):
    """Ingest WITHOUT the near-dup gate (digest store only)."""
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(os.path.join(root, "docs"))
    )
    q = start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(root, out),
        os.path.join(root, ckpt),
        compact_every=compact_every,
    )
    q.awaitTermination(300)


def test_digest_compaction_preserves_dedup_verdicts(spark, tmp_path):
    """Digest-store compaction every 2 batches: a duplicate arriving
    AFTER the boundary must still classify dup_history against the
    folded sentinel partition, clean/dups match the uncompacted twin,
    and the digest store ends with sentinel + the excluded in-flight
    partition only."""
    root = str(tmp_path)
    batches = [
        [{"doc_id": 1, "text": "first unique document"},
         {"doc_id": 2, "text": "second unique document"}],
        [{"doc_id": 3, "text": "third unique document"}],
        # batch 2 probes AFTER the compact_every=2 boundary
        [{"doc_id": 4, "text": "first unique document"},   # dup of folded b0
         {"doc_id": 5, "text": "third unique document"},   # dup of kept b1
         {"doc_id": 6, "text": "fourth unique document"}],
        [{"doc_id": 7, "text": "fourth unique document"}],  # dup of b2
    ]
    _write_batches(os.path.join(root, "docs"), batches)
    _run_plain(spark, root, ckpt="ckpt_c", out="out_c", compact_every=2)
    _run_plain(spark, root, ckpt="ckpt_u", out="out_u", compact_every=None)

    for out in ("out_c", "out_u"):
        dups = {
            r.doc_id: r.status
            for r in spark.read.parquet(os.path.join(root, out, "dups")).collect()
        }
        assert dups == {4: "dup_history", 5: "dup_history", 7: "dup_history"}
        assert _clean_ids(spark, os.path.join(root, out)) == [1, 2, 3, 6]

    dig = spark.read.parquet(os.path.join(root, "out_c", "digests"))
    pbatches = {r.pbatch for r in dig.select("pbatch").distinct().collect()}
    # batch 3 (the excluded in-flight partition) carried no NEW digests
    # — doc 7 is a pure duplicate — so every data row lives on the
    # sentinel after the batch-3 compaction folded batches 0-2
    assert pbatches == {COMPACTED_PBATCH}
    # every unique hash survives the fold exactly once
    assert dig.count() == dig.select("content_hash").distinct().count() == 4


def test_digest_compaction_replay_idempotent(spark, tmp_path):
    """Crash after a digest compaction but before the checkpoint
    commit: the redelivered batch re-derives identical stores (its own
    partition was excluded from the fold)."""
    root = str(tmp_path)
    batches = [
        [{"doc_id": 1, "text": "doc one"}, {"doc_id": 2, "text": "doc two"}],
        [{"doc_id": 3, "text": "doc one"}, {"doc_id": 4, "text": "doc three"}],
    ]
    _write_batches(os.path.join(root, "docs"), batches)
    _run_plain(spark, root, compact_every=2)
    out = os.path.join(root, "out")
    dig_path = os.path.join(out, "digests")
    before = sorted(map(tuple, spark.read.parquet(dig_path).collect()))
    before_clean = _clean_ids(spark, out)

    shutil.rmtree(os.path.join(root, "ckpt", "commits"))
    _run_plain(spark, root, compact_every=2)
    assert sorted(map(tuple, spark.read.parquet(dig_path).collect())) == before
    assert _clean_ids(spark, out) == before_clean == [1, 2, 4]


def test_crash_mid_digest_compaction_swap_converges(spark, tmp_path, monkeypatch):
    """Kill between the digest store's rename-away and rename-in, then
    restart: the repair sweep restores the store before the existence
    probe (known duplicates must NOT classify as new) and the retried
    compaction completes."""
    root = str(tmp_path)
    batches = [
        [{"doc_id": 1, "text": "doc one"}, {"doc_id": 2, "text": "doc two"}],
        [{"doc_id": 3, "text": "doc three"}],
        [{"doc_id": 4, "text": "doc one"}],  # dup of folded history
    ]
    _write_batches(os.path.join(root, "docs"), batches)

    real_rename = os.rename
    state = {"armed": True}

    def faulty_rename(src, dst):
        if (
            state["armed"]
            and "__tmp_" in str(src)
            and str(dst).endswith("digests")
        ):
            state["armed"] = False
            raise RuntimeError("injected mid-digest-swap crash")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", faulty_rename)
    with pytest.raises(Exception, match="injected|Injected|STREAM"):
        _run_plain(spark, root, compact_every=2)
    monkeypatch.setattr(os, "rename", real_rename)

    out = os.path.join(root, "out")
    assert not os.path.isdir(os.path.join(out, "digests"))
    assert any(d.startswith("digests__old_") for d in os.listdir(out))

    _run_plain(spark, root, compact_every=2)
    dups = {
        r.doc_id: r.status
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert dups == {4: "dup_history"}
    assert _clean_ids(spark, out) == [1, 2, 3]
    assert not [d for d in os.listdir(out) if "__old_" in d or "__tmp_" in d]
