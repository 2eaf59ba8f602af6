"""Retention / right-to-erasure (round 8): takedown_documents purges a
doc set from every store of the history-dedup lake, idempotently and
crash-safely, with the digest policy fork (block re-ingestion vs full
unblock) pinned."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.streaming.jobs import (
    start_history_dedup_ingest,
)
from flink_realtime_data_warehouse_spark.streaming.retention import (
    reapply_tombstones,
    takedown_documents,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

BATCHES = [
    [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": "second wholly unrelated document body"},
        {"doc_id": 3, "text": "third unique document text entirely"},
    ],
    [
        {"doc_id": 4, "text": BASE},                # exact dup of 1
        {"doc_id": 5, "text": BASE + " lambda"},    # near-dup of 1
        {"doc_id": 6, "text": "sixth document with novel words"},
    ],
]


def _build_lake(spark, root, batches=BATCHES, ckpt="ckpt", out="out"):
    src = os.path.join(root, "docs")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (1_000_000_000.0 + i, 1_000_000_000.0 + i))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(root, out),
        os.path.join(root, ckpt),
        near_dup_gate=True,
    )
    q.awaitTermination(300)
    return os.path.join(root, out)


def _clean_ids(spark, out):
    return sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(out, "clean")).collect()
    )


def _reingest(spark, root, rows, out, ckpt):
    src = os.path.join(root, f"docs_{ckpt}")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "r.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_history_dedup_ingest(
        spark, stream, out, os.path.join(root, ckpt), near_dup_gate=True
    )
    q.awaitTermination(300)


def test_takedown_purges_every_store_and_blocks_reingest(spark, tmp_path):
    root = str(tmp_path)
    out = _build_lake(spark, root)
    assert _clean_ids(spark, out) == [1, 2, 3, 5, 6]

    removed = takedown_documents(spark, out, [1, 5])
    assert removed["clean"] == 2
    assert removed["lsh/bands"] > 0
    assert removed["near_dups"] == 1  # the (5, 1) candidate pair
    assert removed["digests"] == 0  # policy default: content stays blocked

    assert _clean_ids(spark, out) == [2, 3, 6]
    bands = spark.read.schema(
        "doc_id bigint, band int, key string, pbatch string"
    ).parquet(os.path.join(out, "lsh", "bands"))
    assert not {1, 5} & {r.doc_id for r in bands.select("doc_id").collect()}
    near = os.path.join(out, "near_dups")
    nd = spark.read.schema("doc_id bigint, doc_hist bigint, pbatch string").parquet(near)
    assert nd.count() == 0

    # block_reingest=True: a re-crawl of the purged content under a
    # FRESH checkpoint classifies dup_history — it never re-enters
    _reingest(spark, root, [{"doc_id": 100, "text": BASE}], out, "ckpt2")
    assert 100 not in _clean_ids(spark, out)
    dups = {
        r.doc_id: r.status
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert dups[100] == "dup_history"


def test_takedown_unblock_policy_respects_surviving_carriers(spark, tmp_path):
    """block_reingest=False removes a digest ONLY when no surviving
    clean doc carries the content: purging the DUPLICATE of kept
    content must not unblock it, purging the sole carrier must."""
    root = str(tmp_path)
    out = _build_lake(spark, root)

    # doc 3 is the sole carrier of its text; doc 1 is the canonical of
    # BASE — purge 3 (sole) with unblock, and purge nothing else
    removed = takedown_documents(spark, out, [3], block_reingest=False)
    assert removed["digests"] == 1
    _reingest(spark, root, [{"doc_id": 200, "text": "third unique document text entirely"}], out, "ckpt2")
    assert 200 in _clean_ids(spark, out)  # unblocked: re-enters

    # purging dup doc 4 (canonical 1 survives in clean) unblocks nothing
    removed = takedown_documents(spark, out, [4], block_reingest=False)
    assert removed["digests"] == 0
    _reingest(spark, root, [{"doc_id": 300, "text": BASE}], out, "ckpt3")
    assert 300 not in _clean_ids(spark, out)


def test_takedown_idempotent_and_tombstone_reapply(spark, tmp_path):
    root = str(tmp_path)
    out = _build_lake(spark, root)
    takedown_documents(spark, out, [1])
    after = _clean_ids(spark, out)
    # re-run: nothing else changes
    removed = takedown_documents(spark, out, [1])
    assert removed["clean"] == 0
    assert _clean_ids(spark, out) == after == [2, 3, 5, 6]
    # reapply from the log converges too
    removed = reapply_tombstones(spark, out)
    assert removed["clean"] == 0
    assert _clean_ids(spark, out) == after


def test_takedown_crash_mid_swap_reapply_converges(spark, tmp_path, monkeypatch):
    """Kill between a clean PARTITION's rename-away and rename-in (the
    pruned rewrite swaps per partition): the partition is a half-swap
    (``pbatch=X__old_*`` present, ``pbatch=X`` missing) at that
    instant; the repair sweep rolls it back and reapply_tombstones
    finishes the job."""
    root = str(tmp_path)
    out = _build_lake(spark, root)

    real_rename = os.rename
    state = {"armed": True}

    def faulty(s, d):
        # the stage→partition rename of the clean store's pruned purge
        if state["armed"] and "clean__tmp_" in str(s) and "pbatch=" in str(s):
            state["armed"] = False
            raise RuntimeError("injected mid-takedown-swap crash")
        return real_rename(s, d)

    monkeypatch.setattr(os, "rename", faulty)
    with pytest.raises(RuntimeError, match="injected"):
        takedown_documents(spark, out, [1, 5])
    monkeypatch.setattr(os, "rename", real_rename)

    clean = os.path.join(out, "clean")
    assert any("__old_" in d for d in os.listdir(clean))  # half-swapped partition
    removed = reapply_tombstones(spark, out)  # sweeps, then purges
    assert removed["clean"] == 2
    assert _clean_ids(spark, out) == [2, 3, 6]
    leftovers = [
        os.path.join(r, d)
        for r, dirs, _f in os.walk(out)
        for d in dirs
        if "__old_" in d or "__tmp_" in d
    ]
    assert not leftovers


def _snap_files(root):
    """{relpath: (size, mtime_ns)} for every data file under root."""
    out = {}
    for r, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_takedown_leaves_cold_partitions_byte_identical(spark, tmp_path):
    """Purge a doc confined to the LAST batch: every file of every
    other pbatch partition (and the untouched digests/dups stores)
    must be byte-identical afterwards — same path, size, and mtime —
    proving the pruned rewrite never opened the cold partitions, so
    erasure cost scales with the purge's batch footprint, not the
    lake."""
    root = str(tmp_path)
    out = _build_lake(spark, root)

    before = _snap_files(out)
    removed = takedown_documents(spark, out, [6])  # unique doc, batch 1
    assert removed["clean"] == 1
    assert removed["near_dups"] == 0 and removed["digests"] == 0
    after = _snap_files(out)

    touched = {
        p
        for p in set(before) | set(after)
        if before.get(p) != after.get(p)
    }
    assert touched  # the purge really rewrote something
    for p in touched:
        if p.startswith("_tombstones"):
            continue  # the append-only log grows by design
        seg = next(s for s in p.split(os.sep) if s.startswith("pbatch="))
        assert seg.endswith("-1"), f"cold partition rewritten: {p}"
    # and doc 6 is really gone
    assert _clean_ids(spark, out) == [1, 2, 3, 5]


def test_respect_tombstones_blocks_replay_resurrection(spark, tmp_path):
    """Erasure wins over checkpoint redelivery: takedown, then erase
    the commit marker so the last batch replays — with
    respect_tombstones=True the purged doc's payload/evidence stay
    gone while its digest still blocks re-ingestion."""
    root = str(tmp_path)
    src = os.path.join(root, "docs")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        p = os.path.join(src, f"b{i}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (1_000_000_000.0 + i, 1_000_000_000.0 + i))

    def run():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = start_history_dedup_ingest(
            spark,
            stream,
            os.path.join(root, "out"),
            os.path.join(root, "ckpt"),
            near_dup_gate=True,
            respect_tombstones=True,
        )
        q.awaitTermination(300)

    run()
    out = os.path.join(root, "out")
    takedown_documents(spark, out, [5])  # doc 5 arrived in the LAST batch
    assert _clean_ids(spark, out) == [1, 2, 3, 6]

    # crash-after-write replay of the last batch: without the flag this
    # would dynamic-overwrite doc 5 back into clean
    shutil.rmtree(os.path.join(root, "ckpt", "commits"))
    run()
    assert _clean_ids(spark, out) == [1, 2, 3, 6]
    bands = spark.read.schema(
        "doc_id bigint, band int, key string, pbatch string"
    ).parquet(os.path.join(out, "lsh", "bands"))
    assert 5 not in {r.doc_id for r in bands.select("doc_id").distinct().collect()}
    # the digest still blocks the purged content from re-entering
    _reingest(spark, root, [{"doc_id": 500, "text": BASE + " lambda"}], out, "ckpt_b")
    assert 500 not in _clean_ids(spark, out)


def test_vector_takedown_purges_cells_and_tail(spark, tmp_path):
    """takedown_vectors removes ids from the streaming IVF index's
    cells AND delta tail; probes stop returning them; reapply after a
    mid-swap crash converges."""
    import pytest as _pytest

    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _load_emb,
        _query_block,
        ann_ivf_probe,
    )
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_embedding_ingest,
    )
    from flink_realtime_data_warehouse_spark.streaming.retention import (
        reapply_vector_tombstones,
        takedown_vectors,
    )

    root = str(tmp_path)
    sf_dir = "/root/testdata/sf0.001"
    emb = _load_emb(spark, sf_dir)
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    m5 = F.pmod("vec_id", F.lit(5))
    for i, cond in enumerate((m5 < 4, m5 == 4)):
        part = emb.filter(cond)
        tmp = os.path.join(root, f"sl{i}")
        part.select(F.to_json(F.struct("vec_id", "v")).alias("j")).coalesce(
            1
        ).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, f"{i}.jsonl")
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        shutil.move(os.path.join(tmp, parts[0]), dst)
        os.utime(dst, (1_000_000_000.0 + i, 1_000_000_000.0 + i))
    stream = (
        spark.readStream.schema("vec_id bigint, v array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    index_root = os.path.join(root, "index")
    start_embedding_ingest(
        spark, stream, index_root, os.path.join(root, "ckpt")
    ).awaitTermination(300)

    # purge one cells-resident id (m5<4) and one tail-resident (m5==4)
    all_ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cells_victim = next(i for i in all_ids if i % 5 < 4 and i >= 20)
    tail_victim = next(i for i in all_ids if i % 5 == 4 and i >= 20)
    removed = takedown_vectors(spark, index_root, [cells_victim, tail_victim])
    assert removed["cells"] == 1 and removed["_deltas"] == 1

    qp = _query_block(spark, emb, sf_dir)
    neighbors = {
        r.neighbor_id for r in ann_ivf_probe(spark, index_root, qp).collect()
    }
    assert cells_victim not in neighbors and tail_victim not in neighbors

    # idempotent + reapply converge
    removed = takedown_vectors(spark, index_root, [cells_victim, tail_victim])
    assert removed == {"cells": 0, "_deltas": 0}
    assert reapply_vector_tombstones(spark, index_root) == {
        "cells": 0,
        "_deltas": 0,
    }
