"""Fault-injection tier (round-7 item 3): every prior replay test ended
its batch cleanly; these kill a job MID-foreachBatch — after some sink
files are written / some partition dirs swapped, before the batch
commits — and verify restart converges with no loss, no duplicates,
and untouched partitions byte-identical."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.streaming import (
    table_format as format_mod,
)
from flink_realtime_data_warehouse_spark.streaming.sinks import DimStore

#: kill-matrix fault-injection tier — deselected from the default (driver-window) profile;
#: runs in the recorded slow-tier pass (see pytest.ini)
pytestmark = pytest.mark.slowtier



class _FaultyOS:
    """Proxy for the ``os`` module that crashes on the N-th
    tmp→partition swap rename — the moment AFTER the target partition
    was renamed away to its ``__old`` backup and BEFORE its
    replacement landed (the worst instant to die in)."""

    def __init__(self, real, fail_on_swap: int):
        self._real = real
        self._swaps = 0
        self._fail_on = fail_on_swap

    def __getattr__(self, name):
        return getattr(self._real, name)

    def rename(self, src, dst):
        if "__tmp_" in src and os.path.basename(dst).startswith("_pk_part="):
            self._swaps += 1
            if self._swaps == self._fail_on:
                raise RuntimeError("injected mid-swap crash")
        return self._real.rename(src, dst)


def _partition_stamps(table_dir: str) -> dict:
    """{partition dir: sorted [(file, md5)]} — byte-level identity."""
    out = {}
    for d in os.listdir(table_dir):
        if not d.startswith("_pk_part=") or "__" in d:
            continue
        files = []
        pdir = os.path.join(table_dir, d)
        for f in sorted(os.listdir(pdir)):
            p = os.path.join(pdir, f)
            if os.path.isfile(p):
                with open(p, "rb") as fh:
                    files.append((f, hashlib.md5(fh.read()).hexdigest()))
        out[d] = files
    return out


def _two_ids_in_distinct_partitions(spark, ids, n_parts):
    rows = spark.createDataFrame([(i,) for i in ids], ["id"]).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(n_parts)).cast("int").alias("p")
    ).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p, r.id)
    parts = sorted(by_part)
    assert len(parts) >= 2
    return [by_part[parts[0]], by_part[parts[1]]], {r.id: r.p for r in rows}


def test_dimstore_mid_swap_crash_then_repair_converges(spark, tmp_path, monkeypatch):
    store = DimStore(spark, str(tmp_path / "dim"))
    ids = [str(i) for i in range(1, 9)]
    store.upsert(
        "t",
        spark.createDataFrame([(i, f"v{i}") for i in ids], ["id", "name"]),
    )
    table_dir = str(tmp_path / "dim" / "t")
    before = _partition_stamps(table_dir)

    upd_ids, part_of = _two_ids_in_distinct_partitions(spark, ids, 16)
    batch2 = spark.createDataFrame(
        [(i, f"NEW{i}") for i in upd_ids], ["id", "name"]
    )
    # the swap renames live in the table-format seam since r10 — the
    # injection point moved with them
    monkeypatch.setattr(format_mod, "os", _FaultyOS(os, fail_on_swap=2))
    with pytest.raises(Exception, match="injected"):
        store.upsert("t", batch2)
    monkeypatch.setattr(format_mod, "os", os)

    # the crash left a half-swap: one updated partition missing, its
    # backup stranded — exactly the data-loss window repair closes
    damaged = [d for d in os.listdir(table_dir) if "__old_" in d]
    assert damaged, "fault did not land mid-swap"

    # replay (the checkpoint would redeliver the same batch): repair
    # rolls the half-swap back, then the merge re-applies in full
    store.upsert("t", batch2)
    got = {r["id"]: r["name"] for r in store.read("t").collect()}
    assert got == {
        i: (f"NEW{i}" if i in upd_ids else f"v{i}") for i in ids
    }
    # no repair debris left behind
    assert not [d for d in os.listdir(table_dir) if "__old_" in d]
    # partitions the batch never touched are byte-identical
    after = _partition_stamps(table_dir)
    touched = {f"_pk_part={part_of[i]}" for i in upd_ids}
    for d, stamp in before.items():
        if d not in touched:
            assert after[d] == stamp, f"untouched partition rewritten: {d}"


def test_dimstore_repair_restores_whole_table_swap(spark, tmp_path):
    """Legacy unpartitioned rewrite path: crash between rename-away and
    rename-in leaves the table dir missing entirely — repair restores
    the backup so no read ever sees an absent table."""
    store = DimStore(spark, str(tmp_path / "dim"))
    store.upsert(
        "t", spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "name"])
    )
    path = str(tmp_path / "dim" / "t")
    os.rename(path, path + "__old_deadbeef")  # simulate the half-swap
    got = {r["id"]: r["name"] for r in store.read("t").collect()}
    assert got == {"1": "a", "2": "b"}
    assert os.path.isdir(path)


def test_dim_router_streaming_mid_swap_crash_replay(spark, tmp_path, monkeypatch):
    """End-to-end: the DimApp streaming topology killed inside its
    foreachBatch upsert, restarted from the same checkpoint."""
    from flink_realtime_data_warehouse_spark.schemas import TABLE_PROCESS_SCHEMA
    from flink_realtime_data_warehouse_spark.sources.streams import (
        read_jsonl_stream,
    )
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        parse_changelog_stream,
    )
    from flink_realtime_data_warehouse_spark.streaming.router import start_dim_app

    config_path = str(tmp_path / "config")
    spark.createDataFrame(
        [("user_info", "dim_user_info", "id,name", "id", None)],
        TABLE_PROCESS_SCHEMA,
    ).coalesce(1).write.parquet(config_path)

    src = str(tmp_path / "cdc")
    os.makedirs(src, exist_ok=True)

    def cdc_line(i, name):
        return json.dumps({
            "database": "gmall", "table": "user_info", "type": "insert",
            "data": {"id": str(i), "name": name},
        })

    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        f.write("\n".join(cdc_line(i, f"v{i}") for i in range(1, 9)))

    store = DimStore(spark, str(tmp_path / "dim"))

    def run():
        q = start_dim_app(
            spark,
            parse_changelog_stream(read_jsonl_stream(spark, src)),
            config_path,
            store,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

    run()
    table_dir = str(tmp_path / "dim" / "dim_user_info")
    before = _partition_stamps(table_dir)
    ids = [str(i) for i in range(1, 9)]
    upd_ids, part_of = _two_ids_in_distinct_partitions(spark, ids, 16)

    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write("\n".join(cdc_line(i, f"NEW{i}") for i in upd_ids))
    monkeypatch.setattr(format_mod, "os", _FaultyOS(os, fail_on_swap=2))
    with pytest.raises(Exception):
        run()
    monkeypatch.setattr(format_mod, "os", os)
    assert [d for d in os.listdir(table_dir) if "__old_" in d]

    run()  # restart: same checkpoint redelivers the crashed batch
    got = {r["id"]: r["name"] for r in store.read("dim_user_info").collect()}
    assert got == {i: (f"NEW{i}" if i in upd_ids else f"v{i}") for i in ids}
    after = _partition_stamps(table_dir)
    touched = {f"_pk_part={part_of[i]}" for i in upd_ids}
    for d, stamp in before.items():
        if d not in touched:
            assert after[d] == stamp, f"untouched partition rewritten: {d}"


def test_history_dedup_crash_between_sinks_replay(spark, tmp_path, monkeypatch):
    """Kill the ingest AFTER the clean sink wrote its files but BEFORE
    the dups/digest sinks ran (mid-batch, uncommitted): restart must
    re-derive the batch with no duplicate admission and a complete
    digest store."""
    from pyspark.sql.readwriter import DataFrameWriter

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in [
            {"doc_id": 1, "text": "one one one"},
            {"doc_id": 2, "text": "two two two"},
            {"doc_id": 3, "text": "one one one"},  # within-batch dup
        ]))

    def run():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = start_history_dedup_ingest(
            spark, stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        q.awaitTermination()

    real_parquet = DataFrameWriter.parquet

    def faulty_parquet(self, path, **kw):
        if path.endswith("/dups"):
            raise RuntimeError("injected crash before dups sink")
        return real_parquet(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", faulty_parquet)
    with pytest.raises(Exception):
        run()
    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)

    # damage: clean has the batch's partition, digest store absent
    clean_dir = str(tmp_path / "out" / "clean")
    assert os.path.isdir(clean_dir)
    assert not os.path.isdir(str(tmp_path / "out" / "digests"))

    run()  # restart replays the uncommitted batch
    clean = sorted(
        r.doc_id for r in spark.read.parquet(clean_dir).collect()
    )
    assert clean == [1, 2]  # no duplicate admission, no loss
    dups = {r.doc_id: r.status for r in
            spark.read.parquet(str(tmp_path / "out" / "dups")).collect()}
    assert dups == {3: "dup_batch"}
    digests = spark.read.parquet(str(tmp_path / "out" / "digests"))
    assert digests.select("content_hash").distinct().count() == 2
    # exactly one pbatch partition per sink — the replay overwrote its
    # own first attempt instead of stacking a second copy
    assert spark.read.parquet(clean_dir).select("pbatch").distinct().count() == 1


def test_rollup_mid_batch_crash_after_write_replay(spark, tmp_path, monkeypatch):
    """Windowed-rollup store: the batch's partial write SUCCEEDS, then
    the job dies before the checkpoint commit. Restart replays the
    batch; dynamic (pday, pbatch) overwrite makes it land on its own
    partition — serving reads equal a clean run's."""
    from pyspark.sql.readwriter import DataFrameWriter

    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        continuous_minute_rollup_job,
        read_minute_rollup,
    )

    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    rows = [
        {"event_time": "2024-05-01T10:00:05", "value": 1.0},
        {"event_time": "2024-05-01T10:00:55", "value": 2.0},
        {"event_time": "2024-05-01T10:01:05", "value": 5.0},
    ]
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    def run():
        events = (
            spark.readStream.schema("event_time timestamp, value double")
            .json(src)
        )
        q = continuous_minute_rollup_job(
            events, str(tmp_path / "store"), str(tmp_path / "ckpt")
        )
        q.awaitTermination()

    real_parquet = DataFrameWriter.parquet
    store_dir = str(tmp_path / "store")

    def write_then_crash(self, path, **kw):
        real_parquet(self, path, **kw)
        if path == store_dir:
            raise RuntimeError("injected crash after sink write")
        return None

    monkeypatch.setattr(DataFrameWriter, "parquet", write_then_crash)
    with pytest.raises(Exception):
        run()
    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)
    # the sink files landed but the batch never committed
    assert os.path.isdir(store_dir)

    run()  # replay overwrites the same (pday, pbatch) partitions
    got = {
        r.bucket_ms: (r.n_events, r.total_value, r.max_value)
        for r in read_minute_rollup(spark, store_dir).collect()
    }
    assert len(got) == 2
    assert sorted(got.values()) == [(1, 5.0, 5.0), (2, 3.0, 2.0)]
    # one pbatch segment per day — no duplicated partials
    segs = (
        spark.read.parquet(store_dir)
        .select("pday", "pbatch").distinct().count()
    )
    assert segs == 1


def test_takedown_compact_bloom_composition_with_kills(spark, tmp_path, monkeypatch):
    """All three store mutators against ONE lake in sequence, a kill
    between each (r8 verdict item 3): takedown killed mid
    partition-swap → digest+LSH compaction killed mid store-swap →
    re-ingest of purged content replayed after a crash-after-write.
    The stores share the swap/repair discipline, so the final verdicts
    must be identical to a never-crashed twin driven through the same
    logical sequence — and block_reingest must hold ACROSS the
    compaction fold: the purged docs' digests survive takedown and the
    fold onto __compacted__, so their re-crawl classifies dup_history
    on both lakes."""
    import shutil

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        compact_dedup_lsh_index_capped,
    )
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        compact_history_digest_store,
        start_history_dedup_ingest,
    )
    from flink_realtime_data_warehouse_spark.streaming.retention import (
        reapply_tombstones,
        takedown_documents,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batches = [
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "second wholly unrelated document body"},
            {"doc_id": 3, "text": "third unique document text entirely"},
        ],
        [
            {"doc_id": 4, "text": base},              # exact dup of 1
            {"doc_id": 5, "text": base + " lambda"},  # near-dup of 1
            {"doc_id": 6, "text": "sixth document with novel words"},
        ],
    ]
    reingest = [
        {"doc_id": 100, "text": base},                # purged canonical's bytes
        {"doc_id": 102, "text": base + " lambda"},    # purged near-dup's bytes
        {"doc_id": 101, "text": "genuinely novel reingest text"},
    ]

    def _ingest(root, src_name, ckpt_name, rows_by_batch):
        src = os.path.join(root, src_name)
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(rows_by_batch):
            p = os.path.join(src, f"{src_name}_{i}.jsonl")
            with open(p, "w") as f:
                f.write("\n".join(json.dumps(r) for r in rows) + "\n")
            os.utime(p, (1_000_000_000.0 + i, 1_000_000_000.0 + i))
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        start_history_dedup_ingest(
            spark,
            stream,
            os.path.join(root, "out"),
            os.path.join(root, ckpt_name),
            near_dup_gate=True,
            bloom_prefilter=True,
        ).awaitTermination(300)

    def _verdicts(root):
        out = os.path.join(root, "out")
        clean = sorted(
            r.doc_id for r in spark.read.parquet(os.path.join(out, "clean")).collect()
        )
        dups = {
            r.doc_id: r.status
            for r in spark.read.parquet(os.path.join(out, "dups")).collect()
        }
        digests = sorted(
            (r.content_hash or "")
            for r in spark.read.schema("content_hash string, pbatch string")
            .parquet(os.path.join(out, "digests"))
            .collect()
        )
        return clean, dups, digests

    crashed, twin = str(tmp_path / "crashed"), str(tmp_path / "twin")

    # ---- step 0: identical lakes
    for root in (crashed, twin):
        _ingest(root, "docs", "ckpt", batches)

    # ---- step 1: takedown [1, 5]; crashed lake dies mid partition-swap
    real_rename = os.rename
    state = {"armed": True}

    def crash_clean_swap(s, d):
        if state["armed"] and "clean__tmp_" in str(s) and "pbatch=" in str(s):
            state["armed"] = False
            raise RuntimeError("injected takedown crash")
        return real_rename(s, d)

    monkeypatch.setattr(os, "rename", crash_clean_swap)
    with pytest.raises(RuntimeError, match="injected takedown"):
        takedown_documents(spark, os.path.join(crashed, "out"), [1, 5])
    monkeypatch.setattr(os, "rename", real_rename)
    reapply_tombstones(spark, os.path.join(crashed, "out"))
    takedown_documents(spark, os.path.join(twin, "out"), [1, 5])

    # ---- step 2: compaction; crashed lake dies between the two swap
    # renames of the digest store (store renamed away, replacement not in)
    state["armed"] = True

    def crash_digest_swap(s, d):
        if state["armed"] and "digests__tmp_" in str(s):
            state["armed"] = False
            raise RuntimeError("injected compaction crash")
        return real_rename(s, d)

    monkeypatch.setattr(os, "rename", crash_digest_swap)
    with pytest.raises(RuntimeError, match="injected compaction"):
        compact_history_digest_store(spark, os.path.join(crashed, "out"))
    monkeypatch.setattr(os, "rename", real_rename)
    for root in (crashed, twin):
        compact_history_digest_store(spark, os.path.join(root, "out"))
        compact_dedup_lsh_index_capped(spark, os.path.join(root, "out", "lsh"))

    # ---- step 3: re-ingest purged + novel content; crashed lake's
    # batch is replayed (crash-after-write: commit marker erased)
    for root in (crashed, twin):
        _ingest(root, "docs2", "ckpt2", [reingest])
    shutil.rmtree(os.path.join(crashed, "ckpt2", "commits"))
    _ingest(crashed, "docs2", "ckpt2", [])  # restart from the checkpoint

    # ---- the composed verdicts converge to the never-crashed twin's
    c_clean, c_dups, c_digests = _verdicts(crashed)
    t_clean, t_dups, t_digests = _verdicts(twin)
    assert c_clean == t_clean == [2, 3, 6, 101]
    assert c_dups == t_dups
    # block_reingest held across the fold: purged bytes stay blocked
    assert c_dups[100] == "dup_history" and c_dups[102] == "dup_history"
    assert c_digests == t_digests
    # no swap debris on either lake
    for root in (crashed, twin):
        debris = [
            os.path.join(r, d)
            for r, dirs, _f in os.walk(os.path.join(root, "out"))
            for d in dirs
            if "__old_" in d or "__tmp_" in d
        ]
        assert not debris
