"""Incremental continuous-aggregate maintenance (streaming/rollup.py):
batch-equivalence of the partial store, unbounded late-data merge,
replay idempotency, and compaction invariance."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.sources.streams import read_jsonl_stream
from flink_realtime_data_warehouse_spark.streaming.rollup import (
    MINUTE_MS,
    compact_minute_rollup,
    continuous_minute_rollup_job,
    make_rollup_merger,
    read_minute_rollup,
)

BASE = 1_700_000_000_000  # 2023-11-14 22:13:20 UTC, arbitrary minute-unaligned


def _row(ts_ms: int, value: float) -> str:
    return json.dumps({"ts": ts_ms, "value": value})


def _write(dir_, name, lines):
    os.makedirs(dir_, exist_ok=True)
    with open(os.path.join(dir_, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _events_stream(spark, src):
    raw = read_jsonl_stream(spark, src, max_files_per_trigger=1)
    parsed = raw.select(
        F.from_json(F.col("value"), "ts bigint, value double").alias("j")
    )
    return parsed.select(
        F.timestamp_millis(F.col("j.ts")).alias("event_time"),
        F.col("j.value").alias("value"),
    )


def _run(spark, src, store, ckpt):
    q = continuous_minute_rollup_job(_events_stream(spark, src), store, ckpt)
    q.awaitTermination(150)


def _serving(spark, store):
    return {
        r["bucket_ms"]: (r["n_events"], round(r["total_value"], 6), r["max_value"])
        for r in read_minute_rollup(spark, store).collect()
    }


def test_incremental_rollup_matches_batch_aggregation(spark, tmp_path):
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    m0, m1 = BASE - BASE % MINUTE_MS, BASE - BASE % MINUTE_MS + MINUTE_MS
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _write(src, "a.jsonl", [_row(m0 + 1000, 1.5), _row(m0 + 2000, 2.5)])
    _write(src, "b.jsonl", [_row(m0 + 3000, 4.0), _row(m1 + 500, 10.0)])
    _run(spark, src, store, ckpt)

    assert _serving(spark, store) == {
        m0: (3, 8.0, 4.0),
        m1: (1, 10.0, 10.0),
    }


def test_late_data_merges_into_old_bucket(spark, tmp_path):
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    m0 = BASE - BASE % MINUTE_MS
    day_later = m0 + 86_400_000
    _write(src, "a.jsonl", [_row(m0 + 1000, 1.0), _row(day_later, 5.0)])
    _run(spark, src, store, ckpt)
    # a full day late — far beyond any plausible watermark; an
    # append-mode window would drop it, the partial store merges it
    _write(src, "late.jsonl", [_row(m0 + 2000, 9.0)])
    _run(spark, src, store, ckpt)

    assert _serving(spark, store)[m0] == (2, 10.0, 9.0)
    assert _serving(spark, store)[day_later - day_later % MINUTE_MS] == (1, 5.0, 5.0)


def test_merge_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    m0 = BASE - BASE % MINUTE_MS
    batch = spark.createDataFrame(
        [(m0 + 1000, 3.0), (m0 + 2000, 7.0)], "ts bigint, value double"
    ).select(F.timestamp_millis("ts").alias("event_time"), "value")
    merge = make_rollup_merger(store)
    merge(batch, 7)
    once = _serving(spark, store)
    merge(batch, 7)  # foreachBatch replay after restart: same batch_id
    assert _serving(spark, store) == once == {m0: (2, 10.0, 7.0)}


def test_compaction_preserves_serving_results(spark, tmp_path):
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    m0 = BASE - BASE % MINUTE_MS
    for i in range(4):
        _write(src, f"f{i}.jsonl", [_row(m0 + 1000 * i, float(i + 1))])
    _run(spark, src, store, ckpt)
    before = _serving(spark, store)
    assert before[m0] == (4, 10.0, 4.0)

    compact_minute_rollup(spark, store)
    after = _serving(spark, store)
    assert after == before
    # everything below the newest batch folded into the -1 segment
    batches = {
        r["pbatch"] for r in spark.read.parquet(store).select("pbatch").distinct().collect()
    }
    assert -1 in batches and len(batches) == 2

    # compaction is repeatable (the -1 segment folds into itself)
    compact_minute_rollup(spark, store)
    assert _serving(spark, store) == before


def test_gapfilled_serving_read(spark, tmp_path):
    """Dense minute spine over the store: gaps carry the last
    observation and are flagged; observed minutes match the sparse
    serving view exactly."""
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        read_minute_rollup_gapfilled,
    )

    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    m0 = BASE - BASE % MINUTE_MS
    m3 = m0 + 3 * MINUTE_MS  # two silent minutes between observations
    _write(src, "a.jsonl", [_row(m0 + 1000, 2.0), _row(m3 + 500, 8.0)])
    _run(spark, src, store, ckpt)

    rows = {
        r["bucket_ms"]: r
        for r in read_minute_rollup_gapfilled(spark, store).collect()
    }
    assert sorted(rows) == [m0, m0 + MINUTE_MS, m0 + 2 * MINUTE_MS, m3]
    assert (rows[m0]["n_events"], rows[m0]["filled"]) == (1, 0)
    assert (rows[m3]["n_events"], rows[m3]["filled"]) == (1, 0)
    for gap in (m0 + MINUTE_MS, m0 + 2 * MINUTE_MS):
        assert rows[gap]["filled"] == 1
        assert rows[gap]["total_value"] == rows[m0]["total_value"]


def test_gapfilled_serving_read_empty_store(spark, tmp_path):
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        read_minute_rollup_gapfilled,
    )

    assert read_minute_rollup_gapfilled(spark, str(tmp_path / "nope")).count() == 0


def test_gapfilled_read_does_not_mix_null_value_observations(spark, tmp_path):
    """An observed minute whose events carry NULL values keeps its own
    NULL aggregates (filled=0) — it must not inherit the previous
    minute's numbers."""
    import json as _json
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        read_minute_rollup_gapfilled,
    )

    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    m0 = BASE - BASE % MINUTE_MS
    m1 = m0 + MINUTE_MS
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write(_json.dumps({"ts": m0 + 1000, "value": 5.0}) + "\n")
        f.write(_json.dumps({"ts": m1 + 1000, "value": None}) + "\n")
    _run(spark, src, store, ckpt)

    rows = {
        r["bucket_ms"]: r
        for r in read_minute_rollup_gapfilled(spark, store).collect()
    }
    assert rows[m1]["filled"] == 0 and rows[m1]["n_events"] == 1
    assert rows[m1]["total_value"] is None and rows[m1]["max_value"] is None
    assert rows[m0]["total_value"] == 5.0


def _mk_store(spark, store, days, batch_id=0):
    """Write minute partials for the given UTC day indexes directly
    through the production merger."""
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        make_rollup_merger,
    )

    rows = [
        (d * 86_400_000 + m * 60_000, float(d * 10 + m))
        for d in days
        for m in (0, 1)
    ]
    batch = spark.createDataFrame(rows, "ms bigint, value double").select(
        F.timestamp_millis("ms").alias("event_time"), "value"
    )
    make_rollup_merger(store)(batch, batch_id)


def _snap_files(root):
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_expire_drops_whole_chunks_only_and_is_scan_free(spark, tmp_path):
    """keep_days drops exactly the old day-partitions, by rename alone:
    surviving partitions' files are byte-identical (same size+mtime),
    and a second run is a no-op."""
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
        read_minute_rollup,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store, days=[100, 101, 102, 103])
    keep_before = {
        k: v for k, v in _snap_files(store).items() if "pday=1970-04-1" in k
    }
    dropped = expire_rollup_chunks(spark, store, keep_days=2)
    assert dropped == ["1970-04-11", "1970-04-12"]  # days 100, 101
    survivors = sorted(
        r.bucket_ms // 86_400_000
        for r in read_minute_rollup(spark, store).collect()
    )
    assert sorted(set(survivors)) == [102, 103]
    after = {
        k: v for k, v in _snap_files(store).items() if "pday=1970-04-1" in k
    }
    kept = {k: v for k, v in keep_before.items() if "1970-04-13" in k or "1970-04-14" in k}
    assert {k: v for k, v in after.items()} == kept
    assert expire_rollup_chunks(spark, store, keep_days=2) == []


def test_expire_older_than_keeps_straddling_chunk(spark, tmp_path):
    """An explicit epoch cutoff mid-day: the straddling day survives
    whole (chunk-grain contract), strictly-older days drop."""
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store, days=[100, 101, 102])
    mid_day_101 = 101 * 86_400_000 + 12 * 3_600_000
    dropped = expire_rollup_chunks(spark, store, older_than_ms=mid_day_101)
    assert dropped == ["1970-04-11"]  # only day 100 lies wholly before
    assert os.path.isdir(os.path.join(store, "pday=1970-04-12"))


def test_expire_crash_leaves_invisible_husk_then_sweeps(spark, tmp_path, monkeypatch):
    """Kill between the rename and the delete: the husk is invisible to
    reads (underscore prefix) so serving never sees a half-deleted
    chunk; the next expiry sweeps it."""
    import shutil as _sh

    import pytest

    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
        read_minute_rollup,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store, days=[100, 101, 102])
    real = _sh.rmtree
    state = {"armed": True}

    def faulty(path, **kw):
        if state["armed"] and "_expired_" in str(path):
            state["armed"] = False
            raise RuntimeError("injected mid-expiry crash")
        return real(path, **kw)

    # the husk rename+delete lives in the table-format seam since r10
    import flink_realtime_data_warehouse_spark.streaming.table_format as tf

    monkeypatch.setattr(tf.shutil, "rmtree", faulty)
    with pytest.raises(RuntimeError, match="injected"):
        expire_rollup_chunks(spark, store, keep_days=1)
    monkeypatch.setattr(tf.shutil, "rmtree", real)

    husks = [d for d in os.listdir(store) if d.startswith("_expired_")]
    assert husks  # the crash window
    days_served = {
        r.bucket_ms // 86_400_000
        for r in read_minute_rollup(spark, store).collect()
    }
    # the policy was FULLY applied before any delete ran (r10: renames
    # first, husk deletion second) — both expired chunks are invisible
    assert days_served == {102}
    dropped = expire_rollup_chunks(spark, store, keep_days=1)
    assert dropped == []  # nothing left to expire — only husks to sweep
    assert not [d for d in os.listdir(store) if d.startswith("_expired_")]


def test_expire_keep_days_exceeding_present_is_noop(spark, tmp_path):
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
    )

    import pytest

    store = str(tmp_path / "store")
    _mk_store(spark, store, days=[100, 101])
    assert expire_rollup_chunks(spark, store, keep_days=5) == []
    with pytest.raises(ValueError):
        expire_rollup_chunks(spark, store, keep_days=1, older_than_ms=0)
    with pytest.raises(ValueError):
        expire_rollup_chunks(spark, store)


def test_rollup_composed_kills_converge_to_twin(spark, tmp_path, monkeypatch):
    """The r10 composed fault-injection scenario for the ROLLUP store
    family (r9 verdict item 4): the same streaming store driven
    through build → expire (killed between the husk rename and its
    delete) → compact (killed between the swap's two renames) →
    checkpoint replay of a new batch, with serving reads compared to a
    never-crashed twin after EVERY step. The rollup mutators route
    through the table-format seam since r10, so this also pins that a
    compact killed mid-swap — which before r10 used repair-invisible
    ``.compact-``/``.old-`` names and would have served an EMPTY
    rollup — rolls back on the next touch."""
    import shutil as _sh

    import pytest

    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
    )
    import flink_realtime_data_warehouse_spark.streaming.table_format as tf

    roots = {n: str(tmp_path / n) for n in ("crashed", "twin")}
    days = [100, 101, 102, 103]

    def _drive(root, batch_id, days_):
        _mk_store(spark, os.path.join(root, "store"), days_, batch_id)

    for root in roots.values():
        _drive(root, 0, days)

    # ---- step 1: expire, crashed store killed between rename & delete
    real_rmtree = _sh.rmtree
    state = {"armed": True}

    def crash_husk_delete(path, **kw):
        if state["armed"] and "_expired_" in str(path):
            state["armed"] = False
            raise RuntimeError("injected expiry crash")
        return real_rmtree(path, **kw)

    monkeypatch.setattr(tf.shutil, "rmtree", crash_husk_delete)
    with pytest.raises(RuntimeError, match="injected expiry"):
        expire_rollup_chunks(
            spark, os.path.join(roots["crashed"], "store"), keep_days=2
        )
    monkeypatch.setattr(tf.shutil, "rmtree", real_rmtree)
    # re-drive the policy (idempotent), twin runs it once cleanly
    expire_rollup_chunks(
        spark, os.path.join(roots["crashed"], "store"), keep_days=2
    )
    expire_rollup_chunks(
        spark, os.path.join(roots["twin"], "store"), keep_days=2
    )
    assert _serving(spark, os.path.join(roots["crashed"], "store")) == _serving(
        spark, os.path.join(roots["twin"], "store")
    )

    # ---- step 2: a second batch lands (late data for day 102), then
    # compaction; crashed store killed between the swap's two renames
    for root in roots.values():
        _drive(root, 1, [102])
    real_rename = os.rename
    state["armed"] = True

    def crash_store_swap(s, d):
        if state["armed"] and "store__tmp_" in str(s):
            state["armed"] = False
            raise RuntimeError("injected compaction crash")
        return real_rename(s, d)

    monkeypatch.setattr(os, "rename", crash_store_swap)
    with pytest.raises(RuntimeError, match="injected compaction"):
        compact_minute_rollup(spark, os.path.join(roots["crashed"], "store"))
    monkeypatch.setattr(os, "rename", real_rename)
    # the kill landed AFTER rename-away, BEFORE rename-in: the store
    # dir is gone and only repair can bring it back — the serving read
    # must NOT report an empty rollup
    crashed_store = os.path.join(roots["crashed"], "store")
    assert not os.path.isdir(crashed_store)
    assert _serving(spark, crashed_store) == _serving(
        spark, os.path.join(roots["twin"], "store")
    )

    # re-drive compaction on both
    compact_minute_rollup(spark, crashed_store)
    compact_minute_rollup(spark, os.path.join(roots["twin"], "store"))
    assert _serving(spark, crashed_store) == _serving(
        spark, os.path.join(roots["twin"], "store")
    )

    # ---- step 3: replay (same batch_id overwrites its own partition)
    for root in roots.values():
        _drive(root, 1, [102])
    s_c = _serving(spark, crashed_store)
    s_t = _serving(spark, os.path.join(roots["twin"], "store"))
    assert s_c == s_t
    # expired days stay expired, surviving days intact
    served_days = {b // 86_400_000 for b in s_c}
    assert served_days == {102, 103}
    # no swap debris on either store
    for root in roots.values():
        debris = [
            d
            for d in os.listdir(os.path.join(root, "store"))
            if "__old_" in d or "__tmp_" in d or d.startswith("_expired_")
        ]
        assert not debris
