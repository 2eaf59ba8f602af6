"""Table-format seam conformance (r8 verdict item 5): the five store
operations the lake relies on, exercised against the parquet
rename-swap backend directly — the contract a Delta/Iceberg backend
would have to honor (each op's Delta mapping is in the interface
docstrings)."""

import os

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.streaming.table_format import (
    FORMAT,
)

_SCHEMA = "k bigint, v string, pbatch string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _rows(spark, path, schema=_SCHEMA):
    return sorted(
        (r.k, r.v, r.pbatch)
        for r in FORMAT.read(spark, path, schema).collect()
    )


def _stamp(path):
    out = {}
    for r, _d, files in os.walk(path):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def test_overwrite_partitions_is_dynamic(spark, tmp_path):
    store = str(tmp_path / "t")
    FORMAT.overwrite_partitions(
        _mk(spark, [(1, "a", "p0"), (2, "b", "p1")]), store, "pbatch"
    )
    # a second write naming only p1 must leave p0 untouched
    before = {k: v for k, v in _stamp(store).items() if "pbatch=p0" in k}
    FORMAT.overwrite_partitions(_mk(spark, [(3, "c", "p1")]), store, "pbatch")
    after = {k: v for k, v in _stamp(store).items() if "pbatch=p0" in k}
    assert before == after
    assert _rows(spark, store) == [(1, "a", "p0"), (3, "c", "p1")]


def test_swap_rewrite_atomic_and_crash_recoverable(spark, tmp_path, monkeypatch):
    store = str(tmp_path / "t")
    FORMAT.overwrite_partitions(
        _mk(spark, [(1, "a", "p0"), (2, "b", "p1")]), store, "pbatch"
    )
    # crash between rename-away and rename-in: store missing; repair restores
    real = os.rename
    state = {"armed": True}

    def faulty(s, d):
        if state["armed"] and "__tmp_" in str(s) and str(d) == store:
            state["armed"] = False
            raise RuntimeError("injected")
        return real(s, d)

    monkeypatch.setattr(os, "rename", faulty)
    with pytest.raises(RuntimeError, match="injected"):
        FORMAT.swap_rewrite(spark, store, _mk(spark, [(9, "z", "p0")]))
    monkeypatch.setattr(os, "rename", real)
    assert not os.path.isdir(store)  # the crash window
    FORMAT.repair(str(tmp_path), store)
    assert _rows(spark, store) == [(1, "a", "p0"), (2, "b", "p1")]
    # the clean path replaces everything in one visibility step
    FORMAT.swap_rewrite(spark, store, _mk(spark, [(9, "z", "p0")]))
    assert _rows(spark, store) == [(9, "z", "p0")]


def test_swap_partitions_prunes_and_deletes_emptied(spark, tmp_path):
    store = str(tmp_path / "t")
    FORMAT.overwrite_partitions(
        _mk(spark, [(1, "a", "p0"), (2, "b", "p1"), (3, "c", "p2")]),
        store,
        "pbatch",
    )
    cold = {k: v for k, v in _stamp(store).items() if "pbatch=p0" in k}
    # rewrite p1 (new content) and p2 (no rows -> partition deleted)
    FORMAT.swap_partitions(
        spark, store, _mk(spark, [(20, "B", "p1")]), "pbatch", ["p1", "p2"]
    )
    assert {k: v for k, v in _stamp(store).items() if "pbatch=p0" in k} == cold
    assert not os.path.isdir(os.path.join(store, "pbatch=p2"))
    assert _rows(spark, store) == [(1, "a", "p0"), (20, "B", "p1")]
    # no swap debris
    assert not [d for d in os.listdir(store) if "__old_" in d or "__tmp_" in d]


def test_swap_partitions_half_swap_rolls_back_on_repair(
    spark, tmp_path, monkeypatch
):
    store = str(tmp_path / "t")
    FORMAT.overwrite_partitions(
        _mk(spark, [(1, "a", "p0"), (2, "b", "p1")]), store, "pbatch"
    )
    real = os.rename
    state = {"armed": True}

    def faulty(s, d):
        # die on the stage->partition rename: p1 is renamed away,
        # replacement not yet in
        if state["armed"] and "__tmp_" in str(s) and str(s).endswith("pbatch=p1"):
            state["armed"] = False
            raise RuntimeError("injected")
        return real(s, d)

    monkeypatch.setattr(os, "rename", faulty)
    with pytest.raises(RuntimeError, match="injected"):
        FORMAT.swap_partitions(
            spark, store, _mk(spark, [(20, "B", "p1")]), "pbatch", ["p1"]
        )
    monkeypatch.setattr(os, "rename", real)
    assert any("__old_" in d for d in os.listdir(store))
    FORMAT.repair(str(tmp_path), store)
    assert _rows(spark, store) == [(1, "a", "p0"), (2, "b", "p1")]
    assert not [d for d in os.listdir(store) if "__old_" in d or "__tmp_" in d]


def test_append_and_empty_store_read(spark, tmp_path):
    store = str(tmp_path / "log")
    FORMAT.append(_mk(spark, [(1, "a", "p0")]), store)
    FORMAT.append(_mk(spark, [(2, "b", "p0")]), store)
    assert _rows(spark, store) == [(1, "a", "p0"), (2, "b", "p0")]
    # explicit schema makes a store with no data files readable
    empty = str(tmp_path / "empty")
    FORMAT.overwrite_partitions(
        _mk(spark, []).limit(0), empty, "pbatch"
    )
    assert FORMAT.read(spark, empty, _SCHEMA).count() == 0
