"""Streaming vector ingest (round 8): ``start_embedding_ingest``
maintains a probe-ready two-level IVF index — batch 0 cold-builds,
later batches land in a pbatch-partitioned delta store (replay-
idempotent), ``compact_every`` folds the tail into the cell partitions
behind a rename-swap, and ``ann_ivf_probe`` reads main + tail
transparently."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.similarity import (
    _index_df,
    _load_emb,
    _query_block,
    ann_ivf_probe,
    build_ann_ivf_index,
    append_ann_ivf_vectors,
)
from flink_realtime_data_warehouse_spark.streaming.jobs import (
    start_embedding_ingest,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_slices(spark, root, n_slices=3):
    """Split the clean corpus into n mod-5 slices, one jsonl file each
    (increasing mtimes pin the micro-batch order)."""
    emb = _load_emb(spark, SF_DIR)
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    cuts = {3: [(0, 3), (3, 4), (4, 5)], 2: [(0, 4), (4, 5)]}[n_slices]
    for i, (lo, hi) in enumerate(cuts):
        m5 = F.pmod("vec_id", F.lit(5))
        part = emb.filter((m5 >= lo) & (m5 < hi))
        tmp = os.path.join(root, f"sl{i}")
        part.select(F.to_json(F.struct("vec_id", "v")).alias("j")).coalesce(
            1
        ).write.mode("overwrite").text(tmp)
        dst = os.path.join(src, f"{i}.jsonl")
        parts = [f for f in os.listdir(tmp) if f.startswith("part-")]
        shutil.move(os.path.join(tmp, parts[0]), dst)
        os.utime(dst, (1_000_000_000.0 + i, 1_000_000_000.0 + i))
    return src, emb


def _run(spark, root, src, ckpt="ckpt", index="index", compact_every=None):
    stream = (
        spark.readStream.schema("vec_id bigint, v array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_embedding_ingest(
        spark,
        stream,
        os.path.join(root, index),
        os.path.join(root, ckpt),
        compact_every=compact_every,
    )
    q.awaitTermination(300)


def _indexed_cells(spark, index_root):
    """{vec_id: cell} over main cells + delta tail."""
    out = {
        r.vec_id: r.cell
        for r in spark.read.parquet(os.path.join(index_root, "cells"))
        .select("vec_id", "cell")
        .collect()
    }
    deltas = os.path.join(index_root, "_deltas")
    if os.path.isdir(deltas):
        for r in (
            spark.read.schema("cell int, vec_id bigint, v array<float>, pbatch string")
            .parquet(deltas)
            .collect()
        ):
            out.setdefault(r.vec_id, r.cell)
    return out


def test_stream_built_index_matches_batch_twin(spark, tmp_path):
    """The streaming composition (build 60% → delta 20% → fold → delta
    20%) must index every vector exactly once, in the SAME cell the
    batch twin (build + append_ann_ivf_vectors) assigns, and the probe
    must return the identical top-k rows."""
    root = str(tmp_path)
    src, emb = _write_slices(spark, root)
    _run(spark, root, src, compact_every=3)
    index_root = os.path.join(root, "index")

    m5 = F.pmod("vec_id", F.lit(5))
    twin = os.path.join(root, "twin")
    build_ann_ivf_index(spark, emb.filter(m5 < 3), twin, two_level=True)
    append_ann_ivf_vectors(spark, emb.filter(m5 >= 3), twin)

    got = _indexed_cells(spark, index_root)
    want = {
        r.vec_id: r.cell
        for r in _index_df(spark, twin).select("vec_id", "cell").collect()
    }
    assert got == want  # total, no dup, identical assignment

    qp = _query_block(spark, emb, SF_DIR)
    a = sorted(map(tuple, ann_ivf_probe(spark, index_root, qp).collect()))
    b = sorted(map(tuple, ann_ivf_probe(spark, twin, qp).collect()))
    assert a == b

    # the batch-2 compaction folded batch 1 (sentinel economics): the
    # delta store holds only the in-flight batch-2 partition
    deltas = spark.read.schema(
        "cell int, vec_id bigint, v array<float>, pbatch string"
    ).parquet(os.path.join(index_root, "_deltas"))
    assert deltas.select("pbatch").distinct().count() == 1
    n_tail = emb.filter(m5 == 4).count()
    assert deltas.count() == n_tail


def test_replay_idempotent_delta_and_builder(spark, tmp_path):
    """Crash-after-write replay (commits erased): the builder batch's
    replay skips (its contribution IS the index) and delta batches
    overwrite their own partitions — stores end content-identical."""
    root = str(tmp_path)
    src, _ = _write_slices(spark, root)
    _run(spark, root, src)
    index_root = os.path.join(root, "index")
    before = _indexed_cells(spark, index_root)
    with open(os.path.join(index_root, "_built_pbatch")) as f:
        marker_before = f.read()

    shutil.rmtree(os.path.join(root, "ckpt", "commits"))
    _run(spark, root, src)
    assert _indexed_cells(spark, index_root) == before
    with open(os.path.join(index_root, "_built_pbatch")) as f:
        assert f.read() == marker_before  # builder replay did not rebuild


def test_crash_mid_cells_swap_converges(spark, tmp_path, monkeypatch):
    """Kill between compaction's rename-away and rename-in of the cells
    dir, restart from the same checkpoint: the repair sweep restores
    the store, the batch replays, the retried compaction completes, and
    the final index matches the clean-run twin."""
    root = str(tmp_path)
    src, emb = _write_slices(spark, root)

    real_rename = os.rename
    state = {"armed": True}

    def faulty_rename(s, d):
        if (
            state["armed"]
            and "__tmp_" in str(s)
            and str(d).endswith(os.path.join("index", "cells"))
        ):
            state["armed"] = False
            raise RuntimeError("injected mid-cells-swap crash")
        return real_rename(s, d)

    monkeypatch.setattr(os, "rename", faulty_rename)
    with pytest.raises(Exception, match="injected|Injected|STREAM"):
        _run(spark, root, src, compact_every=3)
    monkeypatch.setattr(os, "rename", real_rename)

    index_root = os.path.join(root, "index")
    assert not os.path.isdir(os.path.join(index_root, "cells"))
    assert any(d.startswith("cells__old_") for d in os.listdir(index_root))

    _run(spark, root, src, compact_every=3)

    ref_src = src  # same slices, fresh checkpoint+index
    _run(spark, root, ref_src, ckpt="ckpt_ref", index="index_ref", compact_every=3)
    assert _indexed_cells(spark, index_root) == _indexed_cells(
        spark, os.path.join(root, "index_ref")
    )
    assert not [
        d for d in os.listdir(index_root) if "__old_" in d or "__tmp_" in d
    ]
    qp = _query_block(spark, emb, SF_DIR)
    assert sorted(map(tuple, ann_ivf_probe(spark, index_root, qp).collect())) == sorted(
        map(tuple, ann_ivf_probe(spark, os.path.join(root, "index_ref"), qp).collect())
    )


def test_probe_dedups_double_resident_vectors(spark, tmp_path):
    """The crash window between compaction's two swaps leaves folded
    rows in BOTH stores; the probe's vec_id dedup must keep answers
    correct (no duplicate (query, neighbor) rows, same top-k)."""
    root = str(tmp_path)
    src, emb = _write_slices(spark, root)
    _run(spark, root, src, compact_every=3)  # folds batch 1 into cells
    index_root = os.path.join(root, "index")
    qp = _query_block(spark, emb, SF_DIR)
    clean = sorted(map(tuple, ann_ivf_probe(spark, index_root, qp).collect()))

    # simulate the window: re-materialize the folded batch-1 rows as a
    # delta partition AGAIN (they are already in cells)
    m5 = F.pmod("vec_id", F.lit(5))
    cells = spark.read.parquet(os.path.join(index_root, "cells"))
    dup_rows = (
        cells.join(emb.filter(m5 == 3).select("vec_id"), "vec_id")
        .select("cell", "vec_id", "v")
        .withColumn("pbatch", F.lit("zz-window"))
    )
    dup_rows.write.mode("append").partitionBy("pbatch").parquet(
        os.path.join(index_root, "_deltas")
    )
    assert (
        sorted(map(tuple, ann_ivf_probe(spark, index_root, qp).collect())) == clean
    )
