"""Two-level coarse quantizer (round-7 item 2): same total cell budget
as the linear k = n/64 rule, but the driver/broadcast centroid matrix
grows as sqrt(n_cells) — pinned here — and the assignment is
deterministic, total, and task-sized."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _vec(spark):
    from flink_realtime_data_warehouse_spark.operators.similarity import _load_emb

    return _load_emb(spark, SF_DIR).select("vec_id", "v")


def test_driver_matrix_rows_bounded_by_sqrt(spark, monkeypatch):
    """The ONLY centroid matrix that reaches the driver is level-1's:
    its row count must be ceil(sqrt(n_cells)), never n_cells."""
    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    seen = {}
    real = sim._train_centroids

    def spy(spark_, emb_, k, iters):
        seen["k"] = k
        return real(spark_, emb_, k, iters)

    monkeypatch.setattr(sim, "_train_centroids", spy)
    vec = _vec(spark)
    n_cells = 64
    cells = sim.two_level_cell_assignment(spark, vec, n_cells)
    cells.count()  # force execution
    assert seen["k"] == math.isqrt(n_cells - 1) + 1 == 8
    # and the bound holds as a rule, not a coincidence of 64
    for n in (100, 1000, 2000):
        k1 = math.isqrt(n - 1) + 1
        assert k1 * k1 >= n and (k1 - 1) * (k1 - 1) < n


def test_assignment_total_deterministic_and_in_budget(spark):
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        two_level_cell_assignment,
    )

    vec = _vec(spark)
    n = vec.count()
    n_cells = max(32, n // 64)
    a = {r.vec_id: r.cell for r in
         two_level_cell_assignment(spark, vec, n_cells).collect()}
    b = {r.vec_id: r.cell for r in
         two_level_cell_assignment(spark, vec, n_cells).collect()}
    assert a == b  # deterministic: seed-pinned level 1 + level 2
    assert len(a) == n  # total: every vector assigned exactly once
    k1 = math.isqrt(n_cells - 1) + 1
    k2 = -(-n_cells // k1)
    assert all(0 <= c < k1 * k2 for c in a.values())
    # the quantizer actually splits: cell count within a factor of the
    # budget, and no cell bigger than its level-1 parent could be
    n_used = len(set(a.values()))
    assert n_used > n_cells // 4


def test_cells_are_task_sized(spark):
    """max cell population stays near the budget's average — the flat
    comparisons/vector claim needs cells ~n/n_cells, not one megacell."""
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        two_level_cell_assignment,
    )

    vec = _vec(spark)
    n = vec.count()
    n_cells = max(32, n // 64)
    sizes = (
        two_level_cell_assignment(spark, vec, n_cells)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    avg = n / n_cells
    assert max(r.c for r in sizes) <= 20 * avg


def test_semdedup_accepts_two_level_bucket_df(spark):
    """The production integration: semantic_dedup over the two-level
    assignment emits one row per vector with a valid min-id keeper
    structure (rep_id <= vec_id, keepers self-represent)."""
    from flink_realtime_data_warehouse_spark.operators.semdedup import (
        semantic_dedup,
    )
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        two_level_cell_assignment,
    )

    vec = _vec(spark)
    n = vec.count()
    cells = two_level_cell_assignment(spark, vec, max(32, n // 64))
    out = semantic_dedup(vec, bucket_df=cells).collect()
    assert len(out) == n
    for r in out:
        assert r.rep_id <= r.vec_id
        assert r.is_kept == (r.rep_id == r.vec_id)


# ---------------------------------------------------------------------------
# round 8: the two-level rule COMPOSED INTO the ANN IVF index
# ---------------------------------------------------------------------------


def test_ivf_build_driver_matrix_rows_bounded(spark, monkeypatch, tmp_path):
    """The hierarchical index build Lloyd-trains ONLY the level-1
    matrix driver-side: k₁ = min(n_list, max(ceil(sqrt(n_list)),
    IVF_K1_MIN)) — never n_list — and the bound stays O(sqrt(k))
    asymptotically (the IVF_K1_MIN floor is absorbed once
    n_list > IVF_K1_MIN²)."""
    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    seen = {}
    real = sim._train_centroids

    def spy(spark_, emb_, k, iters):
        seen["k"] = k
        return real(spark_, emb_, k, iters)

    monkeypatch.setattr(sim, "_train_centroids", spy)
    vec = _vec(spark)
    sim.build_ann_ivf_index(
        spark, vec, str(tmp_path / "ivf2"), n_list=16, two_level=True
    )
    assert seen["k"] == min(16, max(math.isqrt(15) + 1, sim.IVF_K1_MIN)) == 8
    # the rule, not the instance: sublinear for every n_list
    for n in (64, 100, 1000, 10000, 10**6):
        k1 = min(n, max(math.isqrt(n - 1) + 1, sim.IVF_K1_MIN))
        assert k1 <= max(math.isqrt(n - 1) + 1, sim.IVF_K1_MIN)
        assert k1 * max(1, -(-n // k1)) >= n  # cell budget still covered


def test_ivf_two_level_layout_and_probe_recall(spark, tmp_path):
    """Index layout: same cell-partitioned directory as the flat index
    (downstream readers unchanged), sub-centroids in the lake under
    _subcentroids partitioned by cell1, structure recorded in
    _meta.json; the hierarchical probe meets the registry recall
    floor."""
    import json as _json
    import os

    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    sf_dir = SF_DIR
    emb = sim._load_emb(spark, sf_dir)
    loc = str(tmp_path / "ivf2")
    sim.build_ann_ivf_index(spark, emb, loc, n_list=16, two_level=True)

    with open(os.path.join(loc, "_meta.json")) as f:
        meta = _json.load(f)
    assert meta["two_level"] is True and meta["k1"] * meta["k2"] >= 16
    cells = {
        int(d.split("=")[1])
        for d in os.listdir(loc)
        if d.startswith("cell=")
    }
    assert cells and all(0 <= c < meta["k1"] * meta["k2"] for c in cells)
    subs = spark.read.parquet(os.path.join(loc, "_subcentroids"))
    assert subs.count() <= meta["k1"] * meta["k2"]
    # every vector indexed exactly once (assignment is total)
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _index_df,
    )

    assert _index_df(spark, loc).count() == emb.count()

    qp = sim._query_block(spark, emb, sf_dir)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_cosine_topk(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_ivf_probe(spark, loc, qp).collect()
    }
    assert len(exact & approx) / len(exact) >= sim.IVF_MIN_MEAN_RECALL


def test_ivf_two_level_append_assigns_hierarchically(spark, tmp_path):
    """append_ann_ivf_vectors on a two-level index: new vectors land in
    existing packed-cell partitions (no k-sized broadcast — level-1
    argmax then an in-task argmax against the cell's lake-resident
    sub-centroids) and a subsequent probe can return them."""
    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    emb = sim._load_emb(spark, SF_DIR)
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    loc = str(tmp_path / "ivf2")
    sim.build_ann_ivf_index(spark, old, loc, n_list=16, two_level=True)
    n_before = sim._index_df(spark, loc).count()
    sim.append_ann_ivf_vectors(spark, new, loc)
    idx = sim._index_df(spark, loc)
    assert idx.count() == n_before + new.count()
    # appended rows live in valid packed cells only
    meta_cells = 16
    appended = idx.filter(F.col("vec_id") < 100)
    assert appended.count() == new.count()
    assert all(
        0 <= r.cell < meta_cells for r in appended.select("cell").collect()
    )
    # identical vectors assign to the identical cell (determinism)
    again = str(tmp_path / "ivf2b")
    sim.build_ann_ivf_index(spark, old, again, n_list=16, two_level=True)
    sim.append_ann_ivf_vectors(spark, new, again)
    a = {r.vec_id: r.cell for r in sim._index_df(spark, loc).collect()}
    b = {r.vec_id: r.cell for r in sim._index_df(spark, again).collect()}
    assert a == b


@pytest.mark.slowtier  # ~2 min recursive-split drive — slow-tier pass only
def test_level2_budget_escalates_to_third_level_on_dominant_cell(spark, monkeypatch):
    """r8 verdict item 6: a dominant level-1 cell past the task budget
    now ESCALATES — the over-budget cell (and only it) is split by a
    third quantizer level — instead of raising. The planted pile is
    all-identical vectors (the shape k-means cannot separate), so this
    also pins the deterministic hash fallback: assignment stays total,
    deterministic, and the pile lands across enough cells that no task
    sees it whole."""
    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    vec = _vec(spark)
    n = vec.count()
    one = vec.limit(1).collect()[0]["v"]
    dom = vec.select("vec_id", F.lit(one).alias("v"))
    row_bytes = len(one) * 4 + 24
    budget = 32 * row_bytes  # ≤32 vectors per task
    monkeypatch.setattr(sim, "LEVEL2_TASK_BUDGET_BYTES", budget)
    a = {r.vec_id: r.cell for r in
         sim.two_level_cell_assignment(spark, dom, max(32, n // 64)).collect()}
    b = {r.vec_id: r.cell for r in
         sim.two_level_cell_assignment(spark, dom, max(32, n // 64)).collect()}
    assert a == b          # deterministic across runs
    assert len(a) == n     # total: every vector assigned exactly once
    # the pile was actually split into enough groups to fit the budget
    from collections import Counter

    sizes = Counter(a.values())
    assert len(sizes) >= n // 64  # s ≈ bytes/budget children exist
    # below the budget: no behavior change
    monkeypatch.setattr(sim, "LEVEL2_TASK_BUDGET_BYTES", 1 << 30)
    out = sim.two_level_cell_assignment(spark, vec, max(32, n // 64))
    assert out.count() == n


def test_level2_escalation_splits_separable_dominant_cell_by_kmeans(spark, monkeypatch):
    """A dominant-but-SEPARABLE cell (two distinct directions piled
    into one level-1 cell by a tiny budget) must split by the trained
    third level, not the hash fallback: the two directions end up in
    disjoint cell sets."""
    import numpy as np

    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    vec = _vec(spark)
    n = vec.count()
    one = vec.limit(1).collect()[0]["v"]
    dim = len(one)
    ua = [1.0] + [0.0] * (dim - 1)
    ub = [0.0, 1.0] + [0.0] * (dim - 2)
    two = vec.select(
        "vec_id",
        F.when(F.col("vec_id") % 2 == 0, F.lit(ua))
        .otherwise(F.lit(ub))
        .alias("v"),
    )
    row_bytes = dim * 4 + 24
    # budget fits half the corpus: one trained split round suffices
    monkeypatch.setattr(
        sim, "LEVEL2_TASK_BUDGET_BYTES", (n // 2 + 8) * row_bytes
    )
    got = sim.two_level_cell_assignment(spark, two, 4).collect()
    assert len(got) == n
    cells_a = {r.cell for r in got if r.vec_id % 2 == 0}
    cells_b = {r.cell for r in got if r.vec_id % 2 == 1}
    assert not (cells_a & cells_b)  # k-means separated the directions


def test_ivf_build_escalation_extends_centroids_and_probe_works(
    spark, monkeypatch, tmp_path
):
    """The INDEX path of the escalation: a dominant cell during
    build_ann_ivf_index(two_level=True) splits, the persisted
    _centroids.json stays a dense id→row array (row count == number of
    level-1 cells actually used), and probe + append over the extended
    quantizer still work."""
    import json

    from flink_realtime_data_warehouse_spark.operators import similarity as sim

    vec = _vec(spark)
    n = vec.count()
    one = vec.limit(1).collect()[0]["v"]
    dom = vec.select("vec_id", F.lit(one).alias("v"))
    row_bytes = len(one) * 4 + 24
    monkeypatch.setattr(sim, "LEVEL2_TASK_BUDGET_BYTES", 64 * row_bytes)
    loc = str(tmp_path / "ivf")
    sim.build_ann_ivf_index(spark, dom, loc, n_list=16, two_level=True)
    with open(loc + "/_centroids.json") as f:
        cent = json.load(f)
    assert len(cent) > 16 // 4  # extended beyond the k1 cut
    stored = spark.read.parquet(loc)
    assert stored.count() == n  # total through the split
    # every stored cell1 id (cell // k2) has a centroid row
    with open(loc + "/_meta.json") as f:
        k2 = json.load(f)["k2"]
    max_cell1 = stored.agg(F.max(F.expr(f"cell div {k2}"))).collect()[0][0]
    assert max_cell1 < len(cent)
    # probe returns neighbors (duplicates are interchangeable; any hit
    # of the pile is correct)
    qp = sim._query_block(spark, dom, "/root/testdata/sf0.001")
    res = sim.ann_ivf_probe(spark, loc, qp)
    assert res.count() > 0
    # append assigns against the extended quantizer without error
    extra = dom.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "v")
    delta = sim.ivf_assign_delta(spark, extra.limit(8), loc)
    assert delta.count() == 8
