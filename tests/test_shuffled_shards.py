"""export_shuffled_shards: deterministic corpus shuffle → shards.

The oracle row proves value-parity with the global per-shard
row_number; these pin the loader-facing contract — dense per-shard
positions, full-corpus coverage, an order that is genuinely shuffled
(not doc_id order), determinism, and the plan shape (grouped prefix-sum,
no single-reducer sort).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from flink_realtime_data_warehouse_spark.operators.export import N_SHARDS


def _rows(spark, sf_dir):
    return entrymod.queries()["export_shuffled_shards"](spark, sf_dir).collect()


def test_dense_positions_and_full_coverage(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(N_SHARDS))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), f"shard {shard} not dense"
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_order_is_actually_shuffled(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    shard0 = [r["doc_id"] for r in rows if r["shard"] == 0]
    assert shard0 != sorted(shard0), "within-shard order must be hash order"


def test_deterministic_across_runs(spark, sf_dir):
    a = [(r["doc_id"], r["shard"], r["pos"]) for r in _rows(spark, sf_dir)]
    b = [(r["doc_id"], r["shard"], r["pos"]) for r in _rows(spark, sf_dir)]
    assert a == b


def test_no_single_partition_exchange(spark, sf_dir):
    df = entrymod.queries()["export_shuffled_shards"](spark, sf_dir)
    # strip the presentation sort (range partitioning) — the production
    # path writes partitionBy(shard)/sortWithinPartitions instead
    inner = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in inner
