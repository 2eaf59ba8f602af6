"""Fixed-point PageRank: invariants and a hand-computed fixture."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)


def _graph(spark, nodes, edges):
    ndf = spark.createDataFrame([Row(node=n) for n in nodes], "node string")
    edf = spark.createDataFrame(
        [Row(src=s, dst=d, p=p) for s, d, p in edges], "src string, dst string, p bigint"
    )
    return ndf, edf


def test_two_node_cycle_converges_to_uniform(spark):
    """A symmetric 2-cycle must keep the uniform distribution exactly."""
    ndf, edf = _graph(
        spark, ["a", "b"], [("a", "b", PR_SCALE), ("b", "a", PR_SCALE)]
    )
    ranks = {r["node"]: r["r"] for r in pagerank_fixed_point(ndf, edf, 2).collect()}
    assert ranks["a"] == ranks["b"] == PR_SCALE // 2


def test_sink_heavy_star_ranks_center_highest(spark):
    """All spokes point at the hub: hub rank dominates, spokes equal."""
    spokes = [f"s{i}" for i in range(4)]
    ndf, edf = _graph(
        spark, ["hub"] + spokes, [(s, "hub", PR_SCALE) for s in spokes]
    )
    ranks = {r["node"]: r["r"] for r in pagerank_fixed_point(ndf, edf, 5).collect()}
    assert all(ranks["hub"] > ranks[s] for s in spokes)
    assert len({ranks[s] for s in spokes}) == 1


def test_mass_bounded_and_positive(spark):
    """Ranks stay positive and total mass never exceeds SCALE (dangling
    truncation only LOSES dust, it cannot create mass)."""
    ndf, edf = _graph(
        spark,
        ["a", "b", "c"],
        [("a", "b", PR_SCALE // 2), ("a", "c", PR_SCALE // 2), ("b", "a", PR_SCALE)],
    )
    rows = pagerank_fixed_point(ndf, edf, 3).collect()
    total = sum(r["r"] for r in rows)
    assert all(r["r"] > 0 for r in rows)
    assert total <= PR_SCALE


def test_rank_independent_of_partitioning(spark):
    """Integer arithmetic: the result is bit-identical however the
    edges are partitioned (float PageRank cannot promise this)."""
    ndf, edf = _graph(
        spark,
        ["a", "b", "c", "d"],
        [
            ("a", "b", PR_SCALE),
            ("b", "c", PR_SCALE // 3),
            ("b", "d", 2 * PR_SCALE // 3),
            ("c", "a", PR_SCALE),
            ("d", "a", PR_SCALE),
        ],
    )
    base = sorted(map(tuple, pagerank_fixed_point(ndf, edf, 4).collect()))
    repart = sorted(
        map(
            tuple,
            pagerank_fixed_point(
                ndf.repartition(7), edf.repartition(5, F.col("dst")), 4
            ).collect(),
        )
    )
    assert base == repart
