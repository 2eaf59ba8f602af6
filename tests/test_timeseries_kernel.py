"""Planted-value tests for the ts_similarity packed-map L1 kernel.

The oracle parity tier proves Spark ≡ DuckDB, but both sides encode the
same blocking and alignment logic — a shared misunderstanding would
pass it. These fixtures pin the KERNEL's arithmetic against hand-
computed L1 distances: within-bucket cent summing, disjoint-hour
alignment (one side missing an hour contributes |v|), the identical-
series zero, and the NULL-ts sentinel bucket aligning ACROSS users
exactly like the oracle's h-IS-NULL group."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from flink_realtime_data_warehouse_spark.operators.timeseries import (
    ts_similarity_pairs,
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ts_planted"))
    rows = [
        # u1: two events inside hour H0 (must SUM to 100 cents) + one in H1
        (1, "2024-01-01 05:15:00", 0.40),
        (1, "2024-01-01 05:45:00", 0.60),
        (1, "2024-01-01 06:10:00", 2.00),
        # u2: H0 only
        (2, "2024-01-01 05:30:00", 1.50),
        # u3: identical series to u1 (single H0 event)
        (3, "2024-01-01 05:05:00", 1.00),
        (3, "2024-01-01 06:50:00", 2.00),
        # u4 / u5: NULL ts only — both land in the sentinel bucket and
        # must align with EACH OTHER (L1 = 0), not explode or drop
        (4, None, 1.00),
        (5, None, 1.00),
    ]
    df = spark.createDataFrame(
        [(u, ts, v) for u, ts, v in rows],
        "user_id bigint, ts string, value double",
    ).select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/events.parquet")
    return root


def test_planted_l1_distances(spark, planted_dir):
    got = {
        (r.ua, r.ub): (r.l1_e2, r.rnk)
        for r in ts_similarity_pairs(spark, planted_dir).collect()
    }
    # hand-computed: series(e2) u1={H0:100,H1:200} u2={H0:150}
    # u3=u1, u4=u5={SENTINEL:100}; 5 users, K=8 → all 10 pairs candidates
    expected_l1 = {
        (1, 3): 0,
        (4, 5): 0,
        (1, 2): 250,   # |100-150| + |200-0|
        (2, 3): 250,
        (2, 4): 250,   # |150-0| + |0-100| (disjoint: H0 vs sentinel)
        (2, 5): 250,
        (1, 4): 400,   # 100 + 200 + 100, fully disjoint hours
        (1, 5): 400,
        (3, 4): 400,
        (3, 5): 400,
    }
    assert {p: d for p, (d, _) in got.items()} == expected_l1
    # rank order: l1 asc, then (ua, ub) — ties broken deterministically
    expected_rank_order = [
        (1, 3), (4, 5),
        (1, 2), (2, 3), (2, 4), (2, 5),
        (1, 4), (1, 5), (3, 4), (3, 5),
    ]
    by_rank = [p for p, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert by_rank == expected_rank_order


def test_planted_null_value_rows_dropped(spark, planted_dir, tmp_path):
    """A NULL value must drop the ROW (not zero it): a user whose only
    events are NULL-valued forms no series at all."""
    root = str(tmp_path)
    base = spark.read.parquet(f"{planted_dir}/events.parquet")
    extra = spark.createDataFrame(
        [(9, "2024-01-01 05:00:00", None)],
        "user_id bigint, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    base.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        f"{root}/events.parquet"
    )
    res = ts_similarity_pairs(spark, root).collect()
    users = {r.ua for r in res} | {r.ub for r in res}
    assert 9 not in users
    assert len(res) == 10  # unchanged pair set
