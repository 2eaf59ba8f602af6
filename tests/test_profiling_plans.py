"""Physical-plan pins for the profiling/DQ operators — the scale
properties (broadcast join, no full-table window shuffle, pruned
column reads) must survive refactors, not just the output values.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_zscore_plan_broadcasts_stats_no_window(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.profiling import (
        events_zscore_outliers,
    )

    plan = _plan(events_zscore_outliers(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the skew-prone alternative — an unbounded window over event_type —
    # must never reappear
    assert "Window" not in plan


def test_histogram_plan_prunes_columns(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.profiling import (
        agg_value_histogram,
    )

    plan = _plan(agg_value_histogram(spark, sf_dir))
    # only the grouping/value columns reach the scan, not props/user_id
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "value" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "user_id" not in read_schema


def test_dq_ri_join_is_anti(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.operators.dq import (
        dq_validation_suite,
    )

    plan = _plan(dq_validation_suite(spark, sf_dir))
    assert "LeftAnti" in plan
    # no cartesian anywhere in the suite (the scalar checked_rows
    # attach is a broadcast nested loop over a 1-row side, which is fine)
    assert "CartesianProduct" not in plan


def test_moving_avg_single_user_shuffle(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.windows import (
        wf_moving_avg_1h,
    )

    plan = _plan(wf_moving_avg_1h(spark, sf_dir))
    assert "Window" in plan
    # exactly one hash exchange (the user_id window partitioning) — the
    # only other exchange is the final orderBy's range partitioning
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert plan.count("Exchange (") == 2, plan


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    from flink_realtime_data_warehouse_spark.plans.registry import QUERIES
    import flink_realtime_data_warehouse_spark.plans.functions_surface  # noqa: F401

    df = QUERIES["join_bucketed_colocated"](spark, sf_dir)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree
    # the ONLY exchanges are the post-join aggregation + final orderBy;
    # the join consumes the bucketed layout directly
    join_part = tree.split("SortMergeJoin")[1]
    assert "Exchange" not in join_part, tree
    assert tree.count("Exchange") == 2, tree
