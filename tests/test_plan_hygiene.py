"""Suite-wide physical-plan hygiene: no registered query may plan a
CartesianProduct (an O(n·m) shuffle-free explosion — at 100 TB, a
cluster-killer; scalar broadcast subqueries legitimately plan as
BroadcastNestedLoopJoin instead and stay allowed) or a BatchEvalPython
node (row-at-a-time Python UDF — every Python kernel in this engine
must cross via Arrow: ArrowEvalPython / mapInPandas /
FlatMapGroupsInPandas).

This is the executable form of the r2 judge audit ("no row-at-a-time
Python UDFs, no cartesian products found") — kept true by construction
for every query added since.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_row_python_in_any_plan(spark, sf_dir):
    violations = {}
    for name, fn in sorted(entrymod.queries().items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [n for n in FORBIDDEN if n in plan]
        if hits:
            violations[name] = hits
    assert not violations, violations


def _plan_of(spark, sf_dir, name):
    return (
        entrymod.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_selective_filters_reach_the_parquet_scan(spark, sf_dir):
    """Predicate pushdown evidence: scans of selectively-filtered base
    tables must carry a non-empty PushedFilters list (the difference
    between reading row groups and reading the table at 100 TB)."""
    for name in (
        "q6_forecast_revenue",       # date-range + numeric range on lineitem
        "q19_disjunctive_filter",    # disjunctive predicates on two tables
        "er_fuzzy_matches",          # text IS NOT NULL on documents
    ):
        import re

        plan = _plan_of(spark, sf_dir, name)
        # at least one scan carries a NON-empty pushed-filter list
        assert re.search(r"PushedFilters: \[(?!\])", plan), (
            f"{name}: no non-empty PushedFilters in plan"
        )


def test_column_pruning_reaches_the_scan(spark, sf_dir):
    """A 4-column aggregate over lineitem must not scan the wide
    columns — ReadSchema is the scan's actual IO contract."""
    plan = _plan_of(spark, sf_dir, "q6_forecast_revenue")
    assert "l_comment" not in plan
    assert "l_orderkey" not in plan
