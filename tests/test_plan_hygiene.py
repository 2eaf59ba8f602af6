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
