"""Plan-shape regression net: every registry query's physical node
histogram (pre-AQE sparkPlan, sf0.001) must match the committed
baseline. A drifted histogram means the plan changed — a broadcast
join degraded to sort-merge, an extra exchange appeared, a partial
aggregate vanished. If the change is INTENTIONAL, regenerate with
`python tools/snapshot_plans.py` and commit the printed diff with the
justification."""

import json
import os
import sys

import __spark_entry__ as entrymod

#: 177-plan snapshot sweep — deselected from the default (driver-window) profile;
#: runs in the recorded slow-tier pass (see pytest.ini)
import pytest

pytestmark = pytest.mark.slowtier


sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BASELINE = os.path.join(os.path.dirname(__file__), "plan_baseline.json")


def test_plan_histograms_match_baseline(spark, sf_dir):
    from tools.snapshot_plans import node_histogram

    with open(BASELINE) as f:
        baseline = json.load(f)
    current = {
        name: node_histogram(fn(spark, sf_dir))
        for name, fn in sorted(entrymod.queries().items())
    }
    drift = {}
    for name in sorted(set(baseline) | set(current)):
        if baseline.get(name) != current.get(name):
            old, new = baseline.get(name, {}), current.get(name, {})
            drift[name] = {
                k: (old.get(k, 0), new.get(k, 0))
                for k in sorted(set(old) | set(new))
                if old.get(k, 0) != new.get(k, 0)
            }
    assert not drift, (
        "plan shapes drifted (regen via tools/snapshot_plans.py if "
        f"intentional): {drift}"
    )
