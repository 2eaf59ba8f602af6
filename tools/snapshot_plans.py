#!/usr/bin/env python
"""Regenerate tests/plan_baseline.json — the physical-plan node
histogram for every registry query at sf0.001.

The baseline is the plan-shape regression net: a future edit that
silently turns a broadcast join into a sort-merge join, adds an
exchange, or drops a partial aggregate changes the node histogram and
fails tests/test_plan_snapshots.py. Run this script ONLY when a plan
change is intentional, and review the diff it prints before
committing.

Node counts come from `queryExecution().sparkPlan()` (the pre-AQE
physical plan): deterministic for fixed test data and Spark version,
no codegen wrappers, no runtime re-planning noise.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_baseline.json",
)


def node_histogram(df) -> dict:
    import re

    counts: dict[str, int] = {}

    def walk(p):
        # content-stamped cache-table names (bkt_lineitem_<mtime-hash>,
        # ann_lsh_index_<mtime-hash>) change whenever the test data is
        # regenerated — normalize the stamp so the baseline pins the
        # plan SHAPE, not the data mtime. Anchored to the two known
        # stamped-dir shapes (r5 ADVICE): an unanchored `_[0-9a-f]{8}`
        # would also rewrite unrelated 8-hex suffixes, making two
        # DIFFERENT same-prefix stamped tables indistinguishable and
        # letting a silent data-source switch slide past the plan diff.
        name = re.sub(
            r"\b(bkt_\w+?|ann_\w+?_index)_[0-9a-f]{8}\b",
            r"\1_<stamp>",
            p.nodeName(),
        )
        counts[name] = counts.get(name, 0) + 1
        for i in range(p.children().length()):
            walk(p.children().apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return dict(sorted(counts.items()))


def snapshot(spark) -> dict:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in sorted(entrymod.queries().items()):
        out[name] = node_histogram(fn(spark, SF))
    return out


def main() -> None:
    from flink_realtime_data_warehouse_spark import get_spark

    spark = get_spark(app_name="frdw-plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    new = snapshot(spark)
    old = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
    for name in sorted(set(old) | set(new)):
        if old.get(name) != new.get(name):
            print(f"CHANGED {name}:")
            for k in sorted(set(old.get(name, {})) | set(new.get(name, {}))):
                a, b = old.get(name, {}).get(k, 0), new.get(name, {}).get(k, 0)
                if a != b:
                    print(f"  {k}: {a} -> {b}")
    with open(OUT, "w") as f:
        json.dump(new, f, indent=0, sort_keys=True)
    print(f"wrote {OUT} ({len(new)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
