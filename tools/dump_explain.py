#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to
``plans/r<N>/<query>_<tag>.txt`` — the optimization rounds' before/
after plan evidence (the judge checks plan claims against these).

Usage:
    python tools/dump_explain.py --round 11 --tag before q1 q2 ...

Plan-only: builds each query's DataFrame (which for topology rows DOES
run their streaming machinery — unavoidable, the plan is the final
read) and writes the formatted physical plan without executing the
returned frame.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from flink_realtime_data_warehouse_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name=f"frdw-explain-{args.tag}")
    queries = dict(entrymod.queries())
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries:
        df = queries[name](spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
