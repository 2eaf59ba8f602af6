#!/usr/bin/env python
"""Micro-bench a named subset of registry queries (3 runs, min+median)
— the regression-bisect companion to bench.py. Usage:

    python tools/microbench.py q1 q2 ...   # names from queries()
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_realtime_data_warehouse_spark import get_spark
    import __spark_entry__ as entrymod

    queries = dict(entrymod.queries())
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        print(f"registry has {len(queries)} names; see QUERIES.md", file=sys.stderr)
        raise SystemExit(2)
    spark = get_spark(app_name="frdw-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup — q1 when the corpus has TPC-H tables, else
    # the first requested query (scale corpora carry only
    # documents/embeddings/events)
    warm = (
        "q1_pricing_summary"
        if os.path.exists(os.path.join(sf_dir, "lineitem.parquet"))
        else names[0]
    )
    queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        fn = queries[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "min": round(min(runs), 3),
            "med": round(sorted(runs)[1], 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
