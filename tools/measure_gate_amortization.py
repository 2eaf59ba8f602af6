"""Pin the ingest-gate amortization curve (VERDICT r7 item 2).

Drives `start_history_dedup_ingest` — ungated and with the df-capped
near-dup gate — over single-batch document drops of increasing size
(sf0.1's one-drop plus the 10x/30x scale corpora) and reports rows/s
per size plus a least-squares fixed/variable split of the gated wall:

    t_gated(n) = fixed_sec + n / var_rps

The fixed term is the per-batch job overhead (stream startup, df-delta
agg, hot-set derivation, band append, probe — a handful of jobs whose
cost does not scale with the batch); the variable term is the
per-document work. r7 measured one amortization point; this pins the
curve so "gate rps at small batches" regressions separate fixed-cost
drift from per-row drift.

Usage:
    python tools/measure_gate_amortization.py \
        --dirs /root/testdata/sf0.1 /tmp/r7_scale10x /tmp/r7_scale30x \
        [--out /tmp/gate_amortization.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_ingest(spark, doc_src: str, work: str, gate: bool) -> float:
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    tag = "gated" if gate else "plain"
    t0 = time.perf_counter()
    stream = spark.readStream.schema("doc_id bigint, text string").json(doc_src)
    start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(work, f"out_{tag}"),
        os.path.join(work, f"ckpt_{tag}"),
        near_dup_gate=gate,
    ).awaitTermination()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", required=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default="/tmp/gate_amortization.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_realtime_data_warehouse_spark.streaming.throughput import (
        prepare_doc_drop,
    )

    points = []
    for sf_dir in args.dirs:
        work = tempfile.mkdtemp(prefix="gate_amort_")
        try:
            doc_src = os.path.join(work, "doc_src")
            n = prepare_doc_drop(spark, sf_dir, doc_src)
            plain = run_ingest(spark, doc_src, work, gate=False)
            gated = run_ingest(spark, doc_src, work, gate=True)
            pt = {
                "sf_dir": sf_dir,
                "n_docs": n,
                "plain_sec": round(plain, 2),
                "gated_sec": round(gated, 2),
                "plain_rps": round(n / plain, 1),
                "gated_rps": round(n / gated, 1),
                "gated_over_plain": round(gated / plain, 2),
            }
            points.append(pt)
            print(json.dumps(pt), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    result: dict = {"points": points}
    if len(points) >= 2:
        # least-squares t = a + b*n over the gated walls
        ns = [p["n_docs"] for p in points]
        ts = [p["gated_sec"] for p in points]
        k = len(ns)
        sx, sy = sum(ns), sum(ts)
        sxx = sum(x * x for x in ns)
        sxy = sum(x * y for x, y in zip(ns, ts))
        denom = k * sxx - sx * sx
        b = (k * sxy - sx * sy) / denom
        a = (sy - b * sx) / k
        result["fit"] = {
            "fixed_sec": round(a, 2),
            "var_rps": round(1.0 / b, 1) if b > 0 else None,
        }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
