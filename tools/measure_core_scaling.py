#!/usr/bin/env python
"""Strong-scaling measurement over executor cores (the cluster proxy).

The data-axis evidence (tools/measure_scaling.py → SCALING.json) shows
the candidate relations grow linearly; this tool measures the OTHER
axis a 1000-executor cluster exercises: with the data fixed, does wall
time actually fall as cores are added, or does a serial stage
(driver-side work, a single-partition exchange, an unsplittable kernel)
flatten the curve? One representative query per heavy family runs in a
fresh local[N] session per core count — separate processes, so JVM
heap/codegen state never leaks between points.

Method notes:
- min-of-3 per (query, cores) after a warmup run, so the number is the
  steady-state plan cost, not session warmup.
- `spark.sql.shuffle.partitions` follows the core count (the session
  factory default) exactly as a real deployment would.
- Amdahl guard: the INTERESTING output is the 8→32 speedup column.
  Embarrassingly-parallel scans should approach 4×; keyed-shuffle
  queries land lower (exchange + merge overhead is real and we would
  rather report it than hide it); anything near 1× has a serial
  bottleneck worth a plan audit.

Usage:
    python tools/measure_core_scaling.py [sf_dir] [out_json]
Defaults: /root/testdata/sf0.1 → CORE_SCALING.json (repo root).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: one query per heavy family (scan-agg, shuffle-join, inverted-index
#: dedup, NumPy tile kernel, window rollup, graph iteration, rank
#: fan-out), tagged with the one table that gates it: the 10×/30×
#: scale corpora (tools/gen_scale_corpus.py) carry only
#: documents/embeddings/events, so the TPC-H rows only run against a
#: full sf dir
QUERIES_TABLES = [
    ("q1_pricing_summary", "lineitem"),
    ("q18_large_volume", "lineitem"),
    ("dedup_ngram_jaccard", "documents"),
    ("dedup_embedding_pairs", "embeddings"),
    ("rollup_gapfill_interp", "events"),
    ("graph_pagerank_event_transitions", "events"),
    ("ts_similarity_pairs", "events"),
]
QUERIES = [q for q, _ in QUERIES_TABLES]

CORES = [8, 16, 32]


def available_queries(sf_dir: str) -> list[str]:
    return [
        q
        for q, table in QUERIES_TABLES
        if os.path.exists(os.path.join(sf_dir, f"{table}.parquet"))
    ]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from flink_realtime_data_warehouse_spark import get_spark
import __spark_entry__ as entrymod

spark = get_spark(app_name="frdw-core-scaling")
spark.sparkContext.setLogLevel("ERROR")
qs = dict(entrymod.queries())
out = {{}}
for name in {queries!r}:
    fn = qs[name]
    runs = []
    for i in range(4):  # first run = warmup, dropped
        t0 = time.perf_counter()
        fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    out[name] = round(min(runs[1:]), 3)
print("RESULT::" + json.dumps(out))
spark.stop()
"""


def run_point(cores: int, sf_dir: str, queries: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    code = _CHILD.format(repo=REPO, queries=queries, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(
        f"no RESULT from local[{cores}] child:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "CORE_SCALING.json")
    queries = available_queries(sf_dir)
    points = {c: run_point(c, sf_dir, queries) for c in CORES}
    report = {
        "sf_dir": sf_dir,
        "cores": CORES,
        "wall_sec": {q: {str(c): points[c][q] for c in CORES} for q in queries},
        "speedup_8_to_32": {
            q: round(points[8][q] / points[32][q], 2) if points[32][q] else None
            for q in queries
        },
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["speedup_8_to_32"], indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
