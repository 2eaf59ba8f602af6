#!/usr/bin/env python
"""Scale measurement for the r9 families (r9 verdict item 5): PII
scan/redact walls ~linear in rows, rollup chunk expiry flat in chunk
count while the store grows.

Both claims had analytic arguments (map-only regex codegen; rename-only
chunk drops) but no SCALING.json rows. Methodology follows
measure_retention_scaling.py: one FRESH JVM per scale point, so the
measurement captures the operation, not session aging.

- **pii**: run the registered ``dq_pii_scan`` (one conditional-agg
  scan) and ``text_pii_redact`` (chained regexp_replace projection)
  over the 1x/10x/30x scale corpora; record wall + rows. Expected:
  wall grows ≲ linearly with rows (map-only — at 1000 executors the
  same plan is embarrassingly parallel).
- **rollup_expiry**: build minute-partial stores with a FIXED number
  of expirable day-chunks (23 of 30) but growing partial mass per
  chunk (events multiplied per scale), then measure
  ``expire_rollup_chunks``. Expected: expiry wall FLAT while store
  bytes grow — the drop is one directory rename per expired day and
  never opens a data file.

Usage:
  python tools/gen_scale_corpus.py --out /tmp/scale1x  --mult 1
  python tools/gen_scale_corpus.py --out /tmp/scale10x --mult 10
  python tools/gen_scale_corpus.py --out /tmp/scale30x --mult 30
  python tools/measure_pii_rollup_scaling.py /tmp/scale1x /tmp/scale10x /tmp/scale30x
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _store_bytes(root: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, files in os.walk(root)
        for f in files
    )


def measure(spark, sf_dir: str) -> dict:
    from flink_realtime_data_warehouse_spark.operators.pii import (
        dq_pii_scan,
        text_pii_redact,
    )
    from flink_realtime_data_warehouse_spark.streaming.rollup import (
        expire_rollup_chunks,
        make_rollup_merger,
        read_minute_rollup,
    )

    out: dict = {"sf_dir": sf_dir}

    # ---- PII scan / redact over the scale corpus --------------------------
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    out["pii_rows"] = n_docs
    t0 = time.perf_counter()
    dq_pii_scan(spark, sf_dir).collect()
    out["pii_scan_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    # a noop-format write drains the full redaction projection without
    # shipping every redacted payload to the driver (the wall is the
    # scan+map, not a collect)
    text_pii_redact(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out["pii_redact_sec"] = round(time.perf_counter() - t0, 3)

    # ---- rollup chunk expiry over a growing store -------------------------
    # 30 day-chunks; the store grows the way this store actually grows
    # in production: in pbatch SEGMENTS (minute partials per day
    # saturate at 1440 rows, so event mass alone cannot grow the
    # store). Batch count scales with the corpus (one segment per
    # ~25k events), so chunk count stays fixed while bytes and file
    # count grow ~mult x — and expiry must stay flat because it only
    # renames the 23 pday directories, never opening a file.
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_col = "event_time" if "event_time" in events.columns else events.columns[0]
    n_events = events.count()
    n_batches = max(1, n_events // 25_000)
    store = tempfile.mkdtemp(prefix="frdw_expiry_store_")
    shutil.rmtree(store, ignore_errors=True)
    try:
        base = events.select(
            F.timestamp_millis(
                (
                    F.pmod(F.xxhash64(F.col(ts_col).cast("string")), F.lit(30 * 1440))
                    * 60_000
                ).cast("bigint")
            ).alias("event_time"),
            F.lit(1.0).alias("value"),
            F.pmod(F.xxhash64(F.col(ts_col).cast("string"), F.lit(7)), F.lit(n_batches))
            .cast("int")
            .alias("_b"),
        )
        merger = make_rollup_merger(store)
        for b in range(n_batches):
            merger(base.filter(F.col("_b") == b).drop("_b"), b)
        out["rollup_batches"] = n_batches
        out["rollup_store_bytes"] = _store_bytes(store)
        out["rollup_chunks"] = len(
            [d for d in os.listdir(store) if d.startswith("pday=")]
        )
        # split the two expiry phases: time-to-policy-visible (pure
        # renames — the flat claim) vs total incl. husk deletion
        # (grows with file count — inherent unlink cost, deferred by
        # design so it never serializes visibility)
        import flink_realtime_data_warehouse_spark.streaming.rollup as _rl

        marks: dict = {}
        real_rmtree = _rl.shutil.rmtree

        def _timed(path, **kw):
            if "_expired_" in str(path):
                marks.setdefault("first_delete", time.perf_counter())
            return real_rmtree(path, **kw)

        _rl.shutil.rmtree = _timed
        try:
            t0 = time.perf_counter()
            dropped = expire_rollup_chunks(spark, store, keep_days=7)
            t1 = time.perf_counter()
        finally:
            _rl.shutil.rmtree = real_rmtree
        out["rollup_expire_visible_sec"] = round(
            marks.get("first_delete", t1) - t0, 4
        )
        out["rollup_expire_sec"] = round(t1 - t0, 3)
        out["rollup_chunks_dropped"] = len(dropped)
        # serving read still healthy after the drop
        out["rollup_minutes_served"] = read_minute_rollup(spark, store).count()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def main() -> None:
    dirs = sys.argv[1:]
    if len(dirs) == 1:
        from flink_realtime_data_warehouse_spark import get_spark

        spark = get_spark(app_name="frdw-pii-rollup-scaling")
        print(json.dumps(measure(spark, dirs[0])))
        spark.stop()
        return
    import subprocess

    rows = []
    for d in dirs:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), d],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        rows.append(json.loads(res.strip().splitlines()[-1]))
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
