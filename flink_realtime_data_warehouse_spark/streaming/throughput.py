"""Streaming end-to-end throughput harness (r4 verdict item 5).

The engine's streaming half had correctness-parity tiers but no
performance number, while the reference's entire pitch is real-time.
This module drives the reference's three streaming topologies over an
``sf``-sized file-drop workload with ``availableNow`` and reports
rows/sec per stage:

- ``parse_st1_split``: BaseLogApp path — JSONL file drop → parse with
  dirty side-channel → ST1 is_new correction (applyInPandasWithState)
  → five-way split → six parquet tables (reference
  BaseLogApp.java:22-187).
- ``st2_uv``: DwdTrafficUniqueVisitorDetail path — parse → entry-page
  filter → ST2 per-(mid, day) first-visit dedup → parquet (reference
  DwdTrafficUniqueVisitorDetail.java:19-88).
- ``dim_router``: DimApp path — topic_db changelog file drop → parse →
  config broadcast join → per-table dimension upsert into the lake
  store (reference DimApp.java:30-102).

The workload derives deterministically from the round's parquet test
data (events → behavior log lines, customer → user_info changelog), so
the row counts scale with the chosen SF and the number is comparable
across rounds alongside ``calib_shuffle_sec``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.sources.streams import read_jsonl_stream
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def prepare_behavior_log(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Synthesize a behavior-log JSONL file drop from the events table:
    one page-view line per event (mid = user, page_id = event type;
    every third event is an entry page with no last_page_id so ST2 has
    real work). Returns the line count."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    lines = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.concat(F.lit("mid_"), F.col("user_id")).alias("mid"),
                    F.when(F.col("user_id") % 7 == 0, F.lit("1"))
                    .otherwise(F.lit("0"))
                    .alias("is_new"),
                ).alias("common"),
                F.struct(
                    F.col("event_type").alias("page_id"),
                    F.when(F.col("event_id") % 3 != 0, F.lit("home")).alias(
                        "last_page_id"
                    ),
                ).alias("page"),
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
            )
        ).alias("value")
    )
    lines.repartition(8).write.mode("overwrite").text(out_dir)
    return ev.count()


def prepare_changelog(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Synthesize a topic_db-style changelog file drop from the
    customer table: one user_info insert per customer. Returns the
    line count."""
    cust = load_table(spark, sf_dir, "customer")
    lines = cust.select(
        F.to_json(
            F.struct(
                F.lit("gmall").alias("database"),
                F.lit("user_info").alias("table"),
                F.lit("insert").alias("type"),
                F.struct(
                    F.col("c_custkey").cast("string").alias("id"),
                    F.col("c_name").alias("name"),
                    F.col("c_mktsegment").alias("birthday"),
                ).alias("data"),
            )
        ).alias("value")
    )
    lines.repartition(4).write.mode("overwrite").text(out_dir)
    return cust.count()


def prepare_doc_drop(
    spark: SparkSession, sf_dir: str, out_dir: str, limit: int | None = None
) -> int:
    """Synthesize a document-ingest JSONL file drop from the documents
    table (the corpus the batch dedup family runs on, so the streaming
    gate classifies a workload with the SAME duplicate structure).
    ``limit`` caps the drop (deterministic lowest doc_ids) — the small
    batch of the gate's fixed/variable split. Returns the line count."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    if limit is not None:
        docs = docs.orderBy("doc_id").limit(limit)
    lines = docs.select(
        F.to_json(F.struct(F.col("doc_id"), F.col("text"))).alias("value")
    )
    lines.repartition(8).write.mode("overwrite").text(out_dir)
    return docs.count()


def prepare_router_config(spark: SparkSession, out_path: str) -> None:
    from flink_realtime_data_warehouse_spark.schemas import TABLE_PROCESS_SCHEMA

    spark.createDataFrame(
        [("user_info", "dim_user_info", "id,name,birthday", "id", None)],
        TABLE_PROCESS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(out_path)


def _measure_startup(spark: SparkSession, work_root: str) -> tuple[float, dict]:
    """Fixed per-run overhead of the three topologies: the same jobs
    driven over ONE-ROW sources with fresh checkpoints. At sf0.1 the
    three full runs cost ~14 s of which ~10 s is this query-init +
    state-store + checkpoint tax (the same topologies sustain ~200 k
    rows/s at 100x corpus, SCALING.json) — measuring it separately
    lets the steady-state rate carry the cross-round regression signal
    instead of being startup-dominated (VERDICT r6 item 5). Returns
    ``(total, per_topology)`` — the breakdown (r8 verdict item 4)
    distinguishes real init-cost creep in ONE topology from uniform
    host drift across all three."""
    import json as _json
    import time

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        base_log_job,
        parse_changelog_stream,
        unique_visitor_job,
    )
    from flink_realtime_data_warehouse_spark.streaming.router import start_dim_app
    from flink_realtime_data_warehouse_spark.streaming.sinks import DimStore

    root = os.path.join(work_root, "startup_probe")
    beh_src = os.path.join(root, "behavior_src")
    chg_src = os.path.join(root, "changelog_src")
    os.makedirs(beh_src, exist_ok=True)
    os.makedirs(chg_src, exist_ok=True)
    with open(os.path.join(beh_src, "one.jsonl"), "w") as f:
        f.write(_json.dumps({
            "common": {"mid": "mid_0", "is_new": "1"},
            "page": {"page_id": "home"},
            "ts": 1_700_000_000_000,
        }) + "\n")
    with open(os.path.join(chg_src, "one.jsonl"), "w") as f:
        f.write(_json.dumps({
            "database": "gmall", "table": "user_info", "type": "insert",
            "data": {"id": "1", "name": "probe", "birthday": "x"},
        }) + "\n")
    config_path = os.path.join(root, "config")
    prepare_router_config(spark, config_path)

    breakdown: dict[str, float] = {}
    t0 = time.perf_counter()
    for q in base_log_job(
        spark,
        read_jsonl_stream(spark, beh_src),
        os.path.join(root, "out_baselog"),
        os.path.join(root, "ckpt_baselog"),
    ):
        q.awaitTermination()
    breakdown["parse_st1_split"] = round(time.perf_counter() - t0, 3)
    t1 = time.perf_counter()
    unique_visitor_job(
        spark,
        read_jsonl_stream(spark, beh_src),
        os.path.join(root, "out_uv"),
        os.path.join(root, "ckpt_uv"),
    ).awaitTermination()
    breakdown["st2_uv"] = round(time.perf_counter() - t1, 3)
    t1 = time.perf_counter()
    store = DimStore(spark, os.path.join(root, "dim"))
    start_dim_app(
        spark,
        parse_changelog_stream(read_jsonl_stream(spark, chg_src)),
        config_path,
        store,
        os.path.join(root, "ckpt_dim"),
    ).awaitTermination()
    breakdown["dim_router"] = round(time.perf_counter() - t1, 3)
    return round(time.perf_counter() - t0, 3), breakdown


def run_streaming_throughput(
    spark: SparkSession, sf_dir: str, work_root: str
) -> dict:
    """Run the three topologies sequentially (each with a cold
    checkpoint, availableNow) and report per-stage wall seconds and
    rows/sec plus the end-to-end aggregate. Prep IO is untimed.

    Two rate scalars (VERDICT r6 item 5): ``streaming_rows_per_sec``
    is the STEADY-STATE rate — row passes divided by the wall net of
    the measured one-row startup tax — and ``streaming_startup_sec``
    is that tax, measured by driving the identical three topologies
    over one-row sources with fresh checkpoints. The raw cold-wall
    aggregate every prior round reported stays as
    ``streaming_rows_per_sec_cold`` for cross-round continuity."""
    import time

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        base_log_job,
        parse_changelog_stream,
        unique_visitor_job,
    )
    from flink_realtime_data_warehouse_spark.streaming.router import start_dim_app
    from flink_realtime_data_warehouse_spark.streaming.sinks import DimStore

    behavior_src = os.path.join(work_root, "behavior_src")
    changelog_src = os.path.join(work_root, "changelog_src")
    config_path = os.path.join(work_root, "config")
    n_behavior = prepare_behavior_log(spark, sf_dir, behavior_src)
    n_changelog = prepare_changelog(spark, sf_dir, changelog_src)
    prepare_router_config(spark, config_path)

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    queries = base_log_job(
        spark,
        read_jsonl_stream(spark, behavior_src),
        os.path.join(work_root, "out_baselog"),
        os.path.join(work_root, "ckpt_baselog"),
    )
    for q in queries:
        q.awaitTermination()
    timings["parse_st1_split_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    unique_visitor_job(
        spark,
        read_jsonl_stream(spark, behavior_src),
        os.path.join(work_root, "out_uv"),
        os.path.join(work_root, "ckpt_uv"),
    ).awaitTermination()
    timings["st2_uv_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    store = DimStore(spark, os.path.join(work_root, "dim"))
    start_dim_app(
        spark,
        parse_changelog_stream(read_jsonl_stream(spark, changelog_src)),
        config_path,
        store,
        os.path.join(work_root, "ckpt_dim"),
    ).awaitTermination()
    timings["dim_router_sec"] = round(time.perf_counter() - t0, 3)

    total = sum(timings.values())
    # N behavior rows traverse two jobs (split path + UV path, exactly
    # the reference's two Kafka consumers), M changelog rows one job —
    # the aggregate rate counts each row once per topology it crosses
    row_passes = 2 * n_behavior + n_changelog
    # min-of-2: the startup scalar estimates a FIXED cost, and under
    # host contention a single run varies >2x back-to-back (measured
    # 8.7-19.3 s in one r9 window) — min is the right estimator for a
    # floor, and the ~10-40 s second run de-noises the one scalar that
    # has needed manual adjudication two rounds running
    startup, startup_breakdown = _measure_startup(spark, work_root)
    import shutil as _sh

    _sh.rmtree(os.path.join(work_root, "startup_probe"), ignore_errors=True)
    startup2, breakdown2 = _measure_startup(spark, work_root)
    if startup2 < startup:
        startup, startup_breakdown = startup2, breakdown2
    # steady-state denominator: never let a tiny workload (total ≈
    # startup) produce a zero/negative wall — floor at 10% of total
    steady_wall = max(total - startup, 0.1 * total)
    result = {
        **timings,
        "rows_behavior": n_behavior,
        "rows_changelog": n_changelog,
        "streaming_total_sec": round(total, 3),
        "streaming_startup_sec": startup,
        "streaming_startup_breakdown": startup_breakdown,
        "streaming_rows_per_sec": (
            round(row_passes / steady_wall, 1) if total else 0.0
        ),
        "streaming_rows_per_sec_cold": (
            round(row_passes / total, 1) if total else 0.0
        ),
    }

    # fourth topology: the exactly-once history-dedup lake ingest
    # (digest anti-join per batch against everything ever ingested —
    # the K3-style state-in-the-lake path). Reported as ITS OWN rate,
    # not folded into streaming_rows_per_sec: that aggregate is the
    # established cross-round regression gate for the three reference
    # topologies and must keep its composition.
    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    doc_src = os.path.join(work_root, "doc_src")
    n_docs = prepare_doc_drop(spark, sf_dir, doc_src)
    t0 = time.perf_counter()
    stream = spark.readStream.schema("doc_id bigint, text string").json(doc_src)
    start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(work_root, "out_histdedup"),
        os.path.join(work_root, "ckpt_histdedup"),
    ).awaitTermination()
    hist_sec = round(time.perf_counter() - t0, 3)
    result["history_dedup_sec"] = hist_sec
    result["rows_docs"] = n_docs
    result["history_dedup_rows_per_sec"] = (
        round(n_docs / hist_sec, 1) if hist_sec else 0.0
    )

    # fifth topology: the same ingest with the df-capped near-dup gate
    # (round 7) — digest classify + capped banding + band-index probe +
    # df/band store maintenance per batch. Its own rate, so the
    # ingest-gate path has a cross-round regression number.
    t0 = time.perf_counter()
    stream = spark.readStream.schema("doc_id bigint, text string").json(doc_src)
    start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(work_root, "out_histdedup_gated"),
        os.path.join(work_root, "ckpt_histdedup_gated"),
        near_dup_gate=True,
    ).awaitTermination()
    gated_sec = round(time.perf_counter() - t0, 3)
    result["history_dedup_gated_sec"] = gated_sec
    result["history_dedup_gated_rows_per_sec"] = (
        round(n_docs / gated_sec, 1) if gated_sec else 0.0
    )

    # gate fixed/variable split (VERDICT r7 item 2): the same gated
    # topology over a SMALL drop isolates the per-batch fixed cost
    # (stream startup + the df-delta/hot-set/band/probe job overhead,
    # none of which scales with the batch) from the per-document work.
    # Two points solve t = fixed + n/var_rps; the 3-size offline curve
    # (sf0.1/10×/30×, tools/measure_gate_amortization.py) lives in
    # BASELINE.md — this in-bench split is the per-round regression
    # scalar for each term separately, because a fixed-cost drift and
    # a per-row drift need different fixes.
    small_n = min(500, n_docs)
    if 0 < small_n < n_docs:
        small_src = os.path.join(work_root, "doc_src_small")
        n_small = prepare_doc_drop(spark, sf_dir, small_src, limit=small_n)
        t0 = time.perf_counter()
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            small_src
        )
        start_history_dedup_ingest(
            spark,
            stream,
            os.path.join(work_root, "out_histdedup_gated_small"),
            os.path.join(work_root, "ckpt_histdedup_gated_small"),
            near_dup_gate=True,
        ).awaitTermination()
        small_sec = round(time.perf_counter() - t0, 3)
        result["history_dedup_gated_small_sec"] = small_sec
        result["rows_docs_small"] = n_small
        per_doc = (gated_sec - small_sec) / (n_docs - n_small)
        if per_doc > 0:
            result["history_dedup_gated_fixed_sec"] = round(
                max(small_sec - n_small * per_doc, 0.0), 3
            )
            result["history_dedup_gated_var_rps"] = round(1.0 / per_doc, 1)
        else:
            # host-noise degenerate (small batch measured no faster):
            # the whole wall is fixed cost at this scale
            result["history_dedup_gated_fixed_sec"] = small_sec
            result["history_dedup_gated_var_rps"] = None

    # sixth topology (round 8, late): the Bloom-prefiltered ingest.
    # First the same drop through bloom_prefilter=True (its own rate —
    # the filter build/OR-update overhead must stay visible), then the
    # access-path win measured DIRECTLY: one more all-new drop into the
    # plain lake and into the bloom lake — the plain path scans the
    # whole digest history to classify it, the bloom probe rules every
    # digest out and skips that scan entirely.
    t0 = time.perf_counter()
    stream = spark.readStream.schema("doc_id bigint, text string").json(doc_src)
    start_history_dedup_ingest(
        spark,
        stream,
        os.path.join(work_root, "out_histdedup_bloom"),
        os.path.join(work_root, "ckpt_histdedup_bloom"),
        bloom_prefilter=True,
    ).awaitTermination()
    bloom_sec = round(time.perf_counter() - t0, 3)
    result["history_dedup_bloom_sec"] = bloom_sec
    result["history_dedup_bloom_rows_per_sec"] = (
        round(n_docs / bloom_sec, 1) if bloom_sec else 0.0
    )

    # all-new second drop (re-keyed, re-texted) appended to the SAME
    # source dir, so each checkpointed job resumes onto exactly it
    docs2 = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("v2 "), F.col("text")).alias("text"),
        )
    )
    tmp2 = os.path.join(work_root, "doc_drop2_tmp")
    docs2.select(
        F.to_json(F.struct("doc_id", "text")).alias("value")
    ).repartition(8).write.mode("overwrite").text(tmp2)
    import shutil as _shutil

    for f in os.listdir(tmp2):
        if f.startswith("part-"):
            _shutil.move(os.path.join(tmp2, f), os.path.join(doc_src, f))

    def _resume(out_name: str, ckpt_name: str, bloom: bool) -> float:
        # resume into CLONES: the measurement must not mutate the
        # original lakes, whose row counts the smoke assertions pin
        out2 = os.path.join(work_root, f"{out_name}_second")
        ckpt2 = os.path.join(work_root, f"{ckpt_name}_second")
        _shutil.copytree(os.path.join(work_root, out_name), out2)
        _shutil.copytree(os.path.join(work_root, ckpt_name), ckpt2)
        t0 = time.perf_counter()
        s = spark.readStream.schema("doc_id bigint, text string").json(doc_src)
        start_history_dedup_ingest(
            spark, s, out2, ckpt2, bloom_prefilter=bloom
        ).awaitTermination()
        return round(time.perf_counter() - t0, 3)

    result["history_dedup_second_scan_sec"] = _resume(
        "out_histdedup", "ckpt_histdedup", False
    )
    result["history_dedup_second_bloom_sec"] = _resume(
        "out_histdedup_bloom", "ckpt_histdedup_bloom", True
    )
    return result


def _smoke_outputs(spark: SparkSession, work_root: str) -> dict:
    """Row counts of the produced tables (test hook)."""
    out = {}
    for rel in (
        "out_baselog/dwd_traffic_corrected_log",
        "out_baselog/dwd_traffic_page_log",
        "out_uv",
        "dim/dim_user_info",
        "out_histdedup/clean",
        "out_histdedup/digests",
    ):
        path = os.path.join(work_root, rel)
        out[rel] = (
            spark.read.parquet(path).count() if os.path.isdir(path) else 0
        )
    return out
