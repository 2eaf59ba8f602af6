#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Output: a
full-detail JSON line first (also mirrored to bench_detail.json),
then the FINAL compact JSON line the driver parses:
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...} — kept under 1900 chars so it
survives the driver's 2000-char tail capture intact (rounds 3-5 all
recorded "parsed": null because one fat line outgrew that window).

Each query executes end-to-end via a noop write (full plan execution,
no driver-side materialization skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "q18_large_volume",
    "wf_running_revenue",
    "agg_cube_orders",
    "st1_is_new_correction",
    "st2_daily_unique_visitors",
    "st4_bounce_detection",
    "t7_explode_words",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_stats",
    "text_fingerprint",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "win_tumbling_hourly",
    "win_session_gaps",
    "join_interval_conversion",
    "join_asof_last_view",
    "agg_percentiles",
    "pipeline_curation_stats",
    # new heavy operator (round 2): iterative connected components
    "dedup_connected_groups",
    # round 3: CEP funnel, DQ contract suite, TF-IDF keywords
    "cep_funnel_3step",
    "dq_validation_suite",
    "text_tfidf_topk",
    # round 3 (late): continuous-aggregate cascade, binned range join,
    # PQ compressed-scan ANN
    "rollup_hypertable",
    "join_range_binned",
    "ann_pq_topk",
    # round 3 (final): decontamination sweep, blocked fuzzy ER,
    # map-only quality classifier
    "decontam_eval_overlap",
    "er_fuzzy_matches",
    "text_quality_classifier",
    # round 3 (closing): gapfill pair, leakage-safe splits, containment,
    # PageRank, weighted mixture
    "rollup_gapfill_locf",
    "rollup_gapfill_interp",
    "split_leakage_safe",
    "dedup_ngram_containment",
    "graph_pagerank_event_transitions",
    "sample_weighted_mixture",
    # round 4: combined jaccard+containment single-pass (shares the
    # shingle shuffle the two separate rows above each pay)
    "dedup_ngram_pair_stats",
    # round 4: retrieval + semantic/incremental/substring dedup + data card
    "search_bm25_topk",
    "dedup_semantic_groups",
    "dedup_incremental_history",
    "dedup_substring_span_stats",
    "corpus_summary_report",
    # round 4 (late): hard negatives, incremental near-dup gate,
    # quality tiers, drift monitor
    "ann_hard_negatives",
    "ann_ivf_streaming_ingest_checked",
    "dedup_incremental_lsh",
    "curation_quality_tiers",
    "dq_drift_report",
    # round 4 (closing): span removal rewrite, source overlap matrix,
    # per-lang quality quota
    "dedup_span_rewrite",
    "dq_source_overlap",
    "sample_quality_quota",
    "text_collocation_lift",
    "export_user_event_sequences",
    "split_temporal_embargo",
    "dq_lang_confusion",
    "events_winsorized_stats",
    "search_hybrid_rrf",
    "sample_token_budget",
    "dq_snapshot_diff",
    "ts_similarity_pairs",
    # round 5: codec-free perceptual near-dup over binary payloads,
    # embedding-space benchmark decontamination
    "multimodal_perceptual_dups",
    "multimodal_perceptual_dups_capped",
    "decontam_semantic_overlap",
    # round 5 (closing): 1→N frame sampling through the Arrow kernel
    "multimodal_frame_digests",
    # round 6: boilerplate-robust production near-dup path, MG
    # shortlist heavy hitters, exact-k hash reservoir
    "dedup_ngram_jaccard_dfcap",
    "dedup_minhash_lsh_pairs_dfcap",
    "text_heavy_hitters",
    "text_heavy_hitters_by_lang",
    "sample_hash_reservoir",
    # round 7: df-capped incremental ingest gate (the skew defense
    # composed into the path where boilerplate actually arrives),
    # per-source drift + per-language collocations (grouped data-card
    # forms with null-safe group handling)
    "dedup_incremental_lsh_dfcap",
    "dq_drift_report_by_source",
    "text_collocation_lift_by_lang",
    # round 7: stats through the real BMP encode->decode round trip
    "multimodal_bmp_channel_stats",
    # round 8: right-to-erasure composed over the whole lake
    "lake_takedown_audit",
    "dedup_incremental_lsh_dfcap_compacted",
    # round 8 (late): distributed prefix-sum numbering, partitioned
    # Bloom membership gate, deterministic corpus shuffle → shards
    "ids_stable_assign",
    "dedup_bloom_gate_checked",
    "export_shuffled_shards",
    # round 8 (late): flat-file landing-zone round trips, bigram-LM
    # perplexity-filter signal
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    "text_bigram_logprob",
    # round 8 (late): near-dup decontamination (the triad's third
    # face), surrogate-key continuation numbering
    "decontam_neardup_overlap",
    "ids_incremental_assign",
    # round 9: PII scrub (map-only regex scan + redaction rewrite) and
    # the scrub composed into the streaming ingest (payload redacted,
    # classification on original bytes)
    "dq_pii_scan",
    "text_pii_redact",
    "lake_pii_scrubbed_ingest",
    # round 9: hypertable retention (drop_chunks) over the real
    # continuous-aggregate store — expiry is rename-only, scan-free
    "rollup_retention_audit",
    # round 10: corpus-trained BPE token accounting (train = two
    # aggregations + K-row collect; apply = map-only replace chain)
    # and the token budget priced in the unit training actually spends
    "text_bpe_token_count",
    "sample_token_budget_bpe",
    "pack_training_sequences_bpe",
    # round 10: stats through the REAL zlib PNG encode->decode round
    # trip, all five scanline filters exercised per image
    "multimodal_png_channel_stats",
    # round 11: dims through the REAL baseline-JFIF Huffman+DCT
    # encode->decode round trip (fidelity bound enforced in-kernel)
    "multimodal_jpeg_roundtrip_dims",
]


#: final-line size budget: the driver keeps the LAST 2000 chars of
#: stdout and parses a complete JSON line out of them — 100 chars of
#: slack for the trailing newline + any straggler output
COMPACT_BUDGET = 1900


def compact_line(detail: dict) -> str:
    """The driver-parsed final line, guaranteed ≤ COMPACT_BUDGET chars.

    Per-query values at 2 decimals, slowest-first; if the headline set
    ever grows the line past the budget, the fastest rows are dropped
    (count + summed seconds preserved in queries_omitted/omitted_sec;
    the full dict is always on line 1 and in bench_detail.json).
    "value"/"total_min" cover ALL queries regardless of omission."""
    timings = detail["queries"]
    compact = {
        k: v
        for k, v in detail.items()
        if k not in ("streaming", "queries_min", "ann_lsh_warm_sec",
                     "ann_pq_warm_sec")
    }
    order = sorted(timings, key=timings.get, reverse=True)
    q2 = {n: round(timings[n], 2) for n in order}
    omitted: list[str] = []
    while True:
        compact["queries"] = q2
        if omitted:
            compact["queries_omitted"] = len(omitted)
            compact["omitted_sec"] = round(sum(timings[n] for n in omitted), 2)
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= COMPACT_BUDGET or not q2:
            return line
        omitted.append(order[len(q2) - 1])
        q2.pop(omitted[-1])


def _calib_cpu() -> float:
    """One run of the fixed compute workload: 8 float32 1024x1024
    matmuls (the BLAS path every Arrow kernel rides) + a 5M-iteration
    pure-Python loop (the interpreter path). ~0.6 s on this host's
    fast window, ~1.2 s on its slow one — the ratio IS the drift."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((1024, 1024), dtype=np.float32)
    b = rng.standard_normal((1024, 1024), dtype=np.float32)
    t0 = time.perf_counter()
    for _ in range(8):
        a @ b
    s = 0
    for i in range(5_000_000):
        s += i & 1023
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_realtime_data_warehouse_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="frdw-bench")
    queries = dict(entrymod.queries())
    # the raw ANN probes are benchmarked directly (their registry
    # entries are the *_checked recall-verdict queries, which fold in a
    # brute-force baseline and would not measure probe cost)
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        ann_lsh_topk,
    )

    from flink_realtime_data_warehouse_spark.operators.pq import ann_pq_topk

    queries["ann_lsh_topk"] = ann_lsh_topk
    queries["ann_pq_topk"] = ann_pq_topk

    # warm the JVM/codegen once with the cheapest query
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # the index-backed ANN queries build their index on first call
    # (one-time; amortized across probes at scale). Warm them before
    # the timed loop — the headline rows should measure the
    # steady-state probe, not build+probe — and report the warm
    # (build-inclusive) costs as their own metrics for transparency.
    t0 = time.perf_counter()
    queries["ann_lsh_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    ann_lsh_warm = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    queries["ann_pq_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    ann_pq_warm = round(time.perf_counter() - t0, 3)

    # BPE cold-train scalar (r11 verdict item 5): the session merge
    # memo means the three BPE rows' median-of-3 reports warm-apply
    # cost only; this times ONE cold train (memo cleared first) so the
    # train cost stays visible per round — the ann_lsh_warm_sec
    # pattern. The train re-warms the memo with exactly the key the
    # rows use, so their timings keep the same (warm) composition as
    # r11.
    from flink_realtime_data_warehouse_spark.operators import bpe as _bpe
    from flink_realtime_data_warehouse_spark.sources.tables import (
        load_table as _load_table,
    )

    with _bpe._MERGES_LOCK:
        _bpe._MERGES_CACHE.clear()
    t0 = time.perf_counter()
    _bpe.train_bpe_merges(_load_table(spark, sf_dir, "documents"))
    bpe_train = round(time.perf_counter() - t0, 3)

    # fixed synthetic workload (data-independent: in-memory range +
    # one shuffle) — a per-round box-speed calibration so cross-round
    # query deltas can be separated from host drift (r2 verdict: r1→r2
    # showed ~1.38× uniform drift from methodology/box alone)
    calib_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 100_000_000)
            .selectExpr("id % 1024 AS k", "id")
            .groupBy("k")
            .sum("id")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        calib_runs.append(time.perf_counter() - t0)
    calib = round(sorted(calib_runs)[1], 3)

    # compute-bound twin of the shuffle calibration (r8 verdict item 2):
    # this host's COMPUTE speed drifts ~2x between windows independently
    # of shuffle speed, and the NumPy-kernel rows (embedding / semdedup /
    # multimodal / ANN) track the former. A fixed NumPy matmul + a pure-
    # Python loop — both data-independent — let compare_bench.py
    # normalize those rows without the manual microbench adjudication
    # sessions rounds 6-8 each needed.
    calib_cpu = round(sorted(_calib_cpu() for _ in range(3))[1], 3)

    # streaming end-to-end throughput (r4 verdict item 5): the three
    # reference topologies (parse→ST1→split, ST2 UV, dim router) over a
    # file-drop workload derived from this SF's tables — the streaming
    # path's regression gate, reported as rows/sec next to the batch
    # rows so both halves of the engine have a number
    import shutil
    import tempfile

    from flink_realtime_data_warehouse_spark.streaming.throughput import (
        run_streaming_throughput,
    )

    stream_root = tempfile.mkdtemp(prefix="frdw_bench_stream_")
    try:
        streaming = run_streaming_throughput(spark, sf_dir, stream_root)
    finally:
        shutil.rmtree(stream_root, ignore_errors=True)

    # three ROUND-ROBIN passes over the whole list, not 3 back-to-back
    # runs per query: a transient host stall (measured in round 5 — a
    # ~25 s slow window inflated 4 consecutive rows 1.6-2.7× while the
    # same queries measured flat in isolation) then lands in ONE pass
    # of a few queries instead of all three runs of whichever queries
    # it straddles, and the per-query min recovers the true cost
    runs_by_q: dict[str, list[float]] = {n: [] for n in HEADLINE if n in queries}
    for _ in range(3):
        for name, runs in runs_by_q.items():
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
    # report BOTH (VERDICT r2 item 4): median is the headline
    # (comparable to r2); min separates plan cost from box noise
    timings = {n: round(sorted(r)[1], 3) for n, r in runs_by_q.items()}
    timings_min = {n: round(min(r), 3) for n, r in runs_by_q.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    detail = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "total_min": round(sum(timings_min.values()), 3),
        "calib_shuffle_sec": calib,
        "calib_cpu_sec": calib_cpu,
        # steady-state rate + its measured startup tax (VERDICT r6
        # item 5): the fixed ~10 s of query-init/state-store overhead
        # no longer masks streaming regressions in the rate scalar
        "streaming_rows_per_sec": streaming["streaming_rows_per_sec"],
        "streaming_startup_sec": streaming["streaming_startup_sec"],
        # the df-capped ingest gate's own rate (round 7): short key so
        # the compact driver line stays inside its budget
        "hist_gate_rps": streaming["history_dedup_gated_rows_per_sec"],
        # the gate's two-point fixed/variable split (round 8): fixed
        # per-batch overhead vs per-document rate, so regressions in
        # either term are separately visible (the single rps scalar
        # conflates them — a small batch is fixed-cost-dominated)
        "hist_gate_fixed_sec": streaming.get("history_dedup_gated_fixed_sec"),
        "hist_gate_var_rps": streaming.get("history_dedup_gated_var_rps"),
        # bloom-prefiltered ingest (round 8, late): an all-new second
        # drop classified against the grown history, with and without
        # the filter — the pair measures the skipped history scan
        "hist_second_sec": streaming.get("history_dedup_second_scan_sec"),
        "hist_second_bloom_sec": streaming.get(
            "history_dedup_second_bloom_sec"
        ),
        "streaming": streaming,
        "ann_lsh_warm_sec": ann_lsh_warm,
        "ann_pq_warm_sec": ann_pq_warm,
        # cold Sennrich train (memo cleared) — the scalar that keeps
        # train cost visible while the rows report warm-apply
        "bpe_train_sec": bpe_train,
        "queries": timings,
        "queries_min": timings_min,
    }
    # full detail: first line of output + a best-effort sidecar file
    # (the driver's capture keeps only the LAST 2000 chars of stdout)
    print(json.dumps(detail))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json"), "w") as f:
            json.dump(detail, f)
    except OSError:
        pass
    # FINAL line: the one the driver parses. It must fit inside the
    # driver's 2000-char tail window — r3/r4/r5 all recorded
    # "parsed": null because the single fat line outgrew the window and
    # the capture kept only its tail (r1/r2, with fewer queries,
    # parsed fine). Compact separators + 2-decimal per-query values,
    # ordered slowest-first; if the registry ever grows the line past
    # the budget, the FASTEST rows are dropped (their count and summed
    # seconds stay in queries_omitted/omitted_sec, and the full dict is
    # always on line 1 + bench_detail.json). value/total_min cover ALL
    # queries regardless of omission.
    print(compact_line(detail))
    spark.stop()


if __name__ == "__main__":
    main()
