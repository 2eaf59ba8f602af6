#!/usr/bin/env python
"""Skew-robustness measurement (round 6): uniform vs Zipfian corpora.

The data-axis evidence in SCALING.json is measured on UNIFORM corpora
— which can never expose a hot-key cliff, and hot keys are what
actually kill jobs at 100 TB. `tools/gen_scale_corpus.py --zipf`
plants the four classic skew axes deterministically:

- boilerplate text shared by 30% of documents (4 shingles, df = 0.3·n)
- Zipfian source mix (top source ~34% of docs)
- power-law users (top user ~10% of ALL events)
- one dominant embedding cluster (~50% of vectors)

This tool runs the same operator families on a uniform corpus and its
Zipfian twin at the same multiplier and records, per family, the
candidate/comparison counts and walls on BOTH — plus the planted
near-dup recall of the df-capped production path, so "the defense is
bounded" and "the defense still finds the dups" are both measured.

Quadratic-able stages are GATED: the candidate bound is computed
first (cheap group-by), and the stage only runs while the bound stays
task-sized — on the skew corpus the uncapped n-gram bound IS the
finding (450.6 M at 50 k docs), not something to wait out.

Usage:
  python tools/gen_scale_corpus.py --out /tmp/scale10x --mult 10
  python tools/gen_scale_corpus.py --out /tmp/skew10x  --mult 10 --zipf
  python tools/measure_skew.py /tmp/scale10x /tmp/skew10x
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PAIR_GATE = 100_000_000  #: skip timed runs past this many join rows


def _timed(fn, spark, sf_dir, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _pairs_bound(df, key_cols) -> int:
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("b"))
        .collect()[0]["b"]
        or 0
    )


def _top_share(df, key) -> dict:
    total = df.count()
    top = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"))
        .limit(1)
        .collect()[0]
    )
    return {
        "key": str(top[key]),
        "rows": top["c"],
        "share": round(top["c"] / total, 4),
    }


def measure_dir(spark, sf_dir: str) -> dict:
    from flink_realtime_data_warehouse_spark.operators import timeseries as ts
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        NGRAM_DF_CAP,
        _ngram_pair_counts,
        _ngram_pair_counts_capped,
        _shingle_df,
        band_keys,
        dedup_ngram_jaccard,
        dedup_ngram_jaccard_dfcap,
        dedup_minhash_lsh_pairs,
        minhash_lsh_candidate_pairs,
        release_shingle_cache,
    )
    from flink_realtime_data_warehouse_spark.operators.dq import dq_source_overlap
    from flink_realtime_data_warehouse_spark.operators.export import (
        export_user_event_sequences,
    )
    from flink_realtime_data_warehouse_spark.plans.rollups import (
        rollup_gapfill_interp,
    )
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    out: dict = {"sf_dir": sf_dir}
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    out["n_docs"] = n_docs

    # --- skew descriptors: how hot ARE the hot keys on this corpus
    sh = _shingle_df(docs)
    hot = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
    )
    out["skew_axes"] = {
        "hot_shingles": hot.count(),
        "max_shingle_df": (hot.agg(F.max("df")).collect()[0][0] or 0),
        "top_source": _top_share(docs, "source"),
        "top_user": _top_share(ev, "user_id"),
        "top_cluster": _top_share(emb, "label"),
    }

    # --- n-gram inverted index: uncapped bound vs df-capped candidates.
    # The planted truth: every DUP_EVERY-th doc duplicates its
    # predecessor, and the generator never lands boilerplate on those
    # pairs, so planted recall isolates "did the cap cost us real dups"
    uncapped_bound = _pairs_bound(sh, ["s"])
    ngram = {
        "uncapped_bound": uncapped_bound,
        "capped_candidates": _ngram_pair_counts_capped(docs).count(),
        "capped_wall_sec": _timed(dedup_ngram_jaccard_dfcap, spark, sf_dir),
    }
    if uncapped_bound <= PAIR_GATE:
        ngram["uncapped_candidates"] = _ngram_pair_counts(docs).count()
        ngram["uncapped_wall_sec"] = _timed(dedup_ngram_jaccard, spark, sf_dir)
    planted = (
        docs.filter((F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0))
        .select(
            (F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
    )
    capped_pairs = _ngram_pair_counts_capped(docs).select("doc_a", "doc_b")
    ngram["planted_pairs"] = planted.count()
    ngram["planted_recalled"] = planted.join(
        capped_pairs, ["doc_a", "doc_b"]
    ).count()
    out["ngram"] = ngram

    # --- MinHash LSH: banding is naturally boilerplate-robust (4 hot
    # shingles out of ~60+ rarely win a MinHash slot), so its candidate
    # count should stay ≈ planted on BOTH corpora — measured, not assumed
    lsh_bound = _pairs_bound(band_keys(docs), ["band", "key"])
    lsh = {"bucket_bound": lsh_bound}
    if lsh_bound <= PAIR_GATE:
        lsh["candidates"] = minhash_lsh_candidate_pairs(docs).count()
        lsh["wall_sec"] = _timed(dedup_minhash_lsh_pairs, spark, sf_dir)
    # the production composition: df-cap UPSTREAM of minhashing — on
    # boilerplate corpora the uncapped banding drifts superlinear while
    # capped signatures should track the planted dups
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        band_keys_capped,
    )

    cb = band_keys_capped(docs)
    lsh["capped_bucket_bound"] = _pairs_bound(cb, ["band", "key"])
    if lsh["capped_bucket_bound"] <= PAIR_GATE:
        a, b2 = cb.alias("a"), cb.alias("b")
        lsh["capped_candidates"] = (
            a.join(
                b2,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
    out["lsh"] = lsh

    # --- incremental ingest gate (round 7): the df-cap composed into
    # the PERSISTED band-index probe — ingest is where boilerplate
    # actually arrives. History docs build the capped index; the
    # incoming slice probes it. The uncapped probe bound (history
    # band-cell counts × incoming band-cell counts) is computed first
    # and the uncapped probe only runs while that bound stays
    # task-sized — on the skew corpus the bound IS the finding.
    import shutil
    import tempfile

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        INCR_HISTORY_MOD,
        build_dedup_lsh_index_capped,
        probe_dedup_lsh_index_capped,
    )

    is_inc = F.pmod("doc_id", F.lit(INCR_HISTORY_MOD)) == INCR_HISTORY_MOD - 1
    hist_docs, inc_docs = docs.filter(~is_inc), docs.filter(is_inc)
    hb = band_keys(hist_docs).groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("ch")
    )
    ib = band_keys(inc_docs).groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("ci")
    )
    unc_probe_bound = int(
        hb.join(ib, ["band", "key"])
        .agg(F.sum(F.col("ch") * F.col("ci")).alias("b"))
        .collect()[0]["b"]
        or 0
    )
    gate = {"uncapped_probe_bound": unc_probe_bound}
    idx_root = tempfile.mkdtemp(prefix="frdw_skew_lshidx_")
    try:
        t0 = time.perf_counter()
        build_dedup_lsh_index_capped(hist_docs, idx_root)
        gate["capped_build_wall_sec"] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            probe_dedup_lsh_index_capped(
                spark, inc_docs, idx_root
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        gate["capped_probe_wall_sec"] = round(best, 3)
        capped_probe = probe_dedup_lsh_index_capped(spark, inc_docs, idx_root)
        gate["capped_candidates"] = capped_probe.count()
        # planted truth at the gate: every DUP_EVERY-th doc duplicates
        # its predecessor, and (doc_id % 20 == 19) => incoming while
        # (doc_id-1) => history, so ALL planted pairs cross the gate
        planted_inc = (
            docs.filter((F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0))
            .select(
                F.col("doc_id").alias("doc_new"),
                (F.col("doc_id") - 1).alias("doc_hist"),
            )
        )
        gate["planted_pairs"] = planted_inc.count()
        gate["planted_recalled"] = planted_inc.join(
            capped_probe, ["doc_new", "doc_hist"]
        ).count()
        if unc_probe_bound <= PAIR_GATE:
            from flink_realtime_data_warehouse_spark.operators.dedup import (
                dedup_incremental_lsh,
            )

            gate["uncapped_candidates"] = dedup_incremental_lsh(
                spark, sf_dir
            ).count()
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
    out["incremental_gate"] = gate

    # --- source overlap: per-shingle source SETS (≤ |sources| each)
    # explode map-side; a Zipfian source mix widens the sets but the
    # relation stays ≤ shingles × |sources| by construction
    postings = (
        sh.join(docs.select("doc_id", "source"), "doc_id")
        .select("s", "source")
        .distinct()
    )
    out["source_overlap"] = {
        "shingle_source_rows": postings.count(),
        "wall_sec": _timed(dq_source_overlap, spark, sf_dir),
    }
    release_shingle_cache()

    # --- multimodal perceptual blocking under template skew (round 8):
    # 30% of zipf docs share the 16-byte boilerplate SUFFIX, so one
    # suffix block carries 0.3·n members and the uncapped self-join
    # bound goes (0.3n)² — the byte-level analogue of the n-gram df
    # cliff. The block cap must hold the bound flat while the planted
    # dup pairs (which share their PREFIX block, and are
    # boilerplate-free by construction) stay recalled.
    from flink_realtime_data_warehouse_spark.operators.multimodal import (
        PERCEPTUAL_BLOCK_CAP,
        multimodal_perceptual_dups,
        multimodal_perceptual_dups_capped,
        perceptual_blocks,
        perceptual_dedup_pairs,
    )

    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    blocks = perceptual_blocks(media)
    mm_bound = _pairs_bound(blocks, ["bkey"])
    hot_blocks = (
        blocks.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > PERCEPTUAL_BLOCK_CAP)
    )
    capped_blocks = blocks.join(F.broadcast(hot_blocks.select("bkey")), "bkey", "left_anti")
    mm = {
        "uncapped_block_bound": mm_bound,
        "hot_blocks": hot_blocks.count(),
        "capped_block_bound": _pairs_bound(capped_blocks, ["bkey"]),
        "capped_wall_sec": _timed(
            multimodal_perceptual_dups_capped, spark, sf_dir
        ),
    }
    capped_pairs_mm = perceptual_dedup_pairs(
        media, block_cap=PERCEPTUAL_BLOCK_CAP
    )
    mm["capped_pairs"] = capped_pairs_mm.count()
    if mm_bound <= PAIR_GATE:
        mm["uncapped_pairs"] = perceptual_dedup_pairs(media).count()
        mm["uncapped_wall_sec"] = _timed(
            multimodal_perceptual_dups, spark, sf_dir
        )
    # planted truth: every DUP_EVERY-th doc = predecessor + " dup" —
    # same prefix block, suffix shifted by 4 bytes; the capped path
    # must keep finding them through the (cold) prefix block
    planted_mm = (
        docs.filter((F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0))
        .select(
            (F.col("doc_id") - 1).alias("da"), F.col("doc_id").alias("db")
        )
    )
    mm["planted_pairs"] = planted_mm.count()
    mm["planted_recalled"] = planted_mm.join(
        capped_pairs_mm.select("da", "db"), ["da", "db"]
    ).count()
    out["multimodal"] = mm

    # --- semdedup under a dominant cluster: scaled sign bits vs the
    # trained k-means assignment (k grown with n). The dominant cluster
    # defeats FIXED partitioners; k-means splits dense regions by
    # construction, so comparisons/vector should stay flat — the same
    # claim SCALING.json proves on uniform corpora, re-proven on skew
    from flink_realtime_data_warehouse_spark.operators.semdedup import (
        SEMDEDUP_SIGN_DIMS,
        _bucket_col,
        semantic_dedup,
    )

    vec = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n_vec = vec.count()
    mult = max(n_vec // 2000, 1)
    extra_bits = (mult - 1).bit_length() if mult > 1 else 0
    _extra_pool = (d for d in range(2, 65) if d not in SEMDEDUP_SIGN_DIMS)
    scaled_dims = tuple(SEMDEDUP_SIGN_DIMS) + tuple(
        next(_extra_pool) for _ in range(extra_bits)
    )
    cmp_scaled = _pairs_bound(
        vec.select(_bucket_col(scaled_dims).alias("bucket")), ["bucket"]
    )
    from tools.measure_scaling import ivf_comparisons

    sem = {
        "n_vectors": n_vec,
        "comparisons_scaled_bits": cmp_scaled,
        "comparisons_ivf": ivf_comparisons(spark, vec, max(32, n_vec // 64)),
    }
    if cmp_scaled <= PAIR_GATE:
        sem["wall_sec_scaled"] = _timed(
            lambda s, d: semantic_dedup(vec, sign_dims=scaled_dims),
            spark,
            sf_dir,
        )
    out["semdedup"] = sem

    # --- per-entity operators under a power-law user: the hot user's
    # rows land in ONE task (windows are per-user by semantics, no salt
    # can help) — the walls tell whether a 10%-of-corpus entity stalls
    # the stage
    out["per_entity"] = {
        "ts_similarity_wall_sec": _timed(ts.ts_similarity_pairs, spark, sf_dir),
        "export_sequences_wall_sec": _timed(
            export_user_event_sequences, spark, sf_dir
        ),
        "gapfill_interp_wall_sec": _timed(rollup_gapfill_interp, spark, sf_dir),
    }

    # --- streaming end-to-end under the same skew: stateful operators
    # group by user — the hot key concentrates state updates
    import shutil
    import tempfile

    from flink_realtime_data_warehouse_spark.streaming.throughput import (
        run_streaming_throughput,
    )

    stream_root = tempfile.mkdtemp(prefix="frdw_skew_stream_")
    try:
        s = run_streaming_throughput(spark, sf_dir, stream_root)
        out["streaming_rows_per_sec"] = s["streaming_rows_per_sec"]
    finally:
        shutil.rmtree(stream_root, ignore_errors=True)
    return out


def main() -> None:
    from flink_realtime_data_warehouse_spark import get_spark

    dirs = sys.argv[1:]
    assert len(dirs) == 2, "usage: measure_skew.py UNIFORM_DIR ZIPF_DIR"
    spark = get_spark(app_name="frdw-skew")
    spark.sparkContext.setLogLevel("ERROR")
    results = {"uniform": measure_dir(spark, dirs[0])}
    results["zipf"] = measure_dir(spark, dirs[1])
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
