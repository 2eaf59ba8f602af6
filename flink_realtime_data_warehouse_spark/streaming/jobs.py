"""End-to-end streaming topologies — the reference's four entry points
re-expressed on Structured Streaming (SURVEY.md §3).

Every job reads a value-string stream (Kafka or file drop), parses
with the typed schema, and writes lake tables (parquet here; Delta in
production). Kafka sinks are optional add-ons — the lake table is the
system of record (exactly-once per batch).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_realtime_data_warehouse_spark.operators.parse import parse_with_dirty
from flink_realtime_data_warehouse_spark.operators.split import split_log
from flink_realtime_data_warehouse_spark.schemas import BEHAVIOR_LOG_SCHEMA, TOPIC_DB_SCHEMA
from flink_realtime_data_warehouse_spark.streaming.state import (
    correct_is_new,
    daily_unique_visitors,
    detect_bounces,
)
from flink_realtime_data_warehouse_spark.streaming.table_format import (
    FORMAT,
    atomic_write_text,
)


def base_log_job(
    spark: SparkSession,
    raw_stream: DataFrame,
    out_root: str,
    checkpoint_root: str,
    available_now: bool = True,
):
    """BaseLogApp (reference BaseLogApp.java:22-187): parse with dirty
    side-channel → ST1 is_new correction → five-way split → five tables.

    The split runs over the ST1-*corrected* stream (reference order:
    fixNewFlag at :64-96 precedes the OutputTag split at :98-162), so
    page/start/display/action/err records carry the corrected is_new.
    The full record rides through the state op as a serialized payload
    column — exactly the reference's keyed process function carrying the
    whole JSONObject — then is re-typed and split inside one
    foreachBatch (one source pass; the five outputs are filters over a
    single cached batch).

    Each split write is idempotent per micro-batch: outputs are
    partitioned by ``_batch_id`` and dynamically overwrite only that
    partition, so a retried batch replaces its own files instead of
    appending duplicates.
    """
    clean, dirty = parse_with_dirty(raw_stream, BEHAVIOR_LOG_SCHEMA)

    payload_schema = StructType(
        [f for f in BEHAVIOR_LOG_SCHEMA.fields if f.name != "ts"]
    )
    flat = clean.select(
        F.col("common.mid").alias("mid"),
        F.col("common.is_new").alias("is_new"),
        F.col("page.page_id").alias("page_id"),
        F.col("page.last_page_id").alias("last_page_id"),
        F.col("ts"),
        F.to_json(F.struct("common", "page", "start", "err", "display", "actions")).alias(
            "payload_json"
        ),
    )
    corrected = correct_is_new(flat)

    def _write_splits(batch: DataFrame, batch_id: int) -> None:
        # materialize the corrected batch once: every write below reads
        # the cache instead of re-running the stateful plan
        batch.persist()
        if batch.isEmpty():
            batch.unpersist()
            return
        # corrected flat log (same idempotent per-batch overwrite)
        FORMAT.overwrite_partitions(
            batch.drop("payload_json").withColumn("_batch_id", F.lit(batch_id)),
            os.path.join(out_root, "dwd_traffic_corrected_log"),
            "_batch_id",
        )
        restored = batch.withColumn(
            "payload", F.from_json("payload_json", payload_schema)
        ).select(
            # stamp the corrected flag back into the typed record
            F.col("payload.common").withField("is_new", F.col("is_new")).alias("common"),
            F.col("payload.page").alias("page"),
            F.col("payload.start").alias("start"),
            F.col("payload.err").alias("err"),
            F.col("payload.display").alias("display"),
            F.col("payload.actions").alias("actions"),
            F.col("ts"),
        )
        restored.persist()
        try:
            streams = split_log(restored)
            for name, df in streams.items():
                if df.isEmpty():
                    # an empty dynamic-overwrite write would leave a
                    # schemaless directory; nothing to replace either way
                    continue
                FORMAT.overwrite_partitions(
                    df.withColumn("_batch_id", F.lit(batch_id)),
                    os.path.join(out_root, f"dwd_traffic_{name}_log"),
                    "_batch_id",
                )
        finally:
            restored.unpersist()
            batch.unpersist()

    queries = []
    # ONE streaming query drives the state machine once per batch and
    # writes corrected log + all five splits from it (the reference is
    # likewise a single job; a second query would run a second copy of
    # the ST1 state store over a second source read)
    q1 = (
        corrected.writeStream.foreachBatch(_write_splits)
        .option("checkpointLocation", os.path.join(checkpoint_root, "split"))
        .trigger(availableNow=available_now)
        .start()
    )
    queries.append(q1)
    q3 = (
        dirty.writeStream.format("parquet")
        .option("path", os.path.join(out_root, "dirty_log"))
        .option("checkpointLocation", os.path.join(checkpoint_root, "dirty"))
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )
    queries.append(q3)
    return queries


def unique_visitor_job(
    spark: SparkSession,
    raw_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """DwdTrafficUniqueVisitorDetail (reference :19-88): entry pages →
    ST2 per-day dedup → table."""
    clean, _ = parse_with_dirty(raw_stream, BEHAVIOR_LOG_SCHEMA)
    entries = clean.filter(F.col("page").isNotNull() & F.col("page.last_page_id").isNull())
    flat = entries.select(
        F.col("common.mid").alias("mid"),
        F.col("common.is_new").alias("is_new"),
        F.col("page.page_id").alias("page_id"),
        F.col("page.last_page_id").alias("last_page_id"),
        F.col("ts"),
    )
    uv = daily_unique_visitors(flat)
    return (
        uv.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def user_jump_job(
    spark: SparkSession,
    raw_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """DwdTrafficUserJumpDetail (reference :29-144): watermark (ST3) →
    ST4 CEP bounce state machine → table."""
    clean, _ = parse_with_dirty(raw_stream, BEHAVIOR_LOG_SCHEMA)
    paged = clean.filter(F.col("page").isNotNull()).select(
        F.col("common.mid").alias("mid"),
        F.col("page.page_id").alias("page_id"),
        F.col("page.last_page_id").alias("last_page_id"),
        F.col("ts"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    # reference uses a monotonous (0-delay) watermark, DwdTrafficUserJumpDetail.java:71-82
    watermarked = paged.withWatermark("event_time", "0 seconds")
    bounces = detect_bounces(watermarked)
    return (
        bounces.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def parse_changelog_stream(raw_stream: DataFrame) -> DataFrame:
    """ODS topic_db → typed changelog stream (DimApp step 3)."""
    clean, _ = parse_with_dirty(raw_stream, TOPIC_DB_SCHEMA)
    return clean


def unique_visitor_job_idiomatic(
    spark: SparkSession,
    raw_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    watermark: str = "1 day",
    available_now: bool = True,
):
    """ST2 idiomatic variant: watermark + dropDuplicatesWithinWatermark
    on (mid, dt).

    Same output as the exact state-machine form under in-order input.
    ``dropDuplicatesWithinWatermark`` ties dedup-state eviction to the
    event-time watermark even though (mid, dt) itself carries no
    event-time column — a (mid, dt) entry is dropped once the watermark
    passes its event time + delay, so state really is bounded (a plain
    ``dropDuplicates`` on non-event-time keys would grow forever).
    The reference keeps per-mid state with no TTL (SURVEY.md §7.3);
    this is the shape to run at 100 TB/day.
    """
    from flink_realtime_data_warehouse_spark.functions.timeutil import to_date_str

    clean, _ = parse_with_dirty(raw_stream, BEHAVIOR_LOG_SCHEMA)
    entries = clean.filter(F.col("page").isNotNull() & F.col("page.last_page_id").isNull())
    flat = entries.select(
        F.col("common.mid").alias("mid"),
        F.col("common.is_new").alias("is_new"),
        F.col("page.page_id").alias("page_id"),
        F.col("ts"),
        to_date_str(F.col("ts")).alias("dt"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    uv = flat.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["mid", "dt"]
    )
    return (
        uv.drop("event_time")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup of a document stream: first arrival of each
    content digest passes, replays within the watermark horizon drop.

    The streaming face of the batch ``dedup_exact`` operator: the dedup
    key is the md5 digest (16 bytes of state per unique document, the
    text itself never enters the state store), and
    ``dropDuplicatesWithinWatermark`` ties state eviction to event time
    so an unbounded ingest stream holds bounded state — the 100 TB/day
    ingest-dedup shape.
    """
    return (
        docs.withColumn("_digest", F.md5(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def stream_stream_conversion_job(
    spark: SparkSession,
    raw_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    window_seconds: int = 3600,
    available_now: bool = True,
):
    """Stream-stream interval join: page views joined to later 'cart'
    actions of the same device within the window (DWS conversion feed).
    """
    from flink_realtime_data_warehouse_spark.streaming.joins import interval_join_streams

    clean, _ = parse_with_dirty(raw_stream, BEHAVIOR_LOG_SCHEMA)
    pages = clean.filter(F.col("page").isNotNull()).select(
        F.col("common.mid").alias("mid"),
        F.col("page.page_id").alias("page_id"),
        F.col("ts").alias("view_ts"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    actions = (
        clean.filter(F.col("actions").isNotNull())
        .select(
            F.col("common.mid").alias("mid"),
            F.explode("actions").alias("action"),
            F.col("ts").alias("action_ts"),
            F.timestamp_millis(F.col("ts")).alias("r_event_time"),
        )
        .filter(F.col("action.action_id") == "cart")
    )
    joined = interval_join_streams(
        pages, actions, key="mid", window_seconds=window_seconds
    ).select(
        F.col("l_mid").alias("mid"),
        "page_id",
        "view_ts",
        F.col("action.item").alias("cart_item"),
        "action_ts",
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def start_streaming_decontam(
    spark: SparkSession,
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    clean_path: str,
    quarantine_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Ingest-time benchmark-contamination gate on a document stream.

    The streaming face of ``operators/decontam.py``: every micro-batch
    is scored against the (bounded, cached) eval corpus — clean docs
    land in the training sink, contaminated docs in a quarantine sink
    with their overlap evidence attached. Both sinks are written under
    a ``pbatch=<batch_id>`` partition with dynamic partition overwrite,
    so a replayed micro-batch overwrites its own partition instead of
    duplicating — the same replay-idempotent layout as
    ``streaming/rollup.py``.

    At 100 TB/day the per-batch cost is one broadcast join against the
    eval gram hashes plus one keyed aggregate over the batch — nothing
    scales with corpus history.
    """
    from flink_realtime_data_warehouse_spark.operators.decontam import (
        decontaminate,
        eval_gram_hashes,
    )

    # cache the DERIVED gram hashes, not the raw docs: the explode +
    # md5 + distinct would otherwise re-run on every micro-batch
    grams_cached = eval_gram_hashes(eval_docs).cache()
    grams_cached.count()  # materialize once; benchmark sets are O(MB)

    def _process(batch: DataFrame, batch_id: int) -> None:
        # duplicate doc_ids inside one micro-batch would fan out
        # quadratically through the verdict join and write duplicated
        # rows to both sinks (ADVICE r3) — keep one row per doc_id, the
        # same contract streaming_exact_dedup gives the ingest pipeline
        batch = batch.dropDuplicates(["doc_id"])
        verdicts = decontaminate(batch, eval_grams=grams_cached).select(
            "doc_id", "n_hits", "overlap_frac", "contaminated"
        )
        joined = batch.join(verdicts, "doc_id", "left")
        flagged = F.coalesce(F.col("contaminated"), F.lit(0)) == 1

        def _sink(df: DataFrame, path: str) -> None:
            FORMAT.overwrite_partitions(
                df.withColumn("pbatch", F.lit(batch_id).cast("bigint")),
                path,
                "pbatch",
            )

        _sink(
            joined.filter(~flagged).drop("n_hits", "overlap_frac", "contaminated"),
            clean_path,
        )
        _sink(joined.filter(flagged), quarantine_path)

    q = (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    q._frdw_caches = [grams_cached]
    return q


def release_job_caches(query) -> None:
    """Unpersist DataFrames a ``start_*`` job cached for its lifetime.

    The gate jobs cache the derived eval-gram hashes once per start;
    without an explicit release, repeatedly starting/stopping gates in
    one long-lived session accumulates cached DataFrames in executor
    memory (ADVICE r3). The caller owns the query lifecycle, so it owns
    the cache lifecycle too: call this after ``awaitTermination()`` /
    ``stop()``. No-op for queries that cached nothing.
    """
    for df in getattr(query, "_frdw_caches", []):
        df.unpersist()


def start_training_ingest_pipeline(
    spark: SparkSession,
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    out_root: str,
    checkpoint: str,
    quality_threshold: int = 5000,
    available_now: bool = True,
):
    """End-to-end training-data ingest: the full curation chain as ONE
    streaming job.

        raw docs → exact dedup (watermark-bounded digest state)
                 → benchmark-contamination gate (broadcast eval grams)
                 → quality filter (integer-quantized linear scorer)
                 → ``{out_root}/clean`` ; rejects land in
                   ``{out_root}/quarantine`` / ``{out_root}/low_quality``

    Composes the independently-oracle-checked operators
    (``streaming_exact_dedup``, ``operators/decontam.decontaminate``,
    the ``text_quality_classifier`` scorer) without re-implementing any
    of them — the per-batch work is one broadcast join + two map-only
    passes + one keyed agg over the batch. Sinks use the same
    ``pbatch`` dynamic-partition overwrite as the decontam gate, so
    replays are idempotent.
    """
    from flink_realtime_data_warehouse_spark.operators.decontam import (
        decontaminate,
        eval_gram_hashes,
    )
    from flink_realtime_data_warehouse_spark.operators.textops import (
        quality_score_sql,
    )

    grams_cached = eval_gram_hashes(eval_docs).cache()
    grams_cached.count()

    deduped = streaming_exact_dedup(doc_stream)

    # the oracle-checked classifier's scoring snippet, imported — not
    # re-derived — so the gate can never drift from the batch query
    score_e4 = quality_score_sql()

    def _process(batch: DataFrame, batch_id: int) -> None:
        verdicts = decontaminate(batch, eval_grams=grams_cached).select(
            "doc_id", "contaminated"
        )
        scored = (
            batch.join(verdicts, "doc_id", "left")
            .withColumn("quality_e4", F.expr(score_e4))
        )
        flagged = F.coalesce(F.col("contaminated"), F.lit(0)) == 1
        low_q = F.coalesce(F.col("quality_e4"), F.lit(0)) < quality_threshold

        def _sink(df: DataFrame, name: str) -> None:
            FORMAT.overwrite_partitions(
                df.withColumn("pbatch", F.lit(batch_id).cast("bigint")),
                f"{out_root}/{name}",
                "pbatch",
            )

        _sink(scored.filter(flagged), "quarantine")
        _sink(scored.filter(~flagged & low_q), "low_quality")
        _sink(
            scored.filter(~flagged & ~low_q).drop("contaminated"), "clean"
        )

    q = (
        deduped.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    q._frdw_caches = [grams_cached]
    return q


def _incarnation_id(checkpoint: str) -> str:
    """Stable incarnation id for a checkpoint location. Identity must
    follow the checkpoint DIRECTORY, not its spelling: hashing the
    literal string (the r4 approach) made a trailing slash, a relative
    vs absolute path, or a symlink a "new incarnation", so a redelivered
    batch could write a duplicate digest partition instead of
    overwriting its own first attempt (r4 ADVICE). The id is minted
    once, persisted INSIDE the checkpoint directory, and re-read by any
    later spelling that resolves to the same directory.

    The cold-start mint is a random uuid, NOT a hash of the path: a
    path-derived seed would resurrect the previous incarnation's id
    after ``rm -rf <checkpoint>`` at the same path, letting the new
    job's batch 0 dynamic-overwrite the old incarnation's
    ``pbatch=<rid>-0`` digest partition AND exclude it from history
    during classification — silently re-admitting already-ingested
    documents. The marker is published atomically (write-to-temp +
    exclusive ``os.link``), so a concurrent second starter or a crash
    mid-mint can never observe a partial/empty id: the link only
    appears after the temp file is fully written and fsynced."""
    import os
    import uuid

    path = checkpoint
    if path.startswith("file:"):
        path = path[len("file:"):]
    path = os.path.realpath(os.path.abspath(path))
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, "frdw_run_id")
    if not os.path.exists(marker):
        rid = uuid.uuid4().hex[:12]
        tmp = f"{marker}.tmp.{os.getpid()}.{rid}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(rid)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, marker)  # atomic publish; loser keeps the winner's id
        except FileExistsError:
            pass
        except OSError:
            # filesystem without hard links (vfat/SMB/object-store
            # gateways): fall back to same-directory rename — still
            # never exposes a partial file; a concurrent-mint race
            # degrades to last-writer-wins, which both writers then
            # re-read, so they still agree on one id
            if not os.path.exists(marker):
                os.replace(tmp, marker)
                tmp = None
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.unlink(tmp)
    with open(marker, encoding="utf-8") as f:
        return f.read().strip()


def compact_ann_ivf_deltas(
    spark: SparkSession, index_root: str, exclude_pbatch: str | None = None
) -> None:
    """Fold the streaming IVF index's delta tail into its cell
    partitions (the LSM shape: appends land in the pbatch-partitioned
    ``_deltas`` store, probes read main + tail, compaction merges):
    main cells ∪ folded delta rows, deduplicated by vec_id (makes the
    fold idempotent AND absorbs the crash window where a folded delta
    partition was not cleared yet), rewritten partitioned by cell and
    rename-swapped as the ``cells`` dir — quantizer artifacts and the
    delta store live BESIDE it and survive the swap. ``exclude_pbatch``
    (the in-flight batch) keeps its delta partition so its replay
    stays idempotent. At lake scale the merge would rewrite only the
    cells the tail actually touches; the whole-store rewrite here
    keeps the crash story one rename-swap."""
    import os

    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _invalidate_index_df,
    )
    from flink_realtime_data_warehouse_spark.streaming.table_format import (
        FORMAT,
    )

    cells = os.path.join(index_root, "cells")
    deltas = os.path.join(index_root, "_deltas")
    FORMAT.repair(index_root, cells)
    FORMAT.repair(index_root, deltas)
    if not FORMAT.exists(deltas) or not FORMAT.exists(cells):
        return
    d = FORMAT.read(
        spark, deltas, "cell int, vec_id bigint, v array<float>, pbatch string"
    )
    keep = (
        d.filter(F.col("pbatch") == exclude_pbatch)
        if exclude_pbatch is not None
        else d.limit(0)
    )
    fold = (
        d.filter(~F.col("pbatch").eqNullSafe(exclude_pbatch))
        if exclude_pbatch is not None
        else d
    )
    if fold.limit(1).count() == 0:
        return  # nothing to fold — leave both stores untouched
    main = FORMAT.read(
        spark, cells, "cell int, vec_id bigint, v array<float>"
    ).select("cell", "vec_id", "v")
    merged = (
        main.unionByName(fold.select("cell", "vec_id", "v"))
        .dropDuplicates(["vec_id"])
    )
    from flink_realtime_data_warehouse_spark.fanout import fanout

    # fanout instead of bare repartition("cell"): AQE's byte-based
    # coalescing could fold the rewrite onto one writer task (r11 opt)
    FORMAT.swap_rewrite(spark, cells, fanout(merged, "cell"), "cell")
    # now shrink the delta store to the kept (in-flight) partition; a
    # crash between the two swaps leaves folded rows in BOTH stores —
    # the probe's vec_id dedup keeps answers correct and the next fold
    # re-converges
    FORMAT.swap_rewrite(spark, deltas, keep, "pbatch")
    _invalidate_index_df(spark, cells)


def start_embedding_ingest(
    spark: SparkSession,
    emb_stream: DataFrame,
    index_root: str,
    checkpoint: str,
    available_now: bool = True,
    compact_every: int | None = None,
    n_list: int | None = None,
):
    """Continuous VECTOR ingest maintaining a probe-ready two-level IVF
    index — the streaming face of ``build/append_ann_ivf_index`` (an
    embedding lake the similarity family can query while it grows).

    The first non-empty micro-batch cold-builds the hierarchical index
    (deterministic: seed-pinned Lloyd — a replayed build re-derives
    byte-identical centroids); its vector files are moved under the
    swappable ``{index_root}/cells`` dir and the quantizer artifacts
    (``_centroids.json``, ``_subcentroids``, ``_meta.json``) stay
    beside it, then a ``_built_pbatch`` marker commits the build.
    Every later batch assigns against the PERSISTED quantizer
    (``ivf_assign_delta`` — no k-sized broadcast, no re-clustering)
    and lands its rows in ``{index_root}/_deltas`` under a
    ``pbatch=<run_id>-<batch_id>`` dynamic-overwrite partition: a
    redelivered batch overwrites its own partition with identical
    rows, never double-appends (the reason this path exists instead of
    ``append_ann_ivf_vectors``'s raw file append).

    ``ann_ivf_probe`` reads main cells + the delta tail transparently
    (vec_id-deduplicated); ``compact_every=N`` folds the tail into the
    cell partitions every N batches (``compact_ann_ivf_deltas``),
    excluding the in-flight batch. Crash windows: mid-build → marker
    absent → deterministic rebuild; after build before checkpoint
    commit → the builder batch's replay sees its own marker and skips
    (its contribution IS the index); mid-compaction-swap →
    ``_repair_swap_dir`` (run by every reader and mutator) rolls back;
    between compaction's two swaps → folded rows exist in both stores
    until the probe dedup / next fold absorbs them. Quantizer drift
    under distribution shift is the standard IVF trade: retrain
    offline and rebuild, exactly like any IVF deployment.
    """
    import shutil

    from flink_realtime_data_warehouse_spark.operators.similarity import (
        IVF_NLIST,
        _invalidate_index_df,
        build_ann_ivf_index,
        ivf_assign_delta,
    )
    from flink_realtime_data_warehouse_spark.streaming.table_format import (
        FORMAT,
    )

    nl = n_list if n_list is not None else IVF_NLIST
    cells = os.path.join(index_root, "cells")
    deltas = os.path.join(index_root, "_deltas")
    marker = os.path.join(index_root, "_built_pbatch")
    run_id = _incarnation_id(checkpoint)

    def _process(batch: DataFrame, batch_id: int) -> None:
        pbatch = f"{run_id}-{batch_id}"
        vecs = batch.select("vec_id", "v").dropDuplicates(["vec_id"])
        FORMAT.repair(index_root, cells)
        FORMAT.repair(index_root, deltas)
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                built_by = f.read().strip()
            if built_by == pbatch:
                return  # replay of the builder batch: the index IS its sink
            delta = ivf_assign_delta(spark, vecs, index_root)
            FORMAT.overwrite_partitions(
                delta.withColumn("pbatch", F.lit(pbatch)), deltas, "pbatch"
            )
        else:
            if vecs.limit(1).count() == 0:
                return  # nothing to build yet — wait for vectors
            # r12 opt (guide §5 caching): the cold build traverses the
            # batch four times (seed collect + one scan per Lloyd
            # iteration + the level-1 assignment), and each traversal
            # re-parsed the JSON source and re-ran the dropDuplicates
            # shuffle. Persist the deduplicated batch for the build's
            # lifetime so those passes scan the cache instead.
            from pyspark import StorageLevel

            vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
            # clear a half-built attempt, then deterministic rebuild
            os.makedirs(index_root, exist_ok=True)
            for stale in ("cells", "_subcentroids", "_centroids.json",
                          "_meta.json"):
                p = os.path.join(index_root, stale)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                elif os.path.exists(p):
                    os.remove(p)
            staging = os.path.join(index_root, "__build_staging")
            shutil.rmtree(staging, ignore_errors=True)
            try:
                build_ann_ivf_index(
                    spark, vecs, staging, n_list=nl, two_level=True
                )
            finally:
                vecs.unpersist()
            # publish through the seam (r10 verdict item 2): each
            # quantizer artifact moves into place with
            # publish_staged_artifact, then the remaining staged tree —
            # exactly the cell= partitions — commits as the cells
            # store in one seam swap. The multi-artifact publish is
            # NOT atomic as a set, and doesn't need to be: a kill
            # anywhere before the marker write below leaves no
            # _built_pbatch marker, so the next batch clears every
            # artifact and re-derives a byte-identical build
            # (deterministic rebuild — the right recovery here).
            for art in ("_centroids.json", "_subcentroids", "_meta.json"):
                src = os.path.join(staging, art)
                if os.path.exists(src):
                    FORMAT.publish_staged_artifact(
                        os.path.join(index_root, art), src
                    )
            FORMAT.commit_swap(cells, staging)
            _invalidate_index_df(spark, staging)
            atomic_write_text(marker, pbatch)
        _invalidate_index_df(spark, cells)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_ann_ivf_deltas(spark, index_root, exclude_pbatch=pbatch)

    return (
        emb_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )


def compact_history_digest_store(
    spark: SparkSession, out_root: str, exclude_pbatch: str | None = None
) -> None:
    """Fold the history-dedup digest store's per-batch ``pbatch=``
    partitions onto the ``COMPACTED_PBATCH`` sentinel partition: one
    consolidated file set instead of one per micro-batch, so the
    per-batch classify join lists O(1) file sets instead of one per
    batch ever ingested (content hashes are unique across partitions
    by construction — only digest-``new`` rows append — and the
    ``distinct()`` makes re-compaction idempotent). ``exclude_pbatch``
    (the in-flight batch) stays un-folded so a batch redelivered after
    a post-compaction crash still excludes exactly its own prior
    digests. Crash-safe via the shared rename-swap +
    ``_repair_swap_dir`` sweep, which the ingest's digest reads also
    run before their existence probes."""
    import os

    from flink_realtime_data_warehouse_spark.operators.dedup import (
        COMPACTED_PBATCH,
    )
    from flink_realtime_data_warehouse_spark.streaming.table_format import (
        FORMAT,
    )

    store = os.path.join(out_root, "digests")
    FORMAT.repair(out_root, store)
    if not FORMAT.exists(store):
        return
    src = FORMAT.read(spark, store, "content_hash string, pbatch string")
    keep = (
        src.filter(F.col("pbatch") == exclude_pbatch)
        if exclude_pbatch is not None
        else src.limit(0)
    )
    fold = (
        src.filter(~F.col("pbatch").eqNullSafe(exclude_pbatch))
        if exclude_pbatch is not None
        else src
    )
    folded = (
        fold.select("content_hash")
        .distinct()
        .withColumn("pbatch", F.lit(COMPACTED_PBATCH))
    )
    tmp = FORMAT.stage_path(store)
    folded.unionByName(keep).write.mode("overwrite").partitionBy(
        "pbatch"
    ).parquet(tmp)
    # bloom watermark maintenance (r9, ADVICE): the fold renames
    # partitions the filter's coverage sidecar tracks by name. When
    # every folded partition was covered, the fold provably adds no
    # keys — carry coverage over to the sentinel; when ANY folded
    # partition was uncovered (flag-off ingest), wipe the sidecar so
    # the next bloom batch rebuilds instead of probing a subset filter
    # (false negatives). Written BEFORE the store swap: a crash
    # between costs at most one spurious rebuild, never a subset probe.
    bloom_path = os.path.join(out_root, "bloom")
    side_text = FORMAT.read_sidecar(bloom_path, "_covered.json")
    if side_text is not None:
        try:
            covered = set(json.loads(side_text))
        except ValueError:
            covered = set()
        folded_parts = set(FORMAT.list_partitions(store, "pbatch")) - (
            {exclude_pbatch} if exclude_pbatch is not None else set()
        )
        if folded_parts <= covered:
            new_covered = (covered - folded_parts) | {COMPACTED_PBATCH}
        else:
            new_covered = set()
        FORMAT.write_sidecar(
            bloom_path, "_covered.json", json.dumps(sorted(new_covered))
        )
    FORMAT.commit_swap(store, tmp)


def start_history_dedup_ingest(
    spark: SparkSession,
    doc_stream: DataFrame,
    out_root: str,
    checkpoint: str,
    available_now: bool = True,
    near_dup_gate: bool = False,
    compact_every: int | None = None,
    respect_tombstones: bool = False,
    bloom_prefilter: bool = False,
    redact_pii: bool = False,
):
    """Continuous ingest with GLOBAL dedup against everything ever
    ingested — the streaming face of
    ``operators/dedup.py::incremental_dedup``.

    ``redact_pii=True`` scrubs the STORED payload with the shared
    redaction expression (operators/pii.py::redact_text — email/IPv4/
    phone spans → typed placeholders) so no PII ever lands in the
    lake, while classification stays on the ORIGINAL bytes: digests,
    the Bloom probe, and the near-dup gate's shingles all see
    pre-redaction content, so a re-crawl of the raw document still
    classifies ``dup_history`` even though the lake never stored its
    raw form (pinned in tests/test_pii.py). Registry row
    ``lake_pii_scrubbed_ingest`` states the composed election +
    redaction semantics under one oracle.

    Each micro-batch is classified against a persistent digest store:

        new docs        → ``{out_root}/clean``  (payload rows)
        duplicate docs  → ``{out_root}/dups``   (doc_id + status evidence)
        new digests     → ``{out_root}/digests`` (16 bytes/doc history)

    Unlike ``streaming_exact_dedup`` (whose watermark bounds the dedup
    horizon), the digest store remembers forever: a doc that arrived
    last month still blocks today's copy. State lives in the lake, not
    the state store — the history side is a parquet digest table a
    compaction job can bucket by ``content_hash``
    (operators/scale.py::write_bucketed) so the per-batch classify join
    runs shuffle-free on the history side at 100 TB.

    Replay idempotency: every sink (including the digest store) writes
    under a ``pbatch=<run_id>-<batch_id>`` dynamic-overwrite partition,
    where ``run_id`` is minted once per checkpoint DIRECTORY and
    persisted inside it (``_incarnation_id`` — spelling-independent, so
    ``/ckpt`` vs ``/ckpt/`` vs a symlink resolve to one incarnation)
    — so a batch redelivered after a mid-batch crash (same checkpoint,
    same batch_id) lands on its own partition and re-derives identical
    verdicts, because the classify step reads the store EXCLUDING the
    current partition (pinned by
    test_streaming_history_dedup.py::test_replay_idempotent_same_checkpoint).
    A NEW job incarnation (fresh checkpoint) gets a fresh run_id: its
    batch 0 can never collide with — and silently dynamic-overwrite —
    a prior incarnation's ``pbatch=0`` history, and its documents
    classify against everything every earlier incarnation ingested
    (the "remembers forever" contract; re-submitting the same corpus
    under a new checkpoint therefore routes it to ``dups``, not to a
    second copy in ``clean``).

    The digest-store read fails LOUDLY on storage errors: only the
    does-not-exist-yet cold start yields an empty history (an explicit
    filesystem existence probe, not a broad except — a transient read
    fault must fail the batch and let the checkpoint retry it, never
    classify known duplicates as new).

    ``near_dup_gate=True`` additionally routes every digest-``new``
    document through the df-CAPPED persisted LSH gate (the round-6
    skew defense composed into ingest, where boilerplate actually
    arrives): beside the digest store the job maintains

        ``{out_root}/lsh/bands`` — capped band rows of ingested docs
        ``{out_root}/lsh/df``    — per-batch shingle df deltas (the
                                   accumulated document-frequency
                                   relation the cap is computed from)
        ``{out_root}/near_dups`` — (doc_id, doc_hist) candidate
                                   evidence per batch

    Each batch's band rows are capped against the ACCUMULATED df
    (stored deltas + the batch's own contribution — so a shingle that
    crosses the cap mid-stream stops banding from that batch on, and a
    batch-internal boilerplate flood caps itself). Candidates are
    evidence, not removal: near-dup docs still land in ``clean`` and
    the index, and downstream curation cuts on the evidence — the
    same policy split as the batch pair queries. All three new sinks
    use the identical ``pbatch`` dynamic-overwrite + excluded-on-read
    discipline as the digest store, so a redelivered batch re-derives
    identical bands, deltas, and candidates.

    ``compact_every=N`` folds the job's append-only stores every N
    batches onto the ``COMPACTED_PBATCH`` sentinel partition: the
    digest store to one consolidated file set
    (``compact_history_digest_store`` — the classify join then lists
    O(1) file sets instead of one per batch ever ingested) and, with
    the gate on, the two LSH stores
    (``compact_dedup_lsh_index_capped``: df to one row per shingle,
    bands to one file set) — EXCEPT the current batch's partition,
    which stays un-folded so a batch redelivered after a
    post-compaction crash still excludes exactly its own prior
    contribution (replay stays idempotent across the compaction
    boundary). Compaction is crash-safe via the shared rename-swap +
    ``_repair_swap_dir`` sweep, which the store reads below run before
    every existence probe.

    ``bloom_prefilter=True`` keeps a partitioned Bloom filter
    (``{out_root}/bloom``, one ~10-bits/key bit-array row per hash
    partition — operators/dedup.py::build_bloom_membership) beside the
    digest store and probes each batch against it BEFORE the exact
    classify: digests the filter rules out are definitively new, so a
    batch with zero "maybe" rows never reads the digest store at all —
    the common all-new crawl batch skips the scan of the entire
    history. "Maybe" rows route through the IDENTICAL exact join
    (false positives cost a lookup, never a wrong status), and both
    slices share the same classification core
    (``incremental_dedup_digests`` — a digest's copies always land in
    one slice, so the first-copy election is unchanged). The invariant
    that makes skipping sound — the filter is a SUPERSET of the digest
    store — is held by WRITE ORDER: the filter is OR-updated (or
    rebuilt with headroom when a partition's slack is spent) and
    atomically swapped BEFORE the batch's digest partition lands, so a
    crash between the two writes only ever leaves extra bits (false
    positives), never missing ones (false negatives). Replays re-OR
    the same bits idempotently. A takedown that REMOVES digests
    (block_reingest=False) leaves stale filter bits — again FP-only:
    the exact join decides, so purged content re-ingests as new.

    ``respect_tombstones=True`` makes erasure win over checkpoint
    redelivery: every batch anti-joins the lake's ``_tombstones`` log
    (written by streaming/retention.py::takedown_documents) before its
    doc-keyed sinks, so a batch replayed AFTER a takedown cannot
    resurrect a purged document's payload, band rows, or evidence —
    the digest sink stays UNfiltered so the purged content remains
    blocked from re-ingestion (the block_reingest=True posture). The
    cost is one broadcast anti-join per batch against a
    takedown-request-sized id set. With the flag off, the documented
    quiescence contract applies instead: re-run
    ``reapply_tombstones`` after recovery.
    """
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _BLOOM_SCHEMA,
        BLOOM_BITS_PER_KEY,
        BLOOM_PARTS,
        NGRAM_DF_CAP,
        _bands_from_shingles,
        _capped_batch_shingles,
        _exploded_shingle_hashes,
        build_bloom_membership,
        compact_dedup_lsh_index_capped,
        incremental_dedup_digests,
        or_bloom_membership,
        probe_bloom_membership,
    )
    from flink_realtime_data_warehouse_spark.streaming.table_format import (
        FORMAT,
    )

    digests_path = f"{out_root}/digests"
    lsh_df_path = f"{out_root}/lsh/df"
    lsh_bands_path = f"{out_root}/lsh/bands"
    bloom_path = f"{out_root}/bloom"
    #: rebuild-with-slack factor: OR-updates consume the headroom, then
    #: one rebuild re-sizes — amortized O(1) rebuild work per key
    bloom_headroom = 4
    run_id = _incarnation_id(checkpoint)

    def _store_exists(p: str) -> bool:
        # "exists" is backend-defined: a directory for the parquet
        # store, a committed manifest for the log store (the dir alone
        # can predate the first commit by one crash)
        return FORMAT.exists(p)

    def _digest_store_exists() -> bool:
        # roll back a digest compaction crashed mid-swap BEFORE the
        # existence probe — a store renamed away between the two swap
        # renames must restore, never read as an empty cold start
        # (an empty history would classify known duplicates as new)
        FORMAT.repair(out_root, digests_path)
        return _store_exists(digests_path)

    def _digest_parts() -> set[str]:
        """pbatch partition names currently in the digest store
        (including the ``__compacted__`` fold sentinel — a fold of
        uncovered partitions must read as uncovered)."""
        return set(FORMAT.list_partitions(digests_path, "pbatch"))

    def _bloom_covered() -> set[str]:
        """Digest partitions the current filter provably covers — the
        watermark written atomically with every filter swap. A legacy
        store without the sidecar reports empty coverage, forcing one
        rebuild (the safe migration)."""
        text = FORMAT.read_sidecar(bloom_path, "_covered.json")
        if text is None:
            return set()
        try:
            return set(json.loads(text))
        except ValueError:
            return set()

    def _swap_write_bloom(rows: DataFrame, covered: set[str]) -> None:
        """Atomically replace the bloom store (rename-swap; the
        ``_repair_swap_dir`` sweep every reader runs rolls back a
        mid-swap crash). ``covered`` — the digest partitions this
        filter accounts for — lands as a ``_covered.json`` sidecar
        INSIDE the swapped dir (Spark ignores ``_``-files), so filter
        bits and watermark can never be observed out of sync."""
        tmp = FORMAT.stage_path(bloom_path)
        rows.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_covered.json"), "w") as f:
            json.dump(sorted(covered), f)
        FORMAT.commit_swap(bloom_path, tmp)

    def _update_bloom(new_digests: DataFrame, pbatch: str) -> None:
        """Fold the batch's new digests into the filter BEFORE the
        digest partition lands (the superset-by-write-order invariant).
        OR-update while every touched partition has sizing slack;
        rebuild from the digest store + this batch with fresh headroom
        the moment one would overflow (amortized O(1) work per key —
        partitions are md5-balanced, so they fill together)."""
        new_digests = new_digests.filter(
            F.col("content_hash").isNotNull()
        ).distinct()
        new_counts = {
            r["pkey"]: r["c"]
            for r in new_digests.groupBy(
                F.pmod(F.xxhash64("content_hash"), F.lit(BLOOM_PARTS))
                .cast("int")
                .alias("pkey")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        if not new_counts and _store_exists(bloom_path):
            return  # nothing new; the store is already current
        meta = {}
        if _store_exists(bloom_path):
            meta = {
                r["pkey"]: (int(r["n_keys"]), int(r["m_bits"]))
                for r in FORMAT.read(spark, bloom_path, _BLOOM_SCHEMA)
                .select("pkey", "n_keys", "m_bits")
                .collect()
            }
        overflow = not meta
        for pk, c in new_counts.items():
            n0, m = meta.get(pk, (0, 64))
            if (n0 + c) * BLOOM_BITS_PER_KEY > m:
                overflow = True
        if overflow:
            hist = (
                FORMAT.read(
                    spark, digests_path, "content_hash string, pbatch string"
                )
                .filter(~F.col("pbatch").eqNullSafe(pbatch))
                .select("content_hash")
                if _digest_store_exists()
                else spark.createDataFrame([], "content_hash string")
            )
            rows = build_bloom_membership(
                hist.unionByName(new_digests).distinct(),
                headroom=bloom_headroom,
            )
        else:
            rows = or_bloom_membership(
                FORMAT.read(spark, bloom_path, _BLOOM_SCHEMA),
                new_digests,
            )
        # the in-flight pbatch joins the watermark NOW: its digest
        # partition lands after this swap (superset-by-write-order),
        # and the next batch must not read it as uncovered
        _swap_write_bloom(rows, covered=_digest_parts() | {pbatch})

    def _process(batch: DataFrame, batch_id: int) -> None:
        pbatch = f"{run_id}-{batch_id}"
        batch = batch.dropDuplicates(["doc_id"])
        # explicit schemas on every store read: a zero-row batch's
        # dynamic-overwrite write creates the store directory with no
        # data files, and schema inference on it would fail the NEXT
        # batch (found by the empty-corpus tier driving the gate
        # parity row end-to-end)
        def _history() -> DataFrame:
            if _digest_store_exists():
                return FORMAT.read(
                    spark, digests_path, "content_hash string, pbatch string"
                ).filter(
                    # null-safe: rows from an out-of-band (pre-sentinel)
                    # compaction read pbatch as NULL and must stay history
                    ~F.col("pbatch").eqNullSafe(pbatch)
                )
            return spark.createDataFrame(
                [], "content_hash string, pbatch string"
            )

        from pyspark import StorageLevel

        inc = batch.select("doc_id", F.md5("text").alias("content_hash"))
        no_history = spark.createDataFrame([], "content_hash string")
        flagged = None
        if bloom_prefilter:
            FORMAT.repair(out_root, bloom_path)
            if _digest_store_exists() and (
                not _store_exists(bloom_path)
                # stale filter: the digest store carries partitions the
                # filter's watermark never covered — batches ingested
                # while the flag was off (or a fold of such batches, or
                # a pre-watermark legacy store). Probing a SUBSET
                # filter would yield false negatives (already-ingested
                # docs classified new), so rebuild first.
                or _digest_parts() - _bloom_covered()
            ):
                # build from the full digest store (including any
                # crashed attempt's partition — a superset only ever
                # costs false positives)
                _swap_write_bloom(
                    build_bloom_membership(
                        FORMAT.read(
                            spark,
                            digests_path,
                            "content_hash string, pbatch string",
                        ).select("content_hash"),
                        headroom=bloom_headroom,
                    ),
                    covered=_digest_parts(),
                )
            if _store_exists(bloom_path):
                blooms = FORMAT.read(spark, bloom_path, _BLOOM_SCHEMA)
                flagged = probe_bloom_membership(inc, blooms).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                maybe = flagged.filter("maybe_dup").select(
                    "doc_id", "content_hash"
                )
                clear = flagged.filter(~F.col("maybe_dup")).select(
                    "doc_id", "content_hash"
                )
                if maybe.limit(1).count():
                    statuses = incremental_dedup_digests(
                        maybe, _history()
                    ).unionByName(
                        incremental_dedup_digests(clear, no_history)
                    )
                else:
                    # the all-new fast path: the digest store — the
                    # whole ingest history — is never even scanned
                    statuses = incremental_dedup_digests(flagged, no_history)
            else:
                # cold lake: no filter and no history to consult
                statuses = incremental_dedup_digests(inc, no_history)
        else:
            statuses = incremental_dedup_digests(inc, _history())

        # four lineages traverse the classified batch (clean, dups,
        # digests, and the gate's new_docs) — persist it so the digest
        # store scan + classify join run once per batch, not per sink
        routed = batch.join(statuses, "doc_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )

        def _sink(df: DataFrame, path: str) -> None:
            # r12 opt (guide §6 small files): the per-batch sink
            # relations read from PERSISTED parents, and AQE does not
            # re-partition cached plans (canChangeCachedPlanOutputPartitioning
            # is off by default) — so every sink wrote one file per
            # cached partition (32/batch/store at the bench width) and
            # each later batch's store reads paid the per-file open
            # cost. A REBALANCE hint at the write only (the exchange
            # sits ABOVE the cache scan, where AQE does apply) sizes
            # the writer by advisory bytes: one file per tiny batch
            # delta, more as batches grow — never a constant.
            FORMAT.overwrite_partitions(
                df.withColumn("pbatch", F.lit(pbatch)).hint("rebalance"),
                path,
                "pbatch",
            )

        try:
            is_new = F.col("status") == "new"
            # erasure-over-redelivery: doc-keyed sinks exclude
            # tombstoned ids; the digest sink below stays UNfiltered
            # so purged content remains blocked from re-ingestion
            doc_rows = routed
            if respect_tombstones and _store_exists(
                f"{out_root}/_tombstones"
            ):
                tomb = (
                    FORMAT.read(spark, f"{out_root}/_tombstones", "doc_id bigint")
                    .distinct()
                )
                doc_rows = routed.join(F.broadcast(tomb), "doc_id", "left_anti")
            clean_rows = doc_rows.filter(is_new).drop("status")
            if redact_pii:
                # scrub the stored payload ONLY — every classification
                # relation above/below (digest, bloom, gate shingles)
                # reads the original bytes, so dedup semantics are
                # unchanged by the rewrite. The PRE-redaction digest is
                # persisted beside the redacted payload: md5 of a
                # scrubbed text no longer matches the digest store, so
                # without this column takedown's opt-in unblock policy
                # (block_reingest=False) could never match a purged
                # payload back to its digest (ADVICE r9) — the hex
                # digest itself carries no PII
                from flink_realtime_data_warehouse_spark.operators.pii import (
                    redact_text,
                )

                clean_rows = clean_rows.withColumn(
                    "text", redact_text(F.col("text"))
                )
            else:
                clean_rows = clean_rows.drop("content_hash")
            _sink(clean_rows, f"{out_root}/clean")
            _sink(
                doc_rows.filter(~is_new).select("doc_id", "content_hash", "status"),
                f"{out_root}/dups",
            )
            if bloom_prefilter:
                # filter-before-digests write order: a crash between
                # the two leaves the filter a superset (FPs only)
                _update_bloom(
                    routed.filter(is_new).select("content_hash"), pbatch
                )
            _sink(
                routed.filter(is_new).select("content_hash"),
                digests_path,
            )
            if near_dup_gate:
                # roll back a compaction crashed mid-swap BEFORE the
                # existence probes: a store renamed away between the
                # two swap renames must be restored, never treated as
                # an empty cold start
                for p in (lsh_df_path, lsh_bands_path):
                    FORMAT.repair(f"{out_root}/lsh", p)
                # tombstoned docs contribute no bands/df on a replay
                # (erasure wins over cap bookkeeping — documented)
                new_docs = doc_rows.filter(is_new).select("doc_id", "text")
                # pbatch filters are null-safe so rows from a store
                # compacted by an out-of-band (pre-sentinel) job —
                # whose pbatch reads as NULL — survive as history
                # instead of vanishing under NULL != x
                stored_df = (
                    FORMAT.read(
                        spark, lsh_df_path, "s bigint, df bigint, pbatch string"
                    ).filter(~F.col("pbatch").eqNullSafe(pbatch))
                    if _store_exists(lsh_df_path)
                    else None
                )
                # ONE persisted shingle relation feeds all four gate
                # lineages (df delta, hot set, band append, probe) —
                # without it the explode+distinct re-runs per lineage.
                # The fan-out runs the explode wide: a micro-batch is
                # typically ONE source file = one scan task (fanout.py)
                from flink_realtime_data_warehouse_spark.fanout import (
                    fanout,
                )

                sh = (
                    _exploded_shingle_hashes(fanout(new_docs, "doc_id"))
                    .distinct()
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                sh_capped, delta = _capped_batch_shingles(
                    new_docs, stored_df, NGRAM_DF_CAP, sh=sh
                )
                # r12 opt: persist BANDS, not the capped shingles — the
                # probe join and the band sink both consume bands, and
                # persisting the relation one step earlier made each of
                # them re-run the minhash aggregation (the heaviest
                # per-batch stage: 128 min-exprs over every shingle,
                # measured ~2 s of the gated batch) from the cache.
                # sh_capped has exactly one consumer now (this
                # materialization), so it needs no persist of its own.
                bands = _bands_from_shingles(sh_capped).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                try:
                    if _store_exists(lsh_bands_path):
                        hist_bands = FORMAT.read(
                            spark,
                            lsh_bands_path,
                            "doc_id bigint, band int, key string, pbatch string",
                        ).filter(~F.col("pbatch").eqNullSafe(pbatch))
                        near = (
                            bands.alias("n")
                            .join(
                                hist_bands.alias("h"),
                                (F.col("n.band") == F.col("h.band"))
                                & (F.col("n.key") == F.col("h.key")),
                            )
                            .select(
                                F.col("n.doc_id").alias("doc_id"),
                                F.col("h.doc_id").alias("doc_hist"),
                            )
                            .distinct()
                        )
                    else:
                        near = spark.createDataFrame(
                            [], "doc_id bigint, doc_hist bigint"
                        )
                    _sink(near, f"{out_root}/near_dups")
                    _sink(bands, lsh_bands_path)
                    _sink(delta, lsh_df_path)
                finally:
                    bands.unpersist()
                    sh.unpersist()
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_history_digest_store(
                    spark, out_root, exclude_pbatch=pbatch
                )
                if near_dup_gate:
                    compact_dedup_lsh_index_capped(
                        spark, f"{out_root}/lsh", exclude_pbatch=pbatch
                    )
        finally:
            routed.unpersist()
            if flagged is not None:
                flagged.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
