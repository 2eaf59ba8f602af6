"""Retention / right-to-erasure for the history-dedup lake.

``start_history_dedup_ingest`` (streaming/jobs.py) accumulates four
doc-keyed stores — ``clean`` (payloads), ``dups`` (evidence),
``near_dups`` (gate evidence), ``lsh/bands`` (near-dup index rows) —
plus the content-keyed ``digests``. A takedown request (GDPR erasure,
DMCA, policy removal) must purge a document set from every store that
carries it, without corrupting the replay/compaction machinery those
stores share. The reference pipeline has no retention path at all
(its Phoenix/Kafka sinks append forever); this is a lake-native
requirement the moment the corpus feeds training.

Design:

- Each affected store is rewritten through the same crash-safe
  rename-swap as compaction (``_repair_swap_dir`` sweeps run first, so
  a takedown killed mid-swap rolls back on the next touch) and keeps
  its ``pbatch`` partitioning, so later ingest batches, replays, and
  compactions compose unchanged. At lake scale the rewrite would
  target only the pbatch partitions that actually carry purged rows
  (they are enumerable with one aggregation); the whole-store swap
  here keeps the crash story a single rename pair per store.
- ``digests`` policy (``block_reingest``): by default the digest of
  purged CONTENT is kept — the payload is erased everywhere, but a
  re-crawl of the same bytes still classifies ``dup_history`` and
  never re-enters the lake (the posture most takedown obligations
  want). With ``block_reingest=False`` the digest is removed too —
  but ONLY when no surviving clean document carries the same content
  (purging one duplicate must not unblock content the lake still
  holds).
- The purged ids append to ``{out_root}/_tombstones`` (parquet) before
  any store is touched: the operation is idempotent and re-runnable —
  a crash between stores leaves some purged and some not, and
  re-running (or running with the tombstone log after a batch replay
  resurrected rows from source) converges.
- Quiescence contract: run with no in-flight micro-batch. A batch
  replayed from the checkpoint AFTER a takedown regenerates its rows
  from source; re-apply the tombstone log once the stream is caught
  up (``reapply_tombstones``).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: explicit schemas for the doc-keyed evidence stores: dynamic-overwrite
#: writes of empty batches leave partition dirs with no data files, and
#: schema inference on those fails (same lesson as the gate reads)
_STORE_SCHEMAS = {
    "dups": "doc_id bigint, content_hash string, status string, pbatch string",
    "near_dups": "doc_id bigint, doc_hist bigint, pbatch string",
    "lsh/bands": "doc_id bigint, band int, key string, pbatch string",
}
_DIGEST_SCHEMA = "content_hash string, pbatch string"


def _has_parquet(path: str) -> bool:
    """True when the store holds at least one data file — a lake whose
    every batch was empty has partition dirs with no footers, and a
    mergeSchema read on it would fail inference."""
    for r, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _swap_rewrite(spark: SparkSession, root: str, store: str, df: DataFrame) -> None:
    """Rewrite ``store`` (under ``root``) to ``df``'s rows, pbatch
    partitioning preserved, behind the shared rename-swap."""
    tmp = f"{store}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").partitionBy("pbatch").parquet(tmp)
    old = f"{store}__old_{uuid.uuid4().hex[:8]}"
    os.rename(store, old)
    os.rename(tmp, store)
    shutil.rmtree(old, ignore_errors=True)


def takedown_documents(
    spark: SparkSession,
    out_root: str,
    doc_ids,
    block_reingest: bool = True,
    _log: bool = True,
) -> dict:
    """Purge ``doc_ids`` from every store of a history-dedup lake.

    ``doc_ids``: an iterable of ids or a single-column DataFrame. The
    id set is takedown-request-sized (thousands, not millions) and is
    broadcast against each store; returns ``{store: rows_removed}``.
    See the module docstring for crash/idempotency/digest semantics.
    """
    from flink_realtime_data_warehouse_spark.streaming.sinks import (
        _repair_swap_dir,
    )

    if isinstance(doc_ids, DataFrame):
        # materialize: a lazy id set derived from a store this function
        # is about to rename-swap would be pulled out from under itself
        rows = (
            doc_ids.select(
                F.col(doc_ids.columns[0]).cast("bigint").alias("doc_id")
            )
            .distinct()
            .collect()
        )
        ids = spark.createDataFrame(rows, "doc_id bigint")
    else:
        ids = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id bigint"
        ).distinct()

    # 1) tombstone log FIRST — the re-run/resume anchor (skipped when
    #    the ids ARE the log, i.e. reapply_tombstones)
    if _log:
        ids.write.mode("append").parquet(os.path.join(out_root, "_tombstones"))

    removed: dict[str, int] = {}

    # 2) clean (payload) — also the source of purged-content hashes for
    #    the block_reingest=False digest pass, captured BEFORE rewrite
    clean_path = os.path.join(out_root, "clean")
    _repair_swap_dir(out_root, clean_path)
    purged_hashes = None
    if os.path.isdir(clean_path) and _has_parquet(clean_path):
        clean = spark.read.option("mergeSchema", "true").parquet(clean_path)
        hit = clean.join(F.broadcast(ids), "doc_id")
        if not block_reingest:
            # hashes safe to unblock = carried by a purged clean doc
            # AND by no surviving clean doc
            survivors = clean.join(F.broadcast(ids), "doc_id", "left_anti")
            purged_hashes = (
                hit.select(F.md5("text").alias("content_hash"))
                .distinct()
                .join(
                    survivors.select(F.md5("text").alias("content_hash")).distinct(),
                    "content_hash",
                    "left_anti",
                )
            )
            purged_hashes = spark.createDataFrame(
                purged_hashes.collect(), "content_hash string"
            )  # materialize before the store is rewritten under it
        n = hit.count()
        removed["clean"] = n
        if n:
            _swap_rewrite(
                spark,
                out_root,
                clean_path,
                clean.join(F.broadcast(ids), "doc_id", "left_anti"),
            )

    # 3) doc-keyed evidence stores
    for rel, schema in _STORE_SCHEMAS.items():
        path = os.path.join(out_root, rel)
        _repair_swap_dir(os.path.dirname(path), path)
        if not os.path.isdir(path):
            continue
        df = spark.read.schema(schema).parquet(path)
        cond = ["doc_id"]
        if rel == "near_dups":
            # purge rows referencing the doc on EITHER side
            hit = df.join(F.broadcast(ids), "doc_id").unionByName(
                df.join(
                    F.broadcast(ids.withColumnRenamed("doc_id", "doc_hist")),
                    "doc_hist",
                )
            ).dropDuplicates()
            keep = df.join(F.broadcast(ids), "doc_id", "left_anti").join(
                F.broadcast(ids.withColumnRenamed("doc_id", "doc_hist")),
                "doc_hist",
                "left_anti",
            )
        else:
            hit = df.join(F.broadcast(ids), cond)
            keep = df.join(F.broadcast(ids), cond, "left_anti")
        n = hit.count()
        removed[rel] = n
        if n:
            _swap_rewrite(spark, os.path.dirname(path), path, keep)

    # 4) digests — policy pass
    digests_path = os.path.join(out_root, "digests")
    _repair_swap_dir(out_root, digests_path)
    if (
        not block_reingest
        and purged_hashes is not None
        and os.path.isdir(digests_path)
    ):
        dig = spark.read.schema(_DIGEST_SCHEMA).parquet(digests_path)
        hit = dig.join(F.broadcast(purged_hashes), "content_hash")
        n = hit.count()
        removed["digests"] = n
        if n:
            _swap_rewrite(
                spark,
                out_root,
                digests_path,
                dig.join(F.broadcast(purged_hashes), "content_hash", "left_anti"),
            )
    else:
        removed["digests"] = 0

    return removed


def reapply_tombstones(
    spark: SparkSession, out_root: str, block_reingest: bool = True
) -> dict:
    """Re-run the takedown for every id ever tombstoned — the recovery
    path after a crash mid-takedown or after a checkpoint replay
    resurrected purged rows from source. Idempotent."""
    path = os.path.join(out_root, "_tombstones")
    if not os.path.isdir(path):
        return {}
    ids = spark.read.schema("doc_id bigint").parquet(path).distinct()
    return takedown_documents(
        spark, out_root, ids, block_reingest=block_reingest, _log=False
    )


def takedown_vectors(
    spark: SparkSession, index_root: str, vec_ids
) -> dict:
    """Purge vectors from a STREAMING IVF index
    (streaming/jobs.py::start_embedding_ingest): the swappable
    ``cells`` dir and the ``_deltas`` tail are each rewritten without
    the purged ids behind the shared rename-swap (pbatch partitioning
    of the tail preserved, so batch replays and delta compaction
    compose unchanged). The quantizer artifacts are untouched — cell
    centroids are aggregates over many vectors, not recoverable
    payload, and keeping them preserves assignment determinism for
    future appends (the standard IVF posture; retrain offline if the
    purge is large enough to shift the distribution). Ids append to
    ``{index_root}/_tombstones`` first, so the operation is idempotent
    and resumable with ``reapply_vector_tombstones``."""
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _invalidate_index_df,
    )
    from flink_realtime_data_warehouse_spark.streaming.sinks import (
        _repair_swap_dir,
    )

    if isinstance(vec_ids, DataFrame):
        rows = (
            vec_ids.select(
                F.col(vec_ids.columns[0]).cast("bigint").alias("vec_id")
            )
            .distinct()
            .collect()
        )
        ids = spark.createDataFrame(rows, "vec_id bigint")
    else:
        ids = spark.createDataFrame(
            [(int(i),) for i in vec_ids], "vec_id bigint"
        ).distinct()
    ids.write.mode("append").parquet(os.path.join(index_root, "_tombstones"))
    return _purge_vector_stores(spark, index_root, ids)


def _purge_vector_stores(spark: SparkSession, index_root: str, ids: DataFrame) -> dict:
    from flink_realtime_data_warehouse_spark.operators.similarity import (
        _invalidate_index_df,
    )
    from flink_realtime_data_warehouse_spark.streaming.sinks import (
        _repair_swap_dir,
    )

    removed: dict[str, int] = {}
    cells = os.path.join(index_root, "cells")
    _repair_swap_dir(index_root, cells)
    if os.path.isdir(cells) and _has_parquet(cells):
        main = spark.read.parquet(cells)
        n = main.join(F.broadcast(ids), "vec_id").count()
        removed["cells"] = n
        if n:
            keep = main.join(F.broadcast(ids), "vec_id", "left_anti")
            tmp = f"{cells}__tmp_{uuid.uuid4().hex[:8]}"
            keep.repartition("cell").write.mode("overwrite").partitionBy(
                "cell"
            ).parquet(tmp)
            old = f"{cells}__old_{uuid.uuid4().hex[:8]}"
            os.rename(cells, old)
            os.rename(tmp, cells)
            shutil.rmtree(old, ignore_errors=True)
            _invalidate_index_df(spark, cells)
    deltas = os.path.join(index_root, "_deltas")
    _repair_swap_dir(index_root, deltas)
    if os.path.isdir(deltas):
        d = spark.read.schema(
            "cell int, vec_id bigint, v array<float>, pbatch string"
        ).parquet(deltas)
        n = d.join(F.broadcast(ids), "vec_id").count()
        removed["_deltas"] = n
        if n:
            _swap_rewrite(
                spark,
                index_root,
                deltas,
                d.join(F.broadcast(ids), "vec_id", "left_anti"),
            )
    return removed


def reapply_vector_tombstones(spark: SparkSession, index_root: str) -> dict:
    """Re-run the vector purge for every tombstoned id (crash/replay
    recovery). Idempotent."""
    path = os.path.join(index_root, "_tombstones")
    if not os.path.isdir(path):
        return {}
    ids = spark.read.schema("vec_id bigint").parquet(path).distinct()
    return _purge_vector_stores(spark, index_root, ids)
