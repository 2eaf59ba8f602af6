"""Table-format seam (r8 verdict item 5): the transactional store
operations this repo's parquet rename-swap layer provides, behind ONE
interface a real table format could implement — so swapping in Delta
Lake or Iceberg becomes a backend choice, not a rewrite.

Why the seam exists: the reference's Phoenix upsert sink
(DimSinkFunction.java:23-32) maps, in a lakehouse, to a table format's
MERGE; this repo substitutes parquet stores plus ~500 lines of
hand-rolled rename-swap/repair transaction machinery
(streaming/sinks.py, streaming/retention.py) because no table-format
runtime ships in this container. The machinery is fault-injection
tested, but a production team would replace it — and every store
mutator that needs replacing funnels through the five operations
below.

Contract for a future ``DeltaTableFormat`` (each method documents its
Delta mapping):

=====================  =============================================
 operation              Delta Lake equivalent
=====================  =============================================
 ``repair``             no-op — the transaction log IS the recovery
 ``read``               ``spark.read.format("delta").load(path)``
 ``overwrite_partitions``  writer with
                        ``partitionOverwriteMode=dynamic`` (or
                        ``replaceWhere`` on the partition predicate)
 ``swap_rewrite``       ``mode("overwrite")`` — one atomic commit
 ``swap_partitions``    ``replaceWhere`` limited to the named
                        partitions — one atomic commit, cold
                        partitions' files untouched (Delta gives the
                        same pruned-rewrite guarantee the parquet
                        backend implements by per-partition rename)
 ``append``             ``mode("append")`` — one atomic commit
=====================  =============================================

The keyed MERGE (DimStore's PK-hash-partitioned upsert) stays on its
own class — it is the reference-K3 component with its own salt-bucket
layout contract — but its swap/repair primitives are these same ones
(``streaming/sinks.py::_repair_swap_dir``); a Delta DimStore would be
``MERGE INTO`` plus this module's ``read``.

Crash semantics of the parquet backend (what a swap means here): every
rewrite stages to a ``__tmp_`` sibling, then renames; a kill between
renames leaves a ``__old_`` backup that ``repair`` — run first by every
reader and mutator — rolls back or forward. Idempotent re-drive (a
tombstone log, a checkpoint replay) converges the multi-store
composition; single-store visibility is atomic at the rename.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from flink_realtime_data_warehouse_spark.streaming.sinks import (
    _repair_swap_dir,
)


class ParquetSwapFormat:
    """The parquet + rename-swap implementation — today's backend."""

    def repair(self, root: str, path: str) -> None:
        """Roll back/forward any half-finished swap under ``path``
        (whole-store and partition-level). Delta: no-op."""
        _repair_swap_dir(root, path)

    def read(
        self,
        spark: SparkSession,
        path: str,
        schema: str | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read the store. An explicit ``schema`` both pins types and
        makes empty stores (partition dirs with no footers) readable.
        Delta: ``spark.read.format("delta").load(path)`` — the log
        carries the schema, so the empty-store corner vanishes."""
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(path)

    def overwrite_partitions(
        self, df: DataFrame, path: str, part_col: str
    ) -> None:
        """Dynamic partition overwrite: partitions present in ``df``
        replace their on-disk counterparts; absent partitions are
        untouched (the replay-idempotent sink write). Delta: dynamic
        ``partitionOverwriteMode`` or ``replaceWhere``."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(path)
        )

    def append(self, df: DataFrame, path: str) -> None:
        """Append-only commit (tombstone logs, delta tails).
        Delta: ``mode("append")``."""
        df.write.mode("append").parquet(path)

    def swap_rewrite(
        self,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        part_col: str = "pbatch",
    ) -> None:
        """Replace the WHOLE store with ``df`` atomically (compaction
        folds, the exotic-partition-value fallback). Parquet: stage to
        a ``__tmp_`` sibling, rename-away + rename-in. Delta: plain
        ``mode("overwrite")`` — one commit."""
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def swap_partitions(
        self,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        part_col: str,
        parts: list,
    ) -> None:
        """Replace ONLY the named partitions with ``df``'s rows (the
        pruned takedown rewrite): every other partition's files are
        never opened. ``df`` must contain rows solely for ``parts``.
        Parquet: one staging write, then a rename-swap per partition
        directory (a partition absent from ``df`` is deleted —
        all-rows-purged). A kill mid-loop leaves some partitions
        swapped and some not; ``repair`` rolls back the half-swapped
        one and an idempotent re-drive converges the rest. Delta:
        ``replaceWhere "<part_col> IN (...)"`` — one atomic commit."""
        stage = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(part_col).parquet(stage)
        for p in parts:
            pdir = os.path.join(path, f"{part_col}={p}")
            sdir = os.path.join(stage, f"{part_col}={p}")
            old = f"{pdir}__old_{uuid.uuid4().hex[:8]}"
            if os.path.isdir(pdir):
                os.rename(pdir, old)
            if os.path.isdir(sdir):
                os.rename(sdir, pdir)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)


#: the process-wide backend. A Delta deployment would assign its
#: implementation here (or inject per-store); every retention mutator
#: and the conformance tier (tests/test_table_format.py) go through it.
FORMAT = ParquetSwapFormat()
