"""Sinks: keyed upsert store (reference K3/K4) and stream writers.

The reference upserts dimension rows one-by-one over Phoenix JDBC
(reference DimSinkFunction.java:23-32, PhoenixUtil.java:23-63) and
creates tables on the fly (TableProcessFunction.java:48-102). The
Spark-idiomatic replacement is a set-oriented MERGE per micro-batch
into a lake table.

Delta/Iceberg are not available in this environment, so ``DimStore``
implements MERGE semantics on plain parquet: union existing + batch,
keep the newest version per PK, atomic directory swap. The interface
(``upsert(table, df, pk)``) is exactly what a DeltaTable.merge
implementation would expose — swap the body for
``whenMatchedUpdateAll().whenNotMatchedInsertAll()`` in production.
At 100 TB the store would also be partitioned/bucketed by PK hash so
a MERGE only rewrites touched files.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class DimStore:
    """Keyed upsert table store rooted at a directory (one subdir per table)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self._path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def upsert(self, table: str, batch: DataFrame, pk: str = "id") -> None:
        """MERGE INTO <table> USING <batch> ON pk — last writer wins.

        Reference K3 defaults the PK to "id" (TableProcessFunction.java:52-54).
        Within one batch, later rows win (the reference applies rows in
        arrival order); `_seq` encodes arrival order.
        """
        w = Window.partitionBy(pk).orderBy(F.desc("_seq"))
        batch = batch.withColumn("_seq", F.monotonically_increasing_id())
        path = self._path(table)
        if self.exists(table):
            current = self.read(table).withColumn("_seq", F.lit(-1).cast("long"))
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:  # K4: create-table-if-not-exists
            merged = batch
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
        # parquet has no txn log: write to a temp dir, then atomic swap
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        deduped.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            old = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, path)

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and "__" not in d
        )


def write_stream_parquet(df: DataFrame, path: str, checkpoint: str, available_now: bool = True):
    """K1 analogue: append stream → parquet table (at-least-once per file,
    exactly-once per batch via the checkpoint's write-ahead log)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_kafka(df: DataFrame, topic: str, bootstrap: str, checkpoint: str):
    """K1/K2: Kafka producer sink (at-least-once; reference MyKafkaUtil.java:52-87).

    Untestable here (no broker in the container) — the exactly-once
    end-to-end story is: write to the lake table (idempotent per batch)
    and let downstream consume that, per SURVEY.md §7.3.
    """
    return (
        df.selectExpr("CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
