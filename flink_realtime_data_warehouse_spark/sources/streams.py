"""Streaming sources (reference S1-S3).

The reference consumes JSON strings from Kafka (S1, reference
utils/MyKafkaUtil.java:20-51). We expose the same shape from either
Kafka (untestable in this container — no broker) or a JSON-lines file
drop directory, which Structured Streaming treats as an unbounded
source; all downstream operators are source-agnostic because both
yield a ``value: string`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

RAW_VALUE_SCHEMA = StructType([StructField("value", StringType())])


def read_kafka_stream(spark: SparkSession, topic: str, bootstrap: str, group_id: str) -> DataFrame:
    """S1: Kafka consumer → value-string stream.

    Tombstones arrive as null values (the reference's custom
    deserializer null-guard, MyKafkaUtil.java:36-41) — dropped here.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("kafka.group.id", group_id)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
        .filter(F.col("value").isNotNull())
    )


def read_jsonl_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-drop source: one JSON document per line → value-string stream.

    Reading as ``text`` (not ``json``) keeps unparsable rows alive so
    the dirty channel (T2) can observe them.
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).filter(F.col("value").isNotNull())


def static_jsonl(spark: SparkSession, rows: list[str]) -> DataFrame:
    """S3: in-memory fixture source (reference env.fromElements,
    DwdTrafficUserJumpDetail.java:56-65) — batch DataFrame for tests."""
    return spark.createDataFrame([(r,) for r in rows], RAW_VALUE_SCHEMA)
