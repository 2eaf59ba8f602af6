"""Config-driven dimension routing (reference DimApp, J1/T5/ST5/K3/K4).

The reference broadcasts a MySQL-CDC config stream into per-subtask
MapState and routes each changelog row to a Phoenix table
(reference DimApp.java:74-99, TableProcessFunction.java:17-141).

Spark shape (SURVEY.md §3.1): the config lives in a small table; every
micro-batch re-reads it (≡ broadcast refresh — ST5) and broadcast-joins
it against the batch (J1). Matched rows are projected to the config's
column whitelist (T5 — exact set match, fixing the reference's
substring bug at TableProcessFunction.java:133-140) and MERGEd into
their sink table (K3), creating it on first write (K4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.parse import keep_changelog_types
from flink_realtime_data_warehouse_spark.schemas import DIM_KEPT_TYPES
from flink_realtime_data_warehouse_spark.streaming.sinks import DimStore


def route_changelog_batch(
    batch: DataFrame, config: DataFrame, store: DimStore
) -> dict[str, int]:
    """Route one micro-batch of parsed changelog rows into dim tables.

    Returns {sink_table: rows_upserted} for observability (the
    reference logs unmatched tables and drops them,
    TableProcessFunction.java:118-120 — inner join ≡ drop).
    """
    batch = keep_changelog_types(batch, DIM_KEPT_TYPES)
    routed = batch.join(
        F.broadcast(config), batch["table"] == config["source_table"], "inner"
    )

    # config is small (dimension routing rules): collect is the
    # distinct-sink-tables loop the reference runs in broadcast state
    rules = {
        r["source_table"]: (
            r["sink_table"],
            [c.strip() for c in (r["sink_columns"] or "").split(",") if c.strip()],
            r["sink_pk"] or "id",  # default PK (TableProcessFunction.java:52-54)
        )
        for r in config.collect()
    }

    counts: dict[str, int] = {}
    for source_table, (sink_table, sink_columns, sink_pk) in rules.items():
        part = routed.filter(F.col("source_table") == source_table)
        # T5 dynamic projection — exact set membership (fixes the
        # reference's substring-containment bug): data is a
        # map<string,string>, project the whitelisted keys as columns
        cols = [F.col("data").getItem(c).alias(c) for c in sink_columns]
        out = part.select(*cols)
        n = out.count()
        if n == 0:
            continue
        store.upsert(sink_table, out, pk=sink_pk)
        counts[sink_table] = n
    return counts


def start_dim_app(
    spark: SparkSession,
    changelog_stream: DataFrame,
    config_path: str,
    store: DimStore,
    checkpoint: str,
    available_now: bool = True,
):
    """DimApp topology (reference DimApp.java:30-102), Spark-first.

    ``changelog_stream``: parsed streaming DataFrame of TOPIC_DB_SCHEMA.
    ``config_path``: parquet table of TABLE_PROCESS_SCHEMA rows —
    re-read every batch, so config changes apply at the next
    micro-batch exactly like the reference's broadcast state refresh.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        config = spark.read.parquet(config_path)
        route_changelog_batch(batch, config, store)

    writer = (
        changelog_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
