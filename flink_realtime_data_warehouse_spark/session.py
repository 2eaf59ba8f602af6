"""SparkSession factory.

The reference scales via per-job parallelism knobs ("set to Kafka
partition count", reference DimApp.java:33, BaseLogApp.java:25,
DwdTrafficUserJumpDetail.java:32). On Spark the equivalents are
``spark.sql.shuffle.partitions`` plus AQE, which re-plans partition
counts / skew at runtime — so we turn AQE on everywhere.

Timezone: the reference renders dates at fixed UTC+8
(DateFormatUtil.java:21). We keep the *session* timezone configurable
(default UTC so results are engine-independent) and implement the
reference's +8 semantics with timezone-explicit expressions in
``functions.timeutil`` instead of leaning on session state.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frdw-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    tz: str = "UTC",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target the test rig (local[N]) but every setting is the
    one we would ship to a 1000-executor cluster: AQE with partition
    coalescing + skew-join splitting, broadcast threshold large enough
    to keep dimension joins shuffle-free, Arrow for any Python exchange.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    # executor Python workers must be able to import this package (the
    # stateful streaming functions are pickled by module reference)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_pythonpath = ":".join(
        p for p in (repo_root, os.environ.get("PYTHONPATH", "")) if p
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", tz)
        # testdata parquet carries tz-naive timestamps; read them as
        # TIMESTAMP_NTZ so date logic is independent of session tz
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # dimension tables are small relative to fact streams — keep
        # dim joins broadcast (reference does the same manually via
        # Flink broadcast state, DimApp.java:90-96)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
