"""Registry loader: importing every plan/operator module populates
``plans.registry.QUERIES`` / ``ORACLES``.

Lives inside the package (not only in ``__spark_entry__``) so any
in-package consumer — the SQL-view surface, bench, notebooks — sees the
SAME complete registry the driver contract exposes, without importing
the entry module or duplicating the module list.
"""

from __future__ import annotations


def load_all() -> tuple[dict, dict]:
    """Import all registering modules; return (QUERIES, ORACLES)."""
    import flink_realtime_data_warehouse_spark.operators.bpe  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.curation  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.decontam  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.dedup  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.dq  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.entity  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.export  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.graph  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.multimodal  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.pii  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.pq  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.retrieval  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.semdedup  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.sampling  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.similarity  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.sketches  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.textops  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.timeseries  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.visitors  # noqa: F401
    import flink_realtime_data_warehouse_spark.sources.ingest  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.ads  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.analytics  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.cep_queries  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.functions_surface  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.profiling  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.rollups  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.streaming_parity  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.tpch_extra  # noqa: F401
    import flink_realtime_data_warehouse_spark.plans.windows  # noqa: F401
    from flink_realtime_data_warehouse_spark.plans.registry import ORACLES, QUERIES

    return QUERIES, ORACLES
