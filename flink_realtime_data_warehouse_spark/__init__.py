"""flink_realtime_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``sora0608/flink-realtime-data-warehouse`` (Flink 1.13 + Kafka + Phoenix
real-time warehouse; see /root/reference) on Apache Spark:

- Structured Streaming pipelines for the reference's DIM / DWD layers
  (``streaming/``): config-driven dimension routing, behavior-log split,
  stateful new-visitor correction, per-day UV dedup, CEP bounce detection.
- A batch SQL analytics surface (``plans/``) over the same data model:
  TPC-H-style aggregations, joins, window functions, rollup/cube, set ops.
- Large-scale training-data-pipeline operators (``operators/``):
  exact + MinHash-LSH + SimHash + n-gram-Jaccard + embedding dedup,
  similarity search, text analysis, multimodal column plumbing.

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and optimized by Catalyst; Python only runs in
Arrow-batched Pandas UDFs where built-ins genuinely cannot express the
semantics (stateful CEP, language-ID profiles, binary decode).
"""

__version__ = "0.1.0"

from flink_realtime_data_warehouse_spark.session import get_spark  # noqa: F401
