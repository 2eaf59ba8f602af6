"""Compute fan-out for CPU-bound kernels over under-partitioned input.

The fixture corpora are ONE parquet row group per table, so a scan is
ONE input split — and any expensive per-row kernel downstream of it
(the image codecs, a 48-deep replace chain, a shingle explode+hash)
runs single-task while 31 cores idle. The guide's rule (§2/§8) is to
shuffle the cheap proxy so the expensive compute parallelizes: these
rows carry tiny payloads (KBs/row), so one exchange of the whole input
costs milliseconds and buys full-width execution.

``fanout`` is deliberately an EXPLICIT numbered repartition, not a
keyless round-robin and not an AQE-subject shuffle:

- the partition count follows ``defaultParallelism`` (i.e. the
  ``local[$SPARK_GRAFT_CPUS]`` master), so the driver's lower-core
  bench runs scale it down automatically — never a constant tuned to
  this box;
- a user-numbered repartition is exempt from AQE partition coalescing,
  which would otherwise fold these tiny-byte / heavy-CPU partitions
  straight back onto one task (AQE sizes by bytes and cannot see
  per-row compute cost);
- hash-partitioning by a provided key keeps the row-to-partition map
  deterministic under task retry (guide §2.5: never derive a shuffle
  key from rand()).

At lake scale inputs arrive pre-split and this exchange is the first
thing to delete — callers note that in their docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, *key_cols: str, factor: int = 1) -> DataFrame:
    """Hash-repartition ``df`` over ``key_cols`` into
    ``defaultParallelism * factor`` partitions (exempt from AQE
    coalescing) so a CPU-heavy downstream kernel uses every core."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n, *key_cols)
