"""Scale mechanics: bucketed co-located joins, skew salting, partition
layout helpers.

These are the knobs a 100 TB deployment turns (SURVEY.md §4's manual
optimizations, generalized):

- **Bucketing** pre-shuffles a table once at write time; subsequent
  equi-joins/aggregations on the bucket key run with NO exchange —
  the reference approximates this by pinning parallelism to Kafka
  partition count (DimApp.java:33 comment).
- **Salting** splits a hot key across N sub-keys for the shuffle, then
  merges — the manual fallback where AQE skew-join splitting (enabled
  in session.py) isn't applicable (e.g. skewed aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 16, sort_cols: list[str] | None = None
) -> None:
    """Persist a table bucketed (and optionally sorted) by join key.

    Joins between two tables bucketed the same way execute without a
    shuffle (SortMergeJoin over pre-bucketed scans).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table, format="parquet")


def compact_parquet_dir(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> tuple[int, int]:
    """Compact a small-file parquet directory in place.

    Streaming sinks and per-batch MERGE writes accumulate many small
    files; at lake scale that degrades scan planning (file listing,
    footer reads) and kills read throughput. This rewrites the
    directory into ``ceil(rows / target_rows_per_file)`` files via an
    atomic directory swap, preserving content exactly. Returns
    (files_before, files_after).

    On a real lakehouse this is Delta OPTIMIZE / Iceberg rewrite_data_files;
    the interface (path + target size) is the same.
    """
    import math
    import os
    import shutil
    import uuid

    def _count_files(p):
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = _count_files(path)
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return before, _count_files(path)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation through a salt: partial agg on
    (key, salt), final agg on key.

    For algebraic aggregates (sum/count/min/max) this is semantically
    identical to a direct groupBy but splits a hot key's rows across
    n_salts reducers in phase one. avg must be decomposed by the
    caller into sum+count.
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[getattr(F, fn)(c).alias(f"_p_{c}_{fn}") for c, fn in agg_exprs.items()]
    )
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    phase2 = phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{c}_{fn}").alias(f"{fn}_{c}")
            for c, fn in agg_exprs.items()
        ]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt).

    Use when one join key dominates the big side and the small side is
    too large to broadcast outright. Output schema = big ⋈ small on key.
    """
    big_s = big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_s = small.select("*", salts)
    return big_s.join(small_s, on=[key, "_salt"]).drop("_salt")
