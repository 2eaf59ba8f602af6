"""Batch table loader for the driver's synthetic star schema.

``/root/testdata/sf*/`` holds one parquet per table (TESTDATA.md).
At 100 TB these would be partitioned/bucketed lake tables; the loader
keeps the interface identical (name → DataFrame + temp view) so query
code never hard-codes paths.

Timestamps are normalized to TIMESTAMP_NTZ: the files carry tz-naive
wall-clock values and the DuckDB oracle reads them naively, so NTZ
makes every date computation engine- and session-tz-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_to_ntz(col_name: str) -> F.Column:
    """epoch-nanos bigint column → TIMESTAMP_NTZ, truncated to micros
    exactly like DuckDB's ns→us read.

    All-integer arithmetic (`div`, then timestamp_add) — nanos exceed
    2^53 so any detour through double would corrupt microseconds. NTZ
    output keeps the value independent of the driver session timezone.
    """
    micros = F.expr(f"`{col_name}` div 1000")
    epoch = F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    return F.timestamp_add("MICROSECOND", micros, epoch)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — cheap footer read."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    try:
        schema = pq.read_schema(path)
    except Exception:  # directory-style parquet or remote path: let Spark handle it
        return []
    return [f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # Spark cannot read TIMESTAMP(NANOS) natively; read nanos as long
        # and rebuild NTZ micros exactly like DuckDB's ns→us truncation
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, _nanos_to_ntz(c))
    epoch = F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    for field in df.schema.fields:
        # The files store tz-naive wall-clock values (isAdjustedToUTC=false;
        # DuckDB reads them naively). A session with NTZ inference disabled
        # reads them as LTZ *instants* whose unix_micros equal the stored
        # wall-clock micros — so rebuilding NTZ from unix_micros recovers
        # the wall clock under ANY session timezone. A plain
        # cast(timestamp_ntz) would instead render the instant in session
        # tz and shift every value.
        if isinstance(field.dataType, TimestampType):
            df = df.withColumn(
                field.name, F.timestamp_add("MICROSECOND", F.unix_micros(F.col(field.name)), epoch)
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register: bool = True
) -> dict[str, DataFrame]:
    """Load tables and (optionally) register them as temp views for SQL."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
