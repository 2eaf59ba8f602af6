"""JSON ingest + dirty-record channel (reference T1/T2).

The reference try-parses each record and either drops bad rows with a
log line (T1, DimApp.java:54-72) or routes them to a "Dirty" side
output (T2, BaseLogApp.java:46-62). Spark-first: one ``from_json``
pass; a null parse result marks the row dirty. Both the clean and the
dirty stream are filters over the same scan — Catalyst executes a
single pass when both sinks run in one foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


CORRUPT_COL = "_corrupt_record"


def parse_with_dirty(
    raw: DataFrame, schema: StructType, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty): clean rows are flattened to the schema's fields,
    dirty rows keep the raw string for observability.

    PERMISSIVE ``from_json`` captures unparsable input in the
    ``columnNameOfCorruptRecord`` field (the idiomatic dirty-record
    carrier) — a non-null there marks the row dirty.
    """
    schema_with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(value_col),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    is_dirty = F.col(f"_parsed.{CORRUPT_COL}").isNotNull() | F.col("_parsed").isNull()
    clean = parsed.filter(~is_dirty).select("_parsed.*").drop(CORRUPT_COL)
    dirty = parsed.filter(is_dirty).select(F.col(value_col).alias("dirty_raw"))
    return clean, dirty


def keep_changelog_types(df: DataFrame, types: tuple[str, ...], type_col: str = "type") -> DataFrame:
    """T1's type filter (reference DimApp.java:61-65): keep insert/update/bootstrap-insert."""
    return df.filter(F.col(type_col).isin(*types))


def entry_pages_only(df: DataFrame) -> DataFrame:
    """T3 (reference DwdTrafficUniqueVisitorDetail.java:44-47): keep session-entry pages."""
    return df.filter(F.col("page").isNotNull() & F.col("page.last_page_id").isNull())
