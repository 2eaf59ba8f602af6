"""Typed schemas for the reference's stream payloads (SURVEY.md §1.3).

The reference parses everything dynamically with fastjson
(reference DimApp.java:59, BaseLogApp.java:53); we declare explicit
StructTypes once and let ``from_json`` produce typed columns — nulls
(not exceptions) mark unparsable rows, which drives the dirty-record
channel (T2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: behavior-log event (field accesses cited in FIXTURES.md §1;
#: reference BaseLogApp.java:64-149)
BEHAVIOR_LOG_SCHEMA = StructType(
    [
        StructField(
            "common",
            StructType(
                [
                    StructField("mid", StringType()),
                    StructField("is_new", StringType()),
                    StructField("uid", StringType()),
                    StructField("ch", StringType()),
                ]
            ),
        ),
        StructField(
            "page",
            StructType(
                [
                    StructField("page_id", StringType()),
                    StructField("last_page_id", StringType()),
                    StructField("during_time", LongType()),
                ]
            ),
        ),
        StructField(
            "start",
            StructType(
                [
                    StructField("entry", StringType()),
                    StructField("loading_time", LongType()),
                ]
            ),
        ),
        StructField(
            "err",
            StructType(
                [
                    StructField("error_code", LongType()),
                    StructField("msg", StringType()),
                ]
            ),
        ),
        # the reference reads key "display" but removes "displays"
        # (BaseLogApp.java:126 vs :152 — a reference bug, SURVEY.md §7.4);
        # we standardize on "display" as the wire key
        StructField(
            "display",
            ArrayType(
                StructType(
                    [
                        StructField("item", StringType()),
                        StructField("item_type", StringType()),
                        StructField("pos_id", LongType()),
                    ]
                )
            ),
        ),
        StructField(
            "actions",
            ArrayType(
                StructType(
                    [
                        StructField("item", StringType()),
                        StructField("item_type", StringType()),
                        StructField("action_id", StringType()),
                    ]
                )
            ),
        ),
        StructField("ts", LongType()),
    ]
)

#: business-table changelog row (reference DimApp.java:61-65,
#: TableProcessFunction.java:110-114; Maxwell-style)
TOPIC_DB_SCHEMA = StructType(
    [
        StructField("database", StringType()),
        StructField("table", StringType()),
        StructField("type", StringType()),
        StructField("data", MapType(StringType(), StringType())),
        StructField("old", MapType(StringType(), StringType())),
        StructField("ts", LongType()),
    ]
)

#: routing-config row (reference bean/TableProcess.java:6-38)
TABLE_PROCESS_SCHEMA = StructType(
    [
        StructField("source_table", StringType(), False),
        StructField("sink_table", StringType()),
        StructField("sink_columns", StringType()),
        StructField("sink_pk", StringType()),
        StructField("sink_extend", StringType()),
    ]
)

#: changelog types the DIM pipeline keeps (reference DimApp.java:61-65)
DIM_KEPT_TYPES = ("insert", "update", "bootstrap-insert")
