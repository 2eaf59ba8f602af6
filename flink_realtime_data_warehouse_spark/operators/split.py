"""Behavior-log stream split + array explode (reference T7/T8).

One pass over the parsed log derives a ``record_type`` discriminator
(err / start / display / action / page — reference OutputTags at
BaseLogApp.java:46-48,98-162) and the exploded display/action child
streams. Reference bugs fixed per SURVEY.md §7.4: actions explode
iterates the *actions* array (not displays), and the dropped column
names match the real keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.functions.timeutil import to_date_str


def split_log(parsed: DataFrame) -> dict[str, DataFrame]:
    """Split the parsed behavior log into the five DWD streams.

    Returns {'err','start','display','action','page'} DataFrames.
    err rows also continue into the other streams (the reference
    *copies* error records to the error sink then strips `err`,
    BaseLogApp.java:107-112).
    """
    err = parsed.filter(F.col("err").isNotNull()).select(
        "common", "err", "ts", to_date_str(F.col("ts")).alias("dt")
    )
    no_err = parsed.drop("err")

    start = no_err.filter(F.col("start").isNotNull()).select(
        "common", "start", "ts", to_date_str(F.col("ts")).alias("dt")
    )
    pages = no_err.filter(F.col("start").isNull())

    display = pages.filter(F.col("display").isNotNull()).select(
        "common",
        F.col("page.page_id").alias("page_id"),
        "ts",
        F.explode("display").alias("display"),
    )
    # reference bug (BaseLogApp.java:139-148): loop bounds used
    # displays.size() and emitted to displayTag — fixed: explode actions
    action = pages.filter(F.col("actions").isNotNull()).select(
        "common",
        F.col("page.page_id").alias("page_id"),
        "ts",
        F.explode("actions").alias("action"),
    )
    page = pages.drop("display", "actions")
    return {"err": err, "start": start, "display": display, "action": action, "page": page}
