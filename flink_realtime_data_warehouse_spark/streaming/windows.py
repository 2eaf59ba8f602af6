"""Streaming windowed aggregations with watermarks (DWS layer).

The reference's DWD topics exist to feed windowed traffic rollups
(its DWS apps are absent from the snapshot — SURVEY.md §2.5). These
jobs are the Structured Streaming face of plans/windows.py: same
window semantics, plus watermark-driven state eviction so unbounded
streams hold bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_traffic_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Append-mode tumbling rollup: (window, event_type) → counts.

    The watermark bounds both late data acceptance and window state:
    a window finalizes (and emits, in append mode) once the watermark
    passes window.end. ST6 note: the reference drops nothing explicitly
    (monotonous watermark, DwdTrafficUserJumpDetail.java:71-82); here
    lateness tolerance is the explicit watermark parameter.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.approx_count_distinct("mid").alias("approx_uv"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"),
                "event_type", "n_events", "approx_uv")
    )


def sliding_traffic_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Append-mode sliding rollup: each event lands in window/slide
    overlapping windows; state evicts as the watermark passes each
    window end."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_traffic_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Append-mode session windows per device (mid), gap-based merge."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), "mid")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"),
                "mid", "n_events")
    )
