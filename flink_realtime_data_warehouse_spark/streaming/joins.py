"""Stream-stream joins with watermark-bounded state.

The reference's DWD topics imply stream-stream interval joins at the
DWS layer (SURVEY.md §2.4 notes them absent from the snapshot). On
Structured Streaming these are native: both sides watermarked, join
condition equi-key + time bound; state for each side is evicted once
the watermark passes the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "mid",
    left_time: str = "event_time",
    right_time: str = "r_event_time",
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner interval join: right event within [left_t, left_t + W).

    Both sides carry watermarks so Spark can bound the join state —
    the 100 TB requirement (unbounded stream-stream join state grows
    forever without them).
    """
    l_wm = left.withWatermark(left_time, watermark)
    r_wm = right.withWatermark(right_time, watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) < F.col(left_time) + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    l_pref = l_wm.select(
        *[F.col(c).alias(f"l_{c}") if c == key else F.col(c) for c in l_wm.columns]
    )
    r_pref = r_wm.select(
        *[F.col(c).alias(f"r_{c}") if c == key else F.col(c) for c in r_wm.columns]
    )
    return l_pref.join(r_pref, cond, "inner")


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "mid",
    left_time: str = "event_time",
    right_time: str = "r_event_time",
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER interval join: like the inner form, but a left event
    with no in-window right match is still emitted (right columns null)
    once the watermark passes its join window — Spark holds the left
    row in state exactly until no future right row could match, then
    releases it as unmatched.

    This is the conversion-funnel shape: every page view appears in the
    output exactly once, matched to a cart action or provably
    cart-less. Both watermarks are mandatory (without them the
    unmatched side could never be finalized and state would grow
    forever).
    """
    l_wm = left.withWatermark(left_time, watermark)
    r_wm = right.withWatermark(right_time, watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) < F.col(left_time) + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    l_pref = l_wm.select(
        *[F.col(c).alias(f"l_{c}") if c == key else F.col(c) for c in l_wm.columns]
    )
    r_pref = r_wm.select(
        *[F.col(c).alias(f"r_{c}") if c == key else F.col(c) for c in r_wm.columns]
    )
    return l_pref.join(r_pref, cond, "left_outer")
