"""Exact-semantics stateful streaming operators (reference ST1/ST2/ST4).

Each reference Flink keyed-state operator maps to an
``applyInPandasWithState`` function keyed by ``mid``:

- ST1 new/old-visitor correction (reference BaseLogApp.java:64-96):
  ValueState<first_visit_date>, no TTL.
- ST2 per-day UV dedup (reference DwdTrafficUniqueVisitorDetail.java:55-80):
  ValueState<last_emitted_date>, no TTL.
- ST4 CEP bounce detection (reference DwdTrafficUserJumpDetail.java:88-136):
  pattern ``entry → strictly-next entry within W`` plus timeout emission,
  implemented as a pending-event state machine with EventTimeTimeout.

State is a tiny per-key scalar, so at 100 TB/day the state store stays
proportional to |devices|, not traffic. The reference configures no
state TTL (SURVEY.md §7.3); ``applyInPandasWithState`` would add one
via ProcessingTimeTimeout if retention became a problem.

Batch-equivalent window formulations of the same semantics (used for
backfills and DuckDB oracles) live in ``operators/visitors.py``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_realtime_data_warehouse_spark.functions.timeutil import SHANGHAI_OFFSET_MILLIS

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _date_of_millis(ts_ms: int, offset_ms: int = SHANGHAI_OFFSET_MILLIS) -> str:
    """epoch millis → 'yyyy-MM-dd' at the reference's fixed +8 offset."""
    import datetime as dt

    return (
        dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=ts_ms + offset_ms)
    ).strftime("%Y-%m-%d")


def _gather(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    """All of a key's rows for this trigger, globally sorted by event time.

    ``applyInPandasWithState`` may deliver one key's rows as several Arrow
    chunks; sorting each chunk independently would run state transitions
    out of event-time order whenever a group spans chunks. Concatenate
    first, then sort once (stable, so equal-ts rows keep arrival order).
    """
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return None
    whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    return whole.sort_values("ts", kind="mergesort")


def _ordered_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[tuple]:
    whole = _gather(pdfs)
    return iter(()) if whole is None else whole.itertuples(index=False)


#: flat record shape used by the stateful ops (mid, page info, ts)
VISITOR_EVENT_SCHEMA = StructType(
    [
        StructField("mid", StringType()),
        StructField("is_new", StringType()),
        StructField("page_id", StringType()),
        StructField("last_page_id", StringType()),
        StructField("ts", LongType()),
    ]
)


# ---------------------------------------------------------------------------
# ST1 — is_new correction
# ---------------------------------------------------------------------------

_ST1_STATE = StructType([StructField("first_visit_date", StringType())])


def _st1_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Reference logic BaseLogApp.java:76-95, applied in ts order."""
    first_date = state.get[0] if state.exists else None
    whole = _gather(pdfs)
    if whole is None:
        return
    cols = list(whole.columns)
    is_new_pos = cols.index("is_new")
    out = []
    for row in whole.itertuples(index=False):
        today = _date_of_millis(row.ts)
        is_new = row.is_new
        if first_date is not None:
            if is_new == "1" and first_date != today:
                is_new = "0"
        else:
            if is_new == "1":
                first_date = today
            else:
                # first sighting claims to be old: backfill state with
                # yesterday so later "1"s are corrected (BaseLogApp.java:91-94)
                import datetime as dt

                y = dt.datetime.strptime(today, "%Y-%m-%d") - dt.timedelta(days=1)
                first_date = y.strftime("%Y-%m-%d")
        vals = list(row)
        vals[is_new_pos] = is_new
        out.append(tuple(vals))
    state.update((first_date,))
    yield pd.DataFrame(out, columns=cols)


_ST1_BASE_COLS = ("mid", "is_new", "page_id", "last_page_id", "ts")


def correct_is_new(events: DataFrame) -> DataFrame:
    """ST1: per-mid stateful is_new rewrite (streaming form).

    Any column beyond the visitor five (e.g. a serialized payload the
    job wants to carry through the correction, as the reference's keyed
    process function carries the whole JSONObject) passes through
    untouched and appears in the output schema.
    """
    extras = [f for f in events.schema.fields if f.name not in _ST1_BASE_COLS]
    out_schema = StructType(list(VISITOR_EVENT_SCHEMA.fields) + extras)
    ordered = events.select(*_ST1_BASE_COLS, *[f.name for f in extras])
    return ordered.groupBy("mid").applyInPandasWithState(
        _st1_fn,
        outputStructType=out_schema,
        stateStructType=_ST1_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# ST2 — per-day unique-visitor dedup
# ---------------------------------------------------------------------------

_ST2_STATE = StructType([StructField("last_visit_date", StringType())])


def _st2_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Reference predicate DwdTrafficUniqueVisitorDetail.java:67-79."""
    last_date = state.get[0] if state.exists else None
    out = []
    for row in _ordered_rows(pdfs):
        today = _date_of_millis(row.ts)
        if last_date is None or last_date != today:
            out.append((row.mid, row.is_new, row.page_id, row.last_page_id, row.ts))
            last_date = today
    state.update((last_date,))
    yield pd.DataFrame(out, columns=["mid", "is_new", "page_id", "last_page_id", "ts"])


def daily_unique_visitors(events: DataFrame) -> DataFrame:
    """ST2: emit the first event per (mid, day) — exact reference semantics.

    (The idiomatic high-throughput alternative is
    ``withWatermark(...).dropDuplicates(["mid", "dt"])`` — same output
    under ordered input, bounded state via watermark.)
    """
    return events.groupBy("mid").applyInPandasWithState(
        _st2_fn,
        outputStructType=VISITOR_EVENT_SCHEMA,
        stateStructType=_ST2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# ST4 — CEP bounce detection with event-time timeout
# ---------------------------------------------------------------------------

BOUNCE_WINDOW_MS = 10_000  #: reference within(Time.seconds(10)), DwdTrafficUserJumpDetail.java:106

_ST4_STATE = StructType(
    [
        StructField("pending_ts", LongType()),
        StructField("pending_page_id", StringType()),
    ]
)

BOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("mid", StringType()),
        StructField("page_id", StringType()),
        StructField("ts", LongType()),
    ]
)


def _st4_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Pending-entry state machine ≡ Flink CEP first/next/within + timeout.

    - entry event while an in-window entry is pending → pending is a
      bounce (CEP match path, DwdTrafficUserJumpDetail.java:112-118)
    - non-entry event in-window → pattern broken, pending dropped
    - any event after the window → pending is a bounce (timeout path,
      :119-131); the new event re-arms iff it is an entry
    - watermark passing pending_ts + W with no event → timeout callback
      emits the pending entry (union of match+timeout ≡ :136)
    """
    mid = key[0]
    out: list[tuple[Any, ...]] = []

    if state.hasTimedOut:
        if state.exists:
            pending_ts, pending_page = state.get
            out.append((mid, pending_page, pending_ts))
        state.remove()
        yield pd.DataFrame(out, columns=["mid", "page_id", "ts"])
        return

    pending: tuple[int, str] | None = tuple(state.get) if state.exists else None
    for row in _ordered_rows(pdfs):
        is_entry = row.last_page_id is None or (
            isinstance(row.last_page_id, float) and pd.isna(row.last_page_id)
        )
        if pending is not None:
            if row.ts - pending[0] <= BOUNCE_WINDOW_MS:
                if is_entry:
                    out.append((mid, pending[1], pending[0]))  # match → bounce
                    pending = (row.ts, row.page_id)
                else:
                    pending = None  # strict-next broken
            else:
                out.append((mid, pending[1], pending[0]))  # in-batch timeout
                pending = (row.ts, row.page_id) if is_entry else None
        else:
            if is_entry:
                pending = (row.ts, row.page_id)

    if pending is not None:
        window_end = pending[0] + BOUNCE_WINDOW_MS
        watermark = state.getCurrentWatermarkMs()
        if watermark >= window_end:
            # the window already expired behind the watermark (late entry):
            # a timeout could never legally be armed — emit the bounce now,
            # matching the CEP timeout path for an already-elapsed window
            out.append((mid, pending[1], pending[0]))
            state.remove()
        else:
            state.update(pending)
            # fire when the event-time watermark passes the CEP window end
            state.setTimeoutTimestamp(window_end)
    else:
        state.remove()
    yield pd.DataFrame(out, columns=["mid", "page_id", "ts"])


def detect_bounces(events: DataFrame) -> DataFrame:
    """ST4: streaming bounce stream from a watermarked page-log DataFrame.

    ``events`` needs columns (mid, page_id, last_page_id, ts) and an
    event-time watermark already assigned (ST3) so EventTimeTimeout can
    fire for idle keys.
    """
    return events.groupBy("mid").applyInPandasWithState(
        _st4_fn,
        outputStructType=BOUNCE_OUTPUT_SCHEMA,
        stateStructType=_ST4_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
