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

The state functions are built by closure FACTORIES (``make_st*_fn``)
so cloudpickle ships them to executors BY VALUE: the Python workers of
a driver-created session cannot import this package, and a
module-level function would be pickled by reference and die with
ModuleNotFoundError. Every closure is fully self-contained.

Batch-equivalent window formulations of the same semantics (used for
backfills and DuckDB oracles) live in ``operators/visitors.py``;
stream-vs-batch parity is pinned under the driver's oracle check by
``plans/streaming_parity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_realtime_data_warehouse_spark.functions.timeutil import SHANGHAI_OFFSET_MILLIS

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

_ST1_STATE = StructType([StructField("first_visit_date", StringType())])
_ST2_STATE = StructType([StructField("last_visit_date", StringType())])

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


def make_st1_fn(offset_ms: int = SHANGHAI_OFFSET_MILLIS, ts_per_ms: int = 1):
    """ST1 state function (reference logic BaseLogApp.java:76-95).

    ``ts_per_ms``: input-ts units per millisecond (1 → ts is epoch ms,
    1000 → epoch µs). Dates are computed at ``offset_ms`` past epoch
    (the reference pins +8; parity over NTZ data passes 0).

    Columns beyond the visitor five pass through untouched — the
    reference's keyed process function carries the whole JSONObject.
    """

    def st1_fn(key, pdfs, state):
        import datetime as dt

        import pandas as pd

        def date_of(ts):
            return (
                dt.datetime(1970, 1, 1)
                + dt.timedelta(milliseconds=ts // ts_per_ms + offset_ms)
            ).strftime("%Y-%m-%d")

        first_date = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        # concatenate ALL Arrow chunks before sorting: a per-chunk sort
        # would run state transitions out of event-time order whenever a
        # group spans chunks
        whole = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ).sort_values("ts", kind="mergesort")
        cols = list(whole.columns)
        is_new_pos = cols.index("is_new")
        out = []
        for row in whole.itertuples(index=False):
            today = date_of(row.ts)
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
                    y = dt.datetime.strptime(today, "%Y-%m-%d") - dt.timedelta(days=1)
                    first_date = y.strftime("%Y-%m-%d")
            vals = list(row)
            vals[is_new_pos] = is_new
            out.append(tuple(vals))
        state.update((first_date,))
        yield pd.DataFrame(out, columns=cols)

    return st1_fn


def make_st2_fn(offset_ms: int = SHANGHAI_OFFSET_MILLIS, ts_per_ms: int = 1):
    """ST2 state function (reference predicate
    DwdTrafficUniqueVisitorDetail.java:67-79)."""

    def st2_fn(key, pdfs, state):
        import datetime as dt

        import pandas as pd

        def date_of(ts):
            return (
                dt.datetime(1970, 1, 1)
                + dt.timedelta(milliseconds=ts // ts_per_ms + offset_ms)
            ).strftime("%Y-%m-%d")

        last_date = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        whole = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ).sort_values("ts", kind="mergesort")
        out = []
        for row in whole.itertuples(index=False):
            today = date_of(row.ts)
            if last_date is None or last_date != today:
                out.append((row.mid, row.is_new, row.page_id, row.last_page_id, row.ts))
                last_date = today
        state.update((last_date,))
        yield pd.DataFrame(
            out, columns=["mid", "is_new", "page_id", "last_page_id", "ts"]
        )

    return st2_fn


def make_st4_fn(window: int = BOUNCE_WINDOW_MS, ts_per_ms: int = 1):
    """ST4 pending-entry state machine ≡ Flink CEP first/next/within +
    timeout (``window`` in the same units as the input ``ts``;
    ``ts_per_ms`` converts those units to epoch milliseconds — 1 for ms
    timestamps, 1000 for µs — because GroupState's
    getCurrentWatermarkMs/setTimeoutTimestamp are MILLISECOND-based:
    with µs ts and no conversion the armed timeout lands ~1000× in the
    future and idle-key pending bounces never emit; ADVICE r2):

    - entry event while an in-window entry is pending → pending is a
      bounce (CEP match path, DwdTrafficUserJumpDetail.java:112-118)
    - non-entry event in-window → pattern broken, pending dropped
    - any event after the window → pending is a bounce (timeout path,
      :119-131); the new event re-arms iff it is an entry
    - watermark passing pending_ts + W with no event → timeout callback
      emits the pending entry (union of match+timeout ≡ :136)
    """

    def st4_fn(key, pdfs, state):
        import pandas as pd

        mid = key[0]
        out = []

        if state.hasTimedOut:
            if state.exists:
                pending_ts, pending_page = state.get
                out.append((mid, pending_page, pending_ts))
            state.remove()
            yield pd.DataFrame(out, columns=["mid", "page_id", "ts"])
            return

        pending = tuple(state.get) if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        whole = None
        if chunks:
            whole = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ).sort_values("ts", kind="mergesort")
        if whole is not None:
            for row in whole.itertuples(index=False):
                is_entry = row.last_page_id is None or (
                    isinstance(row.last_page_id, float) and pd.isna(row.last_page_id)
                )
                if pending is not None:
                    if row.ts - pending[0] <= window:
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
            # ceil to ms so the timeout never fires before window end
            window_end_ms = -(-(pending[0] + window) // ts_per_ms)
            watermark = state.getCurrentWatermarkMs()
            if watermark >= window_end_ms:
                # the window already expired behind the watermark: a
                # timeout could never legally be armed — emit now,
                # matching the CEP timeout path for an elapsed window
                out.append((mid, pending[1], pending[0]))
                state.remove()
            else:
                state.update(pending)
                # fire when the event-time watermark passes the window end
                state.setTimeoutTimestamp(window_end_ms)
        else:
            state.remove()
        yield pd.DataFrame(out, columns=["mid", "page_id", "ts"])

    return st4_fn


_ST1_BASE_COLS = ("mid", "is_new", "page_id", "last_page_id", "ts")


def correct_is_new(
    events: DataFrame,
    offset_ms: int = SHANGHAI_OFFSET_MILLIS,
    ts_per_ms: int = 1,
) -> DataFrame:
    """ST1: per-mid stateful is_new rewrite (streaming form).

    Any column beyond the visitor five (e.g. a serialized payload the
    job wants to carry through the correction) passes through untouched
    and appears in the output schema.
    """
    extras = [f for f in events.schema.fields if f.name not in _ST1_BASE_COLS]
    out_schema = StructType(list(VISITOR_EVENT_SCHEMA.fields) + extras)
    ordered = events.select(*_ST1_BASE_COLS, *[f.name for f in extras])
    return ordered.groupBy("mid").applyInPandasWithState(
        make_st1_fn(offset_ms, ts_per_ms),
        outputStructType=out_schema,
        stateStructType=_ST1_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_unique_visitors(
    events: DataFrame,
    offset_ms: int = SHANGHAI_OFFSET_MILLIS,
    ts_per_ms: int = 1,
) -> DataFrame:
    """ST2: emit the first event per (mid, day) — exact reference semantics.

    (The idiomatic high-throughput alternative is
    ``withWatermark(...).dropDuplicatesWithinWatermark(["mid", "dt"])``
    — same output under ordered input, bounded state via watermark.)
    """
    return events.groupBy("mid").applyInPandasWithState(
        make_st2_fn(offset_ms, ts_per_ms),
        outputStructType=VISITOR_EVENT_SCHEMA,
        stateStructType=_ST2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def detect_bounces(
    events: DataFrame, window: int = BOUNCE_WINDOW_MS, ts_per_ms: int = 1
) -> DataFrame:
    """ST4: streaming bounce stream from a watermarked page-log DataFrame.

    ``events`` needs columns (mid, page_id, last_page_id, ts) and an
    event-time watermark already assigned (ST3) so EventTimeTimeout can
    fire for idle keys. ``window`` is in the units of ``ts``;
    ``ts_per_ms`` converts ts units to epoch ms (1000 for µs ts).
    """
    return events.groupBy("mid").applyInPandasWithState(
        make_st4_fn(window, ts_per_ms),
        outputStructType=BOUNCE_OUTPUT_SCHEMA,
        stateStructType=_ST4_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# bounded behavioral-sequence accumulator (streaming face of
# operators/export.py::export_user_event_sequences)
# ---------------------------------------------------------------------------

SEQ_EVENT_SCHEMA = "user_id bigint, event_type string, event_id bigint, ts bigint"
SEQ_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, seq string"
_SEQ_STATE = "buf string, n bigint"


def make_seq_fn(cap: int):
    """Per-user bounded sequence accumulator: state = (the cap smallest
    accepted events as a JSON list of [ts, event_id, event_type], total
    event count). Each batch emits the user's CURRENT snapshot row — a
    changelog the sink compacts by keeping the last row per user
    (exactly one row under a single-batch run).

    Late events MERGE-INSERT (r4 ADVICE): a batch's events are merged
    into the stored buffer and the buffer re-truncated to the cap
    smallest by (ts, event_id) — so an earlier-ts event arriving in a
    later batch lands in its correct position and the latest snapshot
    still equals the batch answer under ANY arrival order, not just
    in-order delivery. Eviction is permanent and sound: an event cut at
    the cap boundary was outside the cap smallest then, and the
    boundary only moves earlier as more events arrive. State stays
    bounded by the cap (~cap × tuple bytes) with no watermark needed —
    arbitrarily-late events are handled exactly, they just re-emit the
    user's snapshot row.
    """

    def seq_fn(key, pdfs, state):
        import json

        import pandas as pd

        buf_s, n = state.get if state.exists else ("[]", 0)
        buf = json.loads(buf_s)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        whole = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        )
        n += len(whole)
        for row in whole.itertuples(index=False):
            buf.append(
                [
                    None if pd.isna(row.ts) else int(row.ts),
                    None if pd.isna(row.event_id) else int(row.event_id),
                    None if row.event_type is None else str(row.event_type),
                ]
            )
        # NULLs last, matching the previous pandas NaN-last sort (and
        # the DuckDB oracle's ORDER BY default)
        buf.sort(
            key=lambda r: (r[0] is None, r[0] or 0, r[1] is None, r[1] or 0)
        )
        del buf[cap:]
        # NULL event types consume their cap slot but add no token —
        # exactly concat_ws/string_agg null semantics in the batch form
        # and its oracle
        seq = ">".join(t for _, _, t in buf if t is not None)
        state.update((json.dumps(buf), int(n)))
        yield pd.DataFrame(
            [(key[0], int(n), seq)], columns=["user_id", "n_events", "seq"]
        )

    return seq_fn


def build_user_sequences(events: DataFrame, cap: int = 64) -> DataFrame:
    """Streaming behavioral-sequence export: per-user capped
    ``event_type`` prefix in (ts, event_id) order plus the running
    total, emitted as a per-batch snapshot changelog.

    Input columns: ``SEQ_EVENT_SCHEMA``. Latest row per user ≡ the
    batch ``export_user_event_sequences`` answer over the stream so
    far, under arbitrary (including late / out-of-order) arrival —
    pinned by the parity oracle and the cross-batch late-event test."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_seq_fn(cap),
        outputStructType=SEQ_OUTPUT_SCHEMA,
        stateStructType=_SEQ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
