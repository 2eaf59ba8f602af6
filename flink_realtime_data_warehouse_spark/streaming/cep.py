"""Generic event-sequence pattern matching (CEP) — a MATCH_RECOGNIZE-lite.

Generalizes the reference's single CEP topology (bounce detection:
``begin(entry).next(entry).within(10s)`` + timeout side-output,
DwdTrafficUserJumpDetail.java:88-136) to arbitrary N-step patterns:

- ``steps``: N boolean predicates (SQL strings or Columns) evaluated
  JVM-side into flag columns BEFORE the stateful operator — the Python
  kernel only ever sees (ts, flags, payload), so predicate evaluation
  stays in whole-stage codegen and the pattern can use any expression.
- ``contiguity``: ``"strict"`` (Flink ``next`` — a non-matching event
  in-window breaks the partial match) or ``"relaxed"`` (Flink
  ``followedBy`` — non-matching events are skipped).
- ``within``: max ``ts`` distance from the first matched event; a
  partial match whose window elapses is emitted on the timeout path
  (``kind='timeout'`` with the steps completed) when ``emit_timeouts``,
  mirroring the reference's ``OutputTag`` timeout stream.
- After a completed match the final event can re-arm as a new sequence
  start (``rearm_last``, Flink's skip-to-next overlap) — this is what
  makes the bounce pattern (entry,entry) chain correctly.

Two execution forms share the same kernel logic:

- ``match_sequence``  — streaming ``applyInPandasWithState`` with
  EventTimeTimeout so idle-key partials still emit when the watermark
  passes their window end (the input must carry a watermark, same
  contract as ``detect_bounces``).
- ``match_sequence_batch`` — ``applyInPandas`` over the full per-key
  history (the 100 TB backfill shape: one shuffle on the key, Arrow in,
  a single linear pass per group); end-of-history pending partials are
  timeouts, because no further event can complete them.

Output rows: (key, kind, step_count, ts0, last_ts, payload0) — kind in
{'match','timeout'}, ts0/payload0 from the sequence's FIRST event
(what the reference's select/timeout functions both emit, :112-131).

The existing bounce operator is the 2-step instance: see
tests/test_state_ops.py::test_match_sequence_reproduces_bounce_fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MATCH_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("kind", StringType(), True),
        StructField("step_count", IntegerType(), True),
        StructField("ts0", LongType(), True),
        StructField("last_ts", LongType(), True),
        StructField("payload0", StringType(), True),
    ]
)

_MATCH_STATE = StructType(
    [
        StructField("step_idx", IntegerType(), True),
        StructField("ts0", LongType(), True),
        StructField("last_ts", LongType(), True),
        StructField("payload0", StringType(), True),
    ]
)

_OUT_COLS = ["key", "kind", "step_count", "ts0", "last_ts", "payload0"]


def _flag_cols(n_steps: int) -> list[str]:
    return [f"_ms_step_{i}" for i in range(n_steps)]


def _make_sequence_stepper(n_steps: int, within: int, strict: bool,
                           emit_timeouts: bool, rearm_last: bool):
    """The per-event transition function, shared by both kernels.

    Self-contained (no module references) so cloudpickle ships it BY
    VALUE inside the enclosing kernels — executor workers of a
    driver-created session cannot import this package.

    pending = (step_idx, ts0, last_ts, payload0) or None; returns the
    new pending and appends any emission to ``out``.
    """

    def step(pending, flags, ts, payload, key, out):
        if pending is not None and ts - pending[1] > within:
            # window elapsed before this event: CEP timeout path
            if emit_timeouts:
                out.append((key, "timeout", pending[0], pending[1], pending[2], pending[3]))
            pending = None
        if pending is not None:
            si = pending[0]
            if flags[si]:
                si += 1
                if si == n_steps:
                    out.append((key, "match", n_steps, pending[1], ts, pending[3]))
                    pending = (1, ts, ts, payload) if (rearm_last and flags[0]) else None
                else:
                    pending = (si, pending[1], ts, pending[3])
            elif strict:
                # Flink `next`: the pattern is broken; the breaking
                # event may itself start a fresh sequence
                pending = (1, ts, ts, payload) if flags[0] else None
            # relaxed (`followedBy`): skip the event, keep the partial
        else:
            if flags[0]:
                pending = (1, ts, ts, payload)
        return pending

    return step


def _make_match_sequence_fn(n_steps: int, within: int, ts_per_ms: int,
                            strict: bool, emit_timeouts: bool, rearm_last: bool):
    """Streaming kernel factory (applyInPandasWithState, EventTimeTimeout)."""
    step = _make_sequence_stepper(n_steps, within, strict, emit_timeouts, rearm_last)
    flag_names = [f"_ms_step_{i}" for i in range(n_steps)]

    def fn(key, pdfs, state):
        import pandas as pd

        k = key[0]
        out: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                si, ts0, last_ts, p0 = state.get
                if emit_timeouts and si >= 1:
                    out.append((k, "timeout", si, ts0, last_ts, p0))
            state.remove()
            yield pd.DataFrame(out, columns=_OUT_COLS)
            return

        pending = tuple(state.get) if state.exists else None
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            whole = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ).sort_values(["_ms_ts", "_ms_ord"], kind="mergesort")
            ts_arr = whole["_ms_ts"].to_numpy()
            pay_arr = whole["_ms_payload"].to_numpy()
            flags_arr = whole[flag_names].to_numpy(dtype=bool)
            for i in range(len(ts_arr)):
                pending = step(
                    pending, flags_arr[i], int(ts_arr[i]), pay_arr[i], k, out
                )

        if pending is not None:
            # GroupState watermarks/timeouts are MILLISECOND-based; ceil
            # so the timeout never fires before the window truly ends
            window_end_ms = -(-(pending[1] + within) // ts_per_ms)
            if state.getCurrentWatermarkMs() >= window_end_ms:
                if emit_timeouts and pending[0] >= 1:
                    out.append((k, "timeout", pending[0], pending[1], pending[2], pending[3]))
                state.remove()
            else:
                state.update(pending)
                state.setTimeoutTimestamp(window_end_ms)
        else:
            state.remove()
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def _make_match_sequence_batch_fn(n_steps: int, within: int, strict: bool,
                                  emit_timeouts: bool, rearm_last: bool):
    """Batch kernel factory (applyInPandas over the full key history)."""
    step = _make_sequence_stepper(n_steps, within, strict, emit_timeouts, rearm_last)
    flag_names = [f"_ms_step_{i}" for i in range(n_steps)]

    def fn(pdf):
        import pandas as pd

        out: list[tuple] = []
        pending = None
        k = pdf["_ms_key"].iloc[0]
        ordered = pdf.sort_values(["_ms_ts", "_ms_ord"], kind="mergesort")
        ts_arr = ordered["_ms_ts"].to_numpy()
        pay_arr = ordered["_ms_payload"].to_numpy()
        flags_arr = ordered[flag_names].to_numpy(dtype=bool)
        for i in range(len(ts_arr)):
            pending = step(pending, flags_arr[i], int(ts_arr[i]), pay_arr[i], k, out)
        if pending is not None and emit_timeouts and pending[0] >= 1:
            # complete history: nothing can finish this partial → timeout
            out.append((k, "timeout", pending[0], pending[1], pending[2], pending[3]))
        return pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def _with_pattern_cols(
    events: DataFrame,
    steps: list,
    key_col: str,
    ts_col: str,
    payload_col: str | None,
    order_col: str | None,
) -> DataFrame:
    """Attach JVM-evaluated helper columns; original columns (incl. any
    watermark column) pass through untouched."""
    df = (
        events.withColumn("_ms_key", F.col(key_col).cast("string"))
        .withColumn("_ms_ts", F.col(ts_col).cast("long"))
        .withColumn(
            "_ms_ord",
            F.col(order_col).cast("long") if order_col else F.lit(0).cast("long"),
        )
        .withColumn(
            "_ms_payload",
            F.col(payload_col).cast("string")
            if payload_col
            else F.lit(None).cast("string"),
        )
    )
    for i, s in enumerate(steps):
        pred: Column = F.expr(s) if isinstance(s, str) else s
        df = df.withColumn(f"_ms_step_{i}", F.coalesce(pred.cast("boolean"), F.lit(False)))
    return df


def match_sequence(
    events: DataFrame,
    steps: list,
    within: int,
    key_col: str = "mid",
    ts_col: str = "ts",
    payload_col: str | None = None,
    order_col: str | None = None,
    ts_per_ms: int = 1,
    contiguity: str = "strict",
    emit_timeouts: bool = True,
    rearm_last: bool = True,
) -> DataFrame:
    """Streaming N-step sequence matcher (see module docstring).

    ``events`` must already carry an event-time watermark (ST3) so
    EventTimeTimeout can flush idle-key partials; ``within`` is in the
    units of ``ts_col`` and ``ts_per_ms`` converts those units to epoch
    milliseconds for the GroupState timeout clock.
    """
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(f"contiguity must be strict|relaxed, got {contiguity!r}")
    flat = _with_pattern_cols(events, steps, key_col, ts_col, payload_col, order_col)
    return flat.groupBy("_ms_key").applyInPandasWithState(
        _make_match_sequence_fn(
            len(steps), within, ts_per_ms, contiguity == "strict",
            emit_timeouts, rearm_last,
        ),
        outputStructType=MATCH_OUTPUT_SCHEMA,
        stateStructType=_MATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def match_sequence_batch(
    events: DataFrame,
    steps: list,
    within: int,
    key_col: str = "mid",
    ts_col: str = "ts",
    payload_col: str | None = None,
    order_col: str | None = None,
    contiguity: str = "strict",
    emit_timeouts: bool = True,
    rearm_last: bool = True,
) -> DataFrame:
    """Batch/backfill form of ``match_sequence`` — one shuffle on the
    key, a linear Arrow pass per group, identical emissions."""
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(f"contiguity must be strict|relaxed, got {contiguity!r}")
    flat = _with_pattern_cols(events, steps, key_col, ts_col, payload_col, order_col)
    # explicit key repartition: the Python stage is CPU-bound per group,
    # and AQE's byte-based coalescing would otherwise collapse a compact
    # shuffle (100k rows ≈ a few MB) onto a handful of tasks, serializing
    # the kernel. applyInPandas reuses this clustering — no extra
    # exchange appears (4.7 s → 1.8 s at sf0.1 on local[32]).
    n_parts = int(flat.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    flat = flat.repartition(n_parts, "_ms_key")
    return flat.groupBy("_ms_key").applyInPandas(
        _make_match_sequence_batch_fn(
            len(steps), within, contiguity == "strict", emit_timeouts, rearm_last
        ),
        schema=MATCH_OUTPUT_SCHEMA,
    )
