"""Custom stateful streaming operators via applyInPandasWithState.

Charter extension: arbitrary per-key state the built-in window aggs can't
express — here a running per-user accumulator (event count, value sum,
last event type/time) that emits the refreshed state every micro-batch.

Scale posture: state lives in the executor state store partitioned by the
grouping key (one shuffle to co-locate a key's events); the pandas hook
sees one key's batch rows at a time, so memory is bounded per key, and a
timeout policy (not needed for this accumulator) would bound total state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) emitted as updates each micro-batch.
    Input needs columns (user_id, value)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# event-time-timeout sessionizer (emit-on-close)
# ---------------------------------------------------------------------------

SESSION_STATE = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),   # ms epoch
        T.StructField("lasts", T.ArrayType(T.LongType())),    # ms epoch
        T.StructField("ns", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
    ]
)

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _merge_sessions(sessions: list, gap_ms: int) -> list:
    """Merge (start, last, n, total) runs whose next start falls strictly
    inside the previous session's [start, last+gap) extent — the same
    half-open semantics as F.session_window."""
    sessions.sort(key=lambda s: (s[0], s[1]))
    out: list = []
    for s in sessions:
        if out and s[0] < out[-1][1] + gap_ms:
            p = out[-1]
            out[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
        else:
            out.append(s)
    return out


def make_sessionizer(gap_ms: int, session_tz: str = "UTC"):
    """Build the applyInPandasWithState hook for :func:`sessionize_stream`.

    `session_tz` must be the session's `spark.sql.session.timeZone`:
    Arrow delivers event-time to the worker as tz-NAIVE wall time in the
    session zone, while `state.getCurrentWatermarkMs()` is true epoch
    ms — a naive `astype(int64)` silently shifts every event by the zone
    offset and closes sessions early/late (found by the hostile non-UTC
    parity run: +79 premature closes under America/New_York)."""

    def _fn(key, pdfs, state):
        open_sessions = (
            [
                (s, l, n, v)
                for s, l, n, v in zip(*state.get)
            ]
            if state.exists
            else []
        )
        for pdf in pdfs:
            ser = pd.to_datetime(pdf["ts"])
            if ser.dt.tz is None:
                # session-local wall time → true epoch (see docstring);
                # pragmatic DST options: repeated wall hour reads as DST,
                # skipped hour shifts forward — deterministic either way
                ser = ser.dt.tz_localize(
                    session_tz, ambiguous=True, nonexistent="shift_forward"
                )
            ts_ms = (ser.astype("int64") // 1_000_000).tolist()
            vals = pdf["value"].fillna(0.0).tolist()
            open_sessions.extend(
                (t, t, 1, float(v)) for t, v in zip(ts_ms, vals)
            )
        open_sessions = _merge_sessions(open_sessions, gap_ms)
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in open_sessions if s[1] + gap_ms <= wm]
        still_open = [s for s in open_sessions if s[1] + gap_ms > wm]
        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                    [s[3] for s in still_open],
                )
            )
            # wake when the earliest open session can close (must be
            # strictly ahead of the current watermark)
            state.setTimeoutTimestamp(
                max(min(s[1] + gap_ms for s in still_open), wm + 1)
            )
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_ms": [s[0] for s in closed],
                    "session_end_ms": [s[1] + gap_ms for s in closed],
                    "n_events": [s[2] for s in closed],
                    "total_value": [s[3] for s in closed],
                }
            )

    return _fn


def sessionize_stream(
    stream: DataFrame, gap_ms: int = 30 * 60 * 1000, key_col: str = "user_id"
) -> DataFrame:
    """Emit-on-close sessionization: per-key session state merges events
    across micro-batches (out-of-order within the watermark included)
    and each session is emitted EXACTLY ONCE, when the event-time
    watermark passes its close — semantics the built-in
    ``session_window`` aggregation only gives in append mode, here with
    arbitrary per-session state available for enrichment.

    Scale posture: one shuffle co-locates each key's events; state is a
    handful of (start,last,n,sum) tuples per key, evicted on close via
    EventTimeTimeout — bounded by open sessions, not history. Input
    needs (user_id, ts TIMESTAMP w/ watermark, value)."""
    # no default arg: conf.get(key) resolves the EFFECTIVE session zone
    # (JVM default when unset); conf.get(key, "UTC") would return the
    # literal "UTC" on any session that never set the key explicitly —
    # exactly the hostile-session case this conversion exists for
    session_tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
    return stream.groupBy(key_col).applyInPandasWithState(
        make_sessionizer(gap_ms, session_tz),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
