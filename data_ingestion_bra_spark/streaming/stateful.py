"""Custom stateful streaming operator: arbitrary sessionization via
``applyInPandasWithState`` (the escape hatch when ``session_window`` can't
express the semantics — e.g. value-capped sessions, custom emit policy).

State per user: (session_start, last_ts, n_events, sum_value). Sessions are
emitted when the event-time watermark passes last_ts + gap (timeout), so
state is bounded — the property that keeps this runnable on an unbounded
100 TB/day stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

GAP_SECONDS = 600  # 10-minute session gap


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def sessionize_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator with event-time timeout emission."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us * 1000)],
                "session_end": [pd.Timestamp(last_us * 1000)],
                "n_events": [n],
                "sum_value": [round(sv, 2)],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    out_sessions: list[tuple[int, int, int, float]] = []
    if state.exists:
        start_us, last_us, n, sv = state.get
    else:
        start_us, last_us, n, sv = None, None, 0, 0.0

    for ts, value in zip(rows["ts"], rows["value"]):
        t = _us(ts)
        if last_us is not None and t - last_us >= GAP_SECONDS * 1_000_000:
            out_sessions.append((start_us, last_us, n, sv))
            start_us, last_us, n, sv = t, t, 1, float(value)
        else:
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
            sv += float(value)

    state.update((start_us, last_us, n, sv))
    # Emit when the watermark passes session end + gap. Clamp to just past
    # the CURRENT watermark: on an out-of-order replay (backfill files not
    # time-sliced) the watermark may already be beyond session end + gap,
    # and Spark rejects a timeout in the past — such a session should
    # simply time out at the next opportunity.
    timeout_ms = last_us // 1000 + GAP_SECONDS * 1000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

    if out_sessions:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_sessions),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _, _ in out_sessions],
                "session_end": [pd.Timestamp(e * 1000) for _, e, _, _ in out_sessions],
                "n_events": [n_ for _, _, n_, _ in out_sessions],
                "sum_value": [round(v, 2) for _, _, _, v in out_sessions],
            }
        )


def sessionize(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """Custom sessionization over (user_id, ts, value) with event-time
    timeouts. Input may be streaming (with watermark) — one shuffle on
    user_id, state bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
