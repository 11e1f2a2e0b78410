"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` (SURVEY.md §2.8 capability extension).

The batch engine already sessionizes with a lag window
(`events_sessions`); a live stream can't, because a session only ends
when you *know* no more events are coming. That knowledge is state +
watermark: per user, keep the open session (start, last_ts, count);
close it when a later event arrives past the gap, or when the event
-time timeout fires because the watermark passed last_ts + gap.

Semantics contract (the reference defines none — SURVEY §7.3 hard
part #2): events later than the watermark are dropped by Spark before
reaching the operator; sessions are emitted exactly once, on close;
an engine restart resumes from checkpointed state.

Scale: state is one tiny tuple per ACTIVE user (not per event), hash
-partitioned by user_id across executors; the timeout sweep is per
-partition. This is the standard shape for billions of keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (session_start_us, last_ts_us, n_events) — microseconds since epoch;
# timestamps don't round-trip through state, longs do.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

DEFAULT_GAP_SECONDS = 1800


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    closed: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        # watermark passed last_ts + gap with no new events: the open
        # session is definitively over
        start_us, last_us, n = state.get
        closed.append((start_us, last_us, n))
        state.remove()
    else:
        cur = state.get if state.exists else None
        rows = pd.concat(list(batches), ignore_index=True)
        # arrival order within a batch is arbitrary; session logic
        # needs event-time order per key
        # normalize to µs explicitly — Arrow hands pandas datetime64[ns]
        # today but [us] under newer pandas defaults, and a bare
        # astype(int64) silently changes meaning with the unit
        ts_us = (
            rows["ts"].sort_values().astype("datetime64[us]").astype("int64")
        ).tolist()
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # close the dangling session when event time moves past
            # last_ts + gap (fires on the watermark, exactly once)
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user gap sessionization over a streaming events frame.
    Emits one row per CLOSED session (append mode); open sessions live
    in checkpointed state until the watermark closes them."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_us)

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
