"""Custom stateful streaming operator: session tracking with
applyInPandasWithState — the escape hatch for semantics Spark's built-in
windowed aggregations can't express (per-key mutable state with timeout
eviction).

State per user: (session_start_us, last_ts_us, n_events, total_value).
An event extends the current session if it arrives within the gap
timeout; otherwise the closed session is emitted and a new one starts.
On processing-time timeout the open session is flushed. State size is
O(active users), bounded by the timeout — the watermark analogue for
custom operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000

STATE_SCHEMA = "session_start_us long, last_ts_us long, n_events long, total_value double"
OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double, closed_by string"
)


def _track_sessions(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    rows = []

    def emit(start_us, end_us, n, total, reason):
        rows.append(
            {
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n,
                "total_value": total,
                "closed_by": reason,
            }
        )

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, total = state.get
            emit(start_us, last_us, n, total, "timeout")
            state.remove()
        yield pd.DataFrame(rows, columns=[c.split()[0] for c in OUTPUT_SCHEMA.split(", ")])
        return

    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = None
        n, total = 0, 0.0

    events = pd.concat(list(pdf_iter)).sort_values("ts")
    for ts, value in zip(events["ts"], events["value"]):
        ts_us = int(pd.Timestamp(ts).value // 1_000)
        if last_us is not None and ts_us - last_us > SESSION_GAP_US:
            emit(start_us, last_us, n, total, "gap")
            start_us, n, total = ts_us, 0, 0.0
        if start_us is None:
            start_us = ts_us
        last_us = ts_us
        n += 1
        total += float(value)

    state.update((start_us, last_us, n, total))
    state.setTimeoutDuration(60 * 60 * 1000)  # flush stale sessions after 1h idle
    yield pd.DataFrame(rows, columns=[c.split()[0] for c in OUTPUT_SCHEMA.split(", ")])


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) stream -> closed-session records."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track_sessions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
