"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` (★ extension; the reference has no streaming
surface at all — this is the streaming twin of the batch
`events_sessionize` query in vicinity_spark/queries.py).

Why a custom stateful operator: a session window closes only when no
event arrives for `gap` — that is per-key *state across micro-batches*,
not a tumbling/sliding window, so it cannot be expressed as a
watermarked groupBy aggregation. The state (open session per key) lives
in the state store; late data is bounded by the watermark; sessions
with no successor event are flushed by an event-time timeout.

Output (append mode) emits only *closed* sessions: a session closes
when a later event for the same key arrives past the gap, or when the
event-time timeout fires (watermark passed last_ts + gap).

Late-data semantics: a watermark-admitted late event folds into the
currently-open session with min/max bounds (it can extend
session_start backwards; it never drags session_end or the flush
timeout backwards). An event older than an already-*emitted* session
cannot reopen it — append mode can't retract output — so it joins the
open session instead; that is the standard append-mode trade-off.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "key bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = (
    "session_start timestamp, last_ts timestamp, n_events bigint, total_value double"
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(key, session_start, session_end, n_events, total_value) — one
    row per CLOSED session, keyed state carried across micro-batches."""
    gap = pd.Timedelta(minutes=gap_minutes)
    gap_ms = int(gap.total_seconds() * 1000)

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = int(key[0])
        cols = ["key", "session_start", "session_end", "n_events", "total_value"]
        if state.hasTimedOut:
            s, last, n, v = state.get
            state.remove()
            yield pd.DataFrame([[k, s, last, n, v]], columns=cols)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        if state.exists:
            s, last, n, v = state.get
            s, last = pd.Timestamp(s), pd.Timestamp(last)
        else:
            s, last, n, v = None, None, 0, 0.0
        closed = []
        for ts, val in zip(rows[ts_col], rows[value_col]):
            if last is not None and (ts - last) > gap:
                closed.append([k, s, last, n, v])
                s, last, n, v = None, None, 0, 0.0
            # fold with min/max: a watermark-admitted late event (ts
            # before the open session's bounds, arriving in a LATER
            # micro-batch) must extend the session backwards, never
            # drag `last` — and the event-time timeout — backwards
            # into a premature flush
            s = ts if s is None else min(s, ts)
            last = ts if last is None else max(last, ts)
            n += 1
            v += float(val) if val is not None else 0.0
        state.update((s.to_pydatetime(), last.to_pydatetime(), int(n), float(v)))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(int(last.value // 1_000_000) + gap_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
