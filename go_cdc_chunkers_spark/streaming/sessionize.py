"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState.

The batch equivalent (entry_queries.events_sessionization: lag + gap cumsum,
30-minute gap) is oracle-checked against DuckDB; this is the continuous
flavor for an always-on ingest. State per user = the open session
(start, last_event, n_events); a new event either extends it or -- when the
gap exceeds `gap_s` -- emits the completed session and opens a new one.
Only *completed* sessions are emitted (append semantics); each user's final
open session stays in state, which is exactly the online contract: a
session is only known complete once a later event (or timeout policy)
closes it.

Scale notes: state is one tiny tuple per active user (not per event), keyed
and shuffled by user_id once; Arrow-batched per group -- no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, sess_start long, sess_end long, n_events long"
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(gap_s: int):
    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = []
        for pdf in pdf_iter:
            for t in sorted(int(v) for v in pdf["t"]):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_s:
                    out.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    # Late arrivals across micro-batches can deliver t < last
                    # (sorting is per-batch only). The session end must never
                    # move backwards -- otherwise a following in-order event
                    # can falsely exceed gap_s and split the session -- and a
                    # pre-start straggler within the gap widens the session
                    # leftwards instead of corrupting its span.
                    start, last, n = min(start, t), max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
        yield pd.DataFrame(out, columns=["user_id", "sess_start", "sess_end", "n_events"])

    return fn


def streaming_sessionize(events_stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events(user_id, t:long unix seconds) stream -> completed sessions."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
