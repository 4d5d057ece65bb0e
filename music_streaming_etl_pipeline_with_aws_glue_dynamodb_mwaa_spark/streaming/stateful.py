"""Custom stateful streaming operator: per-user closed-session emission via
``applyInPandasWithState`` (SURVEY.md §2.9 extension surface).

``session_window`` covers windowed session AGGREGATES, but cannot express
cross-batch custom state like "monotone per-user session indices, emit a
session the moment a later event proves it closed". This operator keeps
(session_idx, n_events, start, last) per user in the state store; each
micro-batch folds its events in event-time order, emitting every session that
the arriving events close. The still-open tail session stays in state across
micro-batches (and restarts, via the checkpoint).

Batch equivalence: emitted rows are exactly ``operators.sessions.
session_stats`` rows for sessions whose successor event has arrived —
asserted in tests/test_streaming.py.

Scale: state is O(1) per active user (4 numbers), the shuffle is the same
user-hash partition as the batch operator, and Arrow batches events per
group — no per-row Python round trips.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def closed_sessions(events: DataFrame, *, gap_seconds: int,
                    user_col: str = "user_id",
                    ts_col: str = "ts",
                    late_counter=None) -> DataFrame:
    """Append-mode stream of CLOSED sessions:
    (user, session_idx, n_events, session_start, session_end, duration_secs).

    Second-granularity epoch math, like the batch operator. The final session
    of a user is never emitted (nothing can prove it closed) — callers
    wanting eventual closure add an event-time timeout policy.

    Ordering contract: WITHIN a micro-batch events sort by event time; an
    event arriving in a LATER batch with a timestamp strictly before the
    user's stored tail is LATE beyond the operator's assumption and is
    DROPPED (folding it would silently rewind the tail and merge distinct
    sessions — round-4 review catch). In-order multi-batch streams are
    unaffected. Requires a UTC session timezone: Spark hands Arrow
    session-TZ-naive timestamps and the epoch math reads them as UTC.

    ``late_counter``: optional ``spark.sparkContext.accumulator(0)`` — each
    dropped-late event adds 1, making the silent-drop divergence OBSERVABLE
    (round-5 ADVICE): a caller alarms on ``late_counter.value > 0`` instead
    of discovering skewed session stats downstream. Accumulator semantics
    apply (at-least-once under task retries — a monitoring signal, not an
    exactly-once ledger).
    """
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"closed_sessions requires a UTC session timezone, got {tz!r}: "
            "pandas reads the session-TZ-naive Arrow timestamps as UTC, so "
            "a non-UTC session would shift emitted session bounds by the "
            "full offset")
    # the key column keeps ITS input type (string user ids in the music
    # domain, bigint in the synthetic events table)
    user_type = dict(events.dtypes)[user_col]
    out_schema = (f"{user_col} {user_type}, session_idx long, n_events long, "
                  "session_start timestamp, session_end timestamp, "
                  "duration_secs long")
    state_schema = "session_idx long, n_events long, start long, last long"

    def fold(key, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterable[pd.DataFrame]:
        (user,) = key
        if state.exists:
            idx, n, start, last = state.get
        else:
            idx, n, start, last = 0, 0, None, None
        stamps: list[int] = []
        for pdf in pdfs:
            stamps.extend(int(t.timestamp()) for t in pdf[ts_col])
        stamps.sort()
        closed: list[tuple] = []
        for s in stamps:
            if last is not None and s < last:
                # strictly late beyond the stored tail (cross-batch
                # disorder): folding would rewind `last` and merge
                # sessions — drop; same-second events fold normally
                if late_counter is not None:
                    late_counter.add(1)
                continue
            if last is not None and s - last > gap_seconds:
                closed.append((user, idx, n, start, last, last - start))
                idx, n, start = idx + 1, 0, s
            if start is None:
                start = s
            n, last = n + 1, s
        state.update((idx, n, start, last))
        if closed:
            yield pd.DataFrame(
                closed, columns=[user_col, "session_idx", "n_events",
                                 "_start", "_end", "duration_secs"]
            ).assign(
                session_start=lambda d: pd.to_datetime(d["_start"], unit="s"),
                session_end=lambda d: pd.to_datetime(d["_end"], unit="s"),
            )[[user_col, "session_idx", "n_events", "session_start",
               "session_end", "duration_secs"]]

    return events.groupBy(user_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
