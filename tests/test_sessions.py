"""Gap-based sessionization (operators.sessions).

Invariants: a session breaks exactly where the inter-event silence exceeds
the gap; indices are per-user monotone from 0; stats bound each session.
"""

from __future__ import annotations

import datetime

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sessions

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, u, T0 + datetime.timedelta(seconds=s)) for eid, u, s in rows],
        "event_id long, user_id long, ts timestamp",
    )


def test_session_breaks_at_gap(spark):
    # user 1: events at 0s, 100s, 4000s (gap 3900 > 3600 -> new session),
    # 4100s; user 2: single event.
    ev = _events(spark, [(1, 1, 0), (2, 1, 100), (3, 1, 4000), (4, 1, 4100),
                         (5, 2, 0)])
    out = sessions.sessionize(ev, gap_seconds=3600)
    got = {r["event_id"]: (r["session_idx"], r["session_id"])
           for r in out.collect()}
    assert got[1] == (0, "1#0")
    assert got[2] == (0, "1#0")
    assert got[3] == (1, "1#1")
    assert got[4] == (1, "1#1")
    assert got[5] == (0, "2#0")


def test_gap_exactly_at_threshold_does_not_break(spark):
    ev = _events(spark, [(1, 1, 0), (2, 1, 3600)])
    out = sessions.sessionize(ev, gap_seconds=3600)
    assert {r["session_idx"] for r in out.collect()} == {0}


def test_session_stats(spark):
    ev = _events(spark, [(1, 1, 0), (2, 1, 100), (3, 1, 4000), (4, 1, 4100),
                         (5, 2, 7)])
    out = sessions.session_stats(ev, gap_seconds=3600)
    got = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration_secs"])
           for r in out.collect()}
    assert got == {(1, 0): (2, 100), (1, 1): (2, 100), (2, 0): (1, 0)}


def test_ties_break_on_event_id(spark):
    # two events at the identical timestamp: ordering must be stable by id
    ev = _events(spark, [(2, 1, 0), (1, 1, 0), (3, 1, 5000)])
    out = sessions.sessionize(ev, gap_seconds=3600)
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_session_window_stats_matches_sessionize(spark):
    """Away from the exact-gap boundary, session_window produces the same
    sessions as the lag/cumsum formulation."""
    ev = _events(spark, [(1, 1, 0), (2, 1, 100), (3, 1, 4000), (4, 1, 4100),
                         (5, 2, 7)])
    a = {(r["user_id"], str(r["session_start"])): (r["n_events"], r["duration_secs"])
         for r in sessions.session_stats(ev, gap_seconds=3600).collect()}
    b = {(r["user_id"], str(r["session_start"])): (r["n_events"], r["duration_secs"])
         for r in sessions.session_window_stats(ev, gap_seconds=3600).collect()}
    assert a == b


def _reference_sessionize(rows, gap):
    """Pure-Python oracle: rows = [(event_id, user_id, secs)]."""
    out = {}
    by_user = {}
    for eid, u, s in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(u, []).append((eid, s))
    for u, evs in by_user.items():
        idx, prev = 0, None
        for eid, s in evs:
            if prev is not None and s - prev > gap:
                idx += 1
            out[eid] = (u, idx)
            prev = s
    return out


def test_sessionize_property_random_gaps(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 4), st.integers(0, 10**5)),
        min_size=1, max_size=40, unique_by=lambda r: r[0]),
        gap=st.integers(1, 10**4))
    def prop(rows, gap):
        got = {r["event_id"]: (r["user_id"], r["session_idx"])
               for r in sessions.sessionize(
                   _events(spark, rows), gap_seconds=gap).collect()}
        assert got == _reference_sessionize(rows, gap)

    prop()
