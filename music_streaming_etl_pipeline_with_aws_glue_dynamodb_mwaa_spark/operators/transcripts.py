"""Session-transcript assembly — SFT/chat-style training-record shaping.

Not in the reference surface (its events never leave row grain —
``REF/glue_jobs/transform.py`` only aggregates); this is the
training-data-pipeline operator that turns a raw event stream into ordered
per-conversation records: the shape an SFT/dialog corpus builder needs
(group a user's events into sessions, emit each session as ONE record whose
body is the ordered turn sequence).

Determinism contract (oracle-exact):
- ordering inside a session is (ts, event_id) — the same total order the
  sessionizer itself uses, so ties are broken identically on both engines;
- the ordered fold is ``array_sort(collect_list(struct(ts, event_id,
  turn)))`` — struct comparison is field-by-field, so the sort key IS
  (ts, event_id) and ``collect_list``'s nondeterministic arrival order is
  irrelevant;
- turns are coalesced to '' before assembly so a NULL turn cannot make
  Spark's ``array_join`` (skips nulls) and SQL ``string_agg`` (skips nulls)
  disagree about separator placement.

Scale: one shuffle by user (the sessionizer's window), then one partial-agg
groupBy on (user, session). A session's transcript is bounded by session
length — state per group is O(session events), never corpus-wide. The
pattern-mining step reduces to (pattern → counts) with map-side partials;
the transcript string itself is the grouping key, which is fine because
patterns worth mining are short — a length valve caps pathological sessions
before the string ever keys an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import sessions


def session_transcripts(events: DataFrame, *, user_col: str = "user_id",
                        ts_col: str = "ts", order_tiebreak: str = "event_id",
                        turn_col: str = "event_type",
                        gap_seconds: int = 8 * 3600,
                        sep: str = " -> ") -> DataFrame:
    """One record per (user, session): turn count, start, ordered transcript."""
    s = sessions.sessionize(events, user_col=user_col, ts_col=ts_col,
                            order_tiebreak=order_tiebreak,
                            gap_seconds=gap_seconds)
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias("t"),
        F.col(order_tiebreak).alias("k"),
        F.coalesce(F.col(turn_col).cast("string"), F.lit("")).alias("turn"),
    )))
    return s.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts_col).alias("started"),
        F.array_join(F.transform(ordered, lambda x: x["turn"]), sep)
        .alias("transcript"),
    )


def transcript_pattern_counts(events: DataFrame, *, min_sessions: int = 2,
                              max_turns: int = 64,
                              **kwargs) -> DataFrame:
    """Repeated behavioral patterns: transcripts shared by ≥ ``min_sessions``
    sessions, with session and distinct-user support. ``max_turns`` keeps a
    pathological mega-session's transcript from keying the exchange."""
    t = session_transcripts(events, **kwargs)
    return (
        t.where(F.col("n_turns") <= max_turns)
        .groupBy("transcript", "n_turns")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.countDistinct("user_id").alias("n_users"))
        .where(F.col("n_sessions") >= min_sessions)
    )
