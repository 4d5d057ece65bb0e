"""Ordered-funnel, cohort-retention, and inter-event-gap analytics over an
event stream (training-data/product-analytics extension, SURVEY.md §7
E-class).

The reference aggregates play events per (day, genre) only
(``REF/glue_jobs/transform.py``); real event pipelines also ask sequence
questions — "who viewed, then clicked, then purchased?", "how many of the
day-D signups were still active on day D+k?", "what is the gap distribution
between a user's events?". All three are expressible as single-shuffle
window plans; none needs a self-join.

Spark-first shape:

- **Funnel**: one hash exchange on user, then a CHAIN of Window nodes over
  the same partitioning (stage k's first-completion time conditions on
  stage k−1's — Catalyst stacks the windows on one exchange, no re-shuffle).
  This is strictly-ordered funnel semantics: stage k counts only events
  strictly AFTER the user's stage-k−1 completion.
- **Cohort retention**: min-date window on the same user partitioning, then
  a (cohort_day, offset) roll-up — two exchanges total.
- **Inter-event gaps**: one ordered window (lag of the microsecond epoch,
  exact int64), then a per-user integer aggregation riding the same
  exchange. Equal-timestamp ties cannot perturb the result: the sorted
  timestamp SEQUENCE is unique as a multiset, so the lag deltas are
  order-deterministic even when individual tied rows swap.

Scale posture (100 TB): everything partitions by user — billions of small
groups, no skew beyond bot-grade single users; state per group is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_stages(events: DataFrame, steps: list[str], *,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """One row per user: the first time they completed each funnel stage,
    where stage k must occur STRICTLY after the user's stage-k−1 first
    completion (NULL from the first missing stage onward)."""
    df = events.select(user_col, ts_col, type_col)
    w = Window.partitionBy(user_col)
    prev = None
    for i, step in enumerate(steps, 1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"t{i}"
    stage_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    return df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in stage_cols])


def funnel_conversion(events: DataFrame, steps: list[str], *,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """Per-stage reach: (stage_idx, step, n_users, frac_of_entry) — users
    with a non-NULL stage time, and that count over the stage-1 count (one
    IEEE division of exact longs, oracle-portable)."""
    stages = funnel_user_stages(events, steps, user_col=user_col,
                                ts_col=ts_col, type_col=type_col)
    counts = stages.agg(*[F.count(f"t{i}").alias(f"c{i}")
                          for i in range(1, len(steps) + 1)])
    stack_args = ", ".join(
        f"{i}, '{step}', c{i}" for i, step in enumerate(steps, 1))
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) as (stage_idx, step, n_users)",
        "c1 as _c1",
    ).select(
        "stage_idx", "step", "n_users",
        (F.col("n_users").cast("double") / F.col("_c1").cast("double"))
        .alias("frac_of_entry"),
    )


def event_transitions(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    (from_event, to_event, n, prob) where ``to_event`` is each user's NEXT
    event in (``ts_col``, ``id_col``) order and ``prob`` is the row-
    normalized share of ``from_event``'s outgoing transitions.

    Plan: one hash exchange on user for the ``lead`` window, then a
    (from, to) hash agg whose partial (map-side combine) collapses the
    stream to ≤ |event-type|² rows BEFORE the second exchange — at 100 TB
    the second shuffle moves kilobytes. The row total for ``prob`` rides a
    Window over the tiny aggregated frame, not the fact.

    ``id_col`` breaks timestamp ties deterministically (oracle-portable:
    the same ORDER BY in SQL's ``lead``); the last event of each user has
    no successor and contributes no pair. ``prob`` is ONE IEEE division of
    two exact longs — hash-comparable across engines.
    """
    nxt = F.lead(type_col).over(
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc()))
    pairs = (events.select(F.col(type_col).alias("from_event"),
                           nxt.alias("to_event"))
             .where(F.col("to_event").isNotNull()))
    agg = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("from_event"))
    return agg.select(
        "from_event", "to_event", "n",
        (F.col("n").cast("double") / tot.cast("double")).alias("prob"))


def cohort_retention(events: DataFrame, *, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_day, day_offset, n_users): distinct users from each first-seen
    cohort active again ``day_offset`` days later. ``day_offset = 0`` row is
    the cohort size itself (every user is active on their first day)."""
    d = events.select(F.col(user_col).alias("_u"),
                      F.to_date(ts_col).alias("_day"))
    d = d.withColumn("cohort_day",
                     F.min("_day").over(Window.partitionBy("_u")))
    return (d.groupBy("cohort_day",
                      F.datediff("_day", "cohort_day").alias("day_offset"))
            .agg(F.countDistinct("_u").alias("n_users")))


def interevent_stats(events: DataFrame, *, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Per-user inter-event gap profile: (n_events, n_gaps, sum/min/max gap
    in exact microseconds, mean gap as ONE division). Single-event users
    surface with zero gaps and NULL extrema rather than dropping out."""
    us = F.unix_micros(F.col(ts_col))
    wo = Window.partitionBy(user_col).orderBy(us.asc())
    gap = (us - F.lag(us).over(wo)).alias("_gap")
    base = events.select(F.col(user_col).alias("user_id"), gap)
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("_gap").alias("n_gaps"),
        F.sum("_gap").alias("sum_gap_us"),
        F.min("_gap").alias("min_gap_us"),
        F.max("_gap").alias("max_gap_us"),
    )
    return agg.withColumn(
        "mean_gap_us",
        F.when(F.col("n_gaps") > 0,
               F.col("sum_gap_us").cast("double")
               / F.col("n_gaps").cast("double")))
