"""Gap-based sessionization over an event stream (batch form).

Not in the reference surface (its daily grouping is plain ``to_date``
bucketing — ``REF/glue_jobs/transform.py:19,26``); this is the standard
user-behavior operator the engine adds for the events table: consecutive
events of a user belong to one session until a silence gap exceeds the
threshold.

Classic two-window formulation, all JVM expressions:
    new_session = (ts - lag(ts) over user-window) > gap
    session_idx = running sum of new_session over the same window

One shuffle (by user), two window passes over the same partitioning — Spark
reuses the exchange. In streaming mode the same semantics come from
``session_window(ts, gap)`` (see streaming tests); this batch form is the
oracle-comparable one.

Second-granularity epoch math on BOTH engines (Spark ``cast(long)`` ≡ DuckDB
``epoch(date_trunc('second', ts))``) keeps gap comparisons integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import composite_key


def sessionize(events: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", order_tiebreak: str = "event_id",
               gap_seconds: int = 8 * 3600) -> DataFrame:
    """Attach (session_idx, session_id) to every event."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(order_tiebreak).asc())
    epoch = F.col(ts_col).cast("long")
    new_session = F.when(
        epoch - F.lag(epoch).over(w) > gap_seconds, F.lit(1)
    ).otherwise(F.lit(0))
    sess_idx = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    return events.withColumn("session_idx", sess_idx).withColumn(
        "session_id", composite_key(F.col(user_col).cast("string"),
                                    F.col("session_idx").cast("string")))


def session_stats(events: DataFrame, *, user_col: str = "user_id",
                  ts_col: str = "ts", order_tiebreak: str = "event_id",
                  gap_seconds: int = 8 * 3600) -> DataFrame:
    """Per-session aggregates: event count, bounds, duration (whole seconds)."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col,
                   order_tiebreak=order_tiebreak, gap_seconds=gap_seconds)
    return s.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long")))
        .alias("duration_secs"),
    )


def session_window_stats(events: DataFrame, *, user_col: str = "user_id",
                         ts_col: str = "ts",
                         gap_seconds: int = 8 * 3600) -> DataFrame:
    """Per-session stats via ``F.session_window`` — the formulation that runs
    UNCHANGED on batch and streaming input (Spark's native merging session
    windows; in streaming it is stateful with watermark-driven eviction —
    wire it via streaming.filestream / withWatermark, see
    tests/test_streaming.py).

    Boundary semantics vs ``sessionize``: a follow-up event exactly
    ``gap_seconds`` after the previous one MERGES there (diff > gap breaks)
    but starts a NEW session here (windows are half-open ``[start,
    last+gap)``). Identical for all non-boundary gaps.
    """
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"))
        .select(
            user_col,
            F.col("session_window.start").alias("window_start"),
            "n_events", "session_start", "session_end",
            (F.col("session_end").cast("long")
             - F.col("session_start").cast("long")).alias("duration_secs"),
        )
    )
