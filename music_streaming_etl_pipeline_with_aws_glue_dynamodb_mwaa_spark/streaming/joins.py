"""Time-interval equi-join, mode-adaptive: the same semantics get the
plan each execution mode wants.

Semantics: ``left ⋈ right ON key, right_ts ∈ [left_ts − lower,
left_ts + upper]`` (inclusive bounds) — ad attribution, dwell-time
pairing, feature lookback windows.

- **Streaming × streaming**: the raw range predicate IS the right plan —
  Structured Streaming's stream-stream join uses it plus BOTH watermarks
  to bound join state (rows older than watermark + interval are evicted;
  Spark derives the state retention from the time-bound condition).
- **Batch**: that same raw predicate would plan as
  BroadcastNestedLoopJoin, so batch mode routes through the bin-bucketed
  range join (operators/rangejoin.py) on exact integer microseconds —
  hash join, never BNLJ (plan-asserted), and oracle-checkable.

Batch ≡ stream equivalence is asserted in tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rangejoin import range_join


def time_interval_join(left: DataFrame, right: DataFrame, key: str, *,
                       left_ts: str = "ts", right_ts: str = "ts",
                       lower_seconds: int = 3600,
                       upper_seconds: int = 0,
                       right_prefix: str = "r_",
                       watermark: str = "12 hours") -> DataFrame:
    """Inner join: right rows within [left_ts − lower, left_ts + upper]
    of a left row with the same key. Right columns come back prefixed.

    Output columns: all left columns, then ``right_prefix + c`` for every
    non-key right column.
    """
    lo_us = int(lower_seconds) * 1_000_000
    hi_us = int(upper_seconds) * 1_000_000

    if left.isStreaming or right.isStreaming:
        l = left.withWatermark(left_ts, watermark)
        r = right.withWatermark(right_ts, watermark)
        rsel = r.select(F.col(key),
                        *[F.col(c).alias(f"{right_prefix}{c}")
                          for c in right.columns if c != key])
        rts = f"{right_prefix}{right_ts}"
        # the time bound is expressed as TIMESTAMP ± INTERVAL, not
        # unix_micros arithmetic: StreamingJoinHelper can only derive the
        # state-value watermarks (which rows are safe to evict from each
        # side's join state) from a direct timestamp-column comparison —
        # an epoch-integer formulation joins correctly but RETAINS ALL
        # STATE forever on a continuous stream
        cond = (
            (l[key] == rsel[key])
            & (rsel[rts]
               >= l[left_ts] - F.expr(f"INTERVAL {lo_us} MICROSECOND"))
            & (rsel[rts]
               <= l[left_ts] + F.expr(f"INTERVAL {hi_us} MICROSECOND")))
        return (l.join(rsel, cond)
                .drop(rsel[key]))

    # batch: bin-bucketed range join on exact integer microseconds
    ivals = left.withColumn("_lo", F.unix_micros(F.col(left_ts)) - lo_us) \
                .withColumn("_hi", F.unix_micros(F.col(left_ts)) + hi_us)
    pts = right.select(
        F.col(key),
        F.unix_micros(F.col(right_ts)).alias("_p"),
        *[F.col(c).alias(f"{right_prefix}{c}")
          for c in right.columns if c != key])
    out = range_join(pts, ivals, "_p", "_lo", "_hi",
                     keys=[key], bin_width=lo_us + hi_us + 1,
                     closed="both")
    return out.drop("_p", "_lo", "_hi")


def stream_static_enrich(stream: DataFrame, static: DataFrame,
                         key: str | list[str], *,
                         how: str = "inner") -> DataFrame:
    """Stream-static equi-join — the dimension-enrichment pattern of
    Structured Streaming (§2.9's third join mode alongside stream-stream
    and batch): each micro-batch of the stream joins the static frame as
    of that batch's execution, with NO join state kept between batches
    (the static side is re-resolvable, so Spark plans a plain broadcast
    join inside every micro-batch).

    The broadcast hint keeps the per-batch plan shuffle-free on the
    stream side — at 100 TB of stream the dim table is the small side by
    construction (profiles, genres, geo), exactly the KPI chain's J1
    shape. Stream-side rows with no match drop under ``inner`` (Spark
    disallows right/full joins whose null side would need stream state);
    ``left`` keeps them with nulls."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("stream-static join supports inner/left only")
    return stream.join(F.broadcast(static), key, how)
