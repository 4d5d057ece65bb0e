"""Event-time windowed aggregation with late-data watermarking — the
Structured Streaming counterpart of the batch KPI group-bys.

One function serves BOTH modes: the same ``F.window`` group-by runs as a
plain batch aggregation or, over a streaming frame, as an incremental
stateful aggregation whose state is bounded by the watermark (windows
older than ``watermark`` behind the max observed event time are finalized
and their state dropped; later-arriving rows for them are discarded).
That batch≡stream contract is what tests/test_streaming_windowed.py
asserts — plus the watermark actually dropping a too-late row.

Scale: the aggregation state is one row per (window, key) — independent
of input volume; tumbling windows assign each row to exactly one window
(sliding windows replicate rows window/slide times, the documented
trade). The measure is exact integer cents (operators/stats.py), so the
batch variant is oracle-checkable hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.stats import cents

_INTERVAL_UNIT_SECONDS = {
    "microsecond": 1e-6, "microseconds": 1e-6,
    "millisecond": 1e-3, "milliseconds": 1e-3,
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(window: str) -> float | None:
    """Seconds in a Spark window-duration string like '6 hours' or
    '1 day 12 hours' (used only for the grid-size guard, not for window
    assignment — that stays Spark's). Returns None for a unit this parser
    doesn't know — the guard then skips rather than rejecting a duration
    Spark itself accepts."""
    parts = window.strip().lower().split()
    if not parts or len(parts) % 2:       # malformed ("6hour") → don't guess
        return None
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        if unit not in _INTERVAL_UNIT_SECONDS:
            return None
        try:
            total += float(qty) * _INTERVAL_UNIT_SECONDS[unit]
        except ValueError:
            return None
    # zero/negative durations are Spark's error to raise, not the guard's
    return total if total > 0 else None


def windowed_event_counts(events: DataFrame, *,
                          window: str = "6 hours",
                          slide: str | None = None,
                          watermark: str = "12 hours",
                          ts_col: str = "ts",
                          keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Per (event-time window, keys): row count + exact cent sum.

    Batch frames aggregate directly; streaming frames get
    ``withWatermark`` first (required for append-mode window finalization
    and state eviction). Output: win_start, win_end, *keys, n, sum_cents.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide or window)
    return (src.groupBy(w.alias("_w"), *keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents("value")).alias("sum_cents"))
            .select(F.col("_w.start").alias("win_start"),
                    F.col("_w.end").alias("win_end"),
                    *keys, "n", "sum_cents"))


def dense_windowed_counts(events: DataFrame, *,
                          window: str = "6 hours",
                          ts_col: str = "ts",
                          keys: tuple[str, ...] = ("event_type",),
                          max_cells: int | None = 10_000_000) -> DataFrame:
    """Gap-filled (dense) windowed counts: every (window slot, key) combo
    between the corpus' first and last window, zero-filled where no events
    landed — downstream time-series consumers (drift monitors, charting,
    forecasting) need the empty slots to exist.

    Grid construction: the window span comes from a 1-row min/max
    aggregate, slots from ``sequence(lo, hi, interval)`` (one row per
    slot), keys from a distinct projection — the cross join is
    (slots × keys), metadata-sized, then one left join against the sparse
    aggregate. Batch-only by nature (a stream can't emit future empties).

    ``max_cells`` bounds the dense grid: a high-cardinality key set × a
    long span at fine granularity is the one way this plan can explode at
    lake scale (e.g. 1 M keys × 100 k minute-slots = 1e11 grid rows). The
    guard costs one tiny pre-aggregate (a 1-row job) and raises before any
    grid is built; pass ``None`` to skip it when the caller has already
    sized the grid.
    """
    if max_cells is not None:
        bounds = events.agg(
            F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"),
            F.approx_count_distinct(
                F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
            ).alias("_nk")).collect()[0]
        step_s = _interval_seconds(window)
        if bounds["_lo"] is not None and step_s is not None:
            span_s = (bounds["_hi"] - bounds["_lo"]).total_seconds()
            n_slots = int(span_s / step_s) + 1
            cells = n_slots * max(bounds["_nk"], 1)
            if cells > max_cells:
                raise ValueError(
                    f"dense grid would have ~{cells:,} cells "
                    f"({n_slots:,} slots x ~{bounds['_nk']:,} keys) "
                    f"> max_cells={max_cells:,}; widen `window`, reduce "
                    f"`keys` cardinality, or pass max_cells=None")
    agg = windowed_event_counts(events, window=window, ts_col=ts_col,
                                keys=keys)
    step = F.expr(f"INTERVAL {window}")
    span = agg.agg(F.min("win_start").alias("_lo"),
                   F.max("win_start").alias("_hi"))
    slots = span.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step))
        .alias("win_start"))
    grid = slots.crossJoin(events.select(*keys).distinct())
    return (grid.join(agg.drop("win_end"), ["win_start", *keys], "left")
            .select("win_start",
                    (F.col("win_start") + step).alias("win_end"),
                    *keys,
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.coalesce("sum_cents", F.lit(0)).alias("sum_cents")))


def session_windowed_stats(events: DataFrame, *,
                           gap: str = "30 minutes",
                           watermark: str = "1 hour",
                           ts_col: str = "ts",
                           key: str = "user_id") -> DataFrame:
    """Per-key SESSION windows via the built-in ``F.session_window``:
    dynamic-length windows that extend while events keep arriving within
    ``gap`` of the last one and close at the first gap — the engine-native
    twin of the batch sessionizer (operators/sessions.py) and the
    COMPLEMENT of streaming/stateful.py's ``applyInPandasWithState``
    sessionizer (which exists for custom per-session logic the built-in
    aggregate can't express; this one is pure JVM state, preferable when
    count/sum/min/max per session is all the pipeline needs).

    Output: key, session_start, session_end, n_events, sum_cents.

    Batch frames run the same expression as a plain aggregation — the
    batch≡stream contract is asserted in tests/test_streaming_windowed.py
    against operators/sessions.py's window-function formulation too (three
    independent implementations, one answer). Streaming state is one row
    per OPEN session, evicted once the watermark passes the session end.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (src.groupBy(sw.alias("_s"), key)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(cents("value")).alias("sum_cents"))
            .select(key, F.col("_s.start").alias("session_start"),
                    F.col("_s.end").alias("session_end"),
                    "n_events", "sum_cents"))
