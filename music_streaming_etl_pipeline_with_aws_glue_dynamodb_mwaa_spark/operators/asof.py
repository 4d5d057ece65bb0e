"""As-of (nearest-timestamp) join — the temporal-alignment operator Spark
lacks natively (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` equivalent).

A training/analytics pipeline uses it for attribution (each purchase ←
most recent prior click), feature snapshots (each example ← latest feature
row as of its timestamp), and slowly-changing-dimension lookups. The
reference has no temporal join (its only join is an equi-join on song_id,
``REF/glue_jobs/transform.py``); this is extension surface.

Spark-first design — **union + ordered window, zero joins**:

- tag right rows with their payload struct, union both sides by name;
- one window per key ordered by (ts, side) — right rows sort BEFORE left
  rows at equal timestamps, so a same-instant right row is visible
  (inclusive match, pandas ``merge_asof`` default);
- ``last(payload, ignorenulls=True)`` over the unbounded-preceding frame
  carries the most recent right payload forward; left rows then extract it.

Cost: ONE hash shuffle of |L|+|R| rows on the key (vs sort-merge-join
approaches that shuffle both sides AND need a range condition Spark would
turn into a broadcast-nested-loop). The window sort is the same sort a
merge join would do. Skewed keys: salt upstream or split hot keys — same
toolbox as any keyed shuffle (operators/skew.py).

Right-side determinism: if two right rows share (key, ts), "the" most
recent row is ambiguous — callers should pre-dedup (dedup.dedup_exact on
[key, ts]); this module's query registration does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str], *,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              prefix: str = "asof_",
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Left join each ``left`` row to the nearest ``right`` row per key:
    the latest ``right_ts`` ≤ ``left_ts`` (``backward``, default) or the
    earliest ``right_ts`` ≥ ``left_ts`` (``forward``). Equal timestamps
    match (inclusive). Unmatched left rows keep NULL match columns.

    ``right_cols`` (default: all non-key right columns) are appended with
    ``prefix``. ``tolerance_seconds`` nulls out matches farther than the
    budget from ``left_ts`` (match-or-nothing, like pandas ``tolerance``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]

    payload = F.struct(*[F.col(c).alias(c) for c in right_cols],
                       F.col(right_ts).alias("__rts"))
    r = right.select(*on, F.col(right_ts).alias("_ats"),
                     payload.alias("_match"), F.lit(0).alias("_side"))
    l = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)
    ts_order = F.col("_ats").asc() if direction == "backward" \
        else F.col("_ats").desc()
    w = (Window.partitionBy(*on).orderBy(ts_order, F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_m", F.last("_match", ignorenulls=True).over(w))

    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros(F.col(left_ts))
                    - F.unix_micros(F.col("_m.__rts")))
        u = u.withColumn(
            "_m", F.when(gap <= F.lit(int(tolerance_seconds) * 1_000_000),
                         F.col("_m")))

    out_cols = ([F.col(c) for c in left.columns]
                + [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols])
    return u.filter(F.col("_side") == 1).select(*out_cols)
