"""Range (interval) join: match point values to [lo, hi) intervals without
a nested-loop plan.

Spark plans a bare ``p >= lo AND p < hi`` join condition as
BroadcastNestedLoopJoin (or a cartesian product when neither side fits in
a broadcast) — O(|points|·|intervals|) comparisons. This operator uses the
standard binning rewrite instead:

- pick a bin width ``w``;
- each interval replicates to every bin it overlaps
  (``sequence(floor(lo/w), floor(hi/w))`` + explode);
- each point maps to its single bin (``floor(p/w)``);
- candidates come from a plain EQUI-join on (keys…, bin) — hash join,
  shuffle on the bin key — and the exact bound predicate filters them.

Cost: |points| + Σ(interval span / w) join input rows. ``w`` trades
replication (small w → more interval copies) against candidate slack
(big w → more false candidates); the default derives w from the MEDIAN
interval span (a 1-row driver aggregate, documented) so typical intervals
copy to ~2 bins. Points are never replicated — at 100 TB the fact side
stays single-copy, and the join is an ordinary shuffled hash join that
AQE can skew-split.

The reference has no range surface at all; DuckDB's IEJoin is the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CLOSED = {
    "both": lambda p, lo, hi: (p >= lo) & (p <= hi),
    "left": lambda p, lo, hi: (p >= lo) & (p < hi),
    "right": lambda p, lo, hi: (p > lo) & (p <= hi),
    "neither": lambda p, lo, hi: (p > lo) & (p < hi),
}


def _bin(col: Column, w: int) -> Column:
    # non-negative domains: floor-div == int-div; floor() keeps it correct
    # for negative values too (floor(-3/10) = -1, not trunc's 0)
    return F.floor(col.cast("double") / F.lit(float(w))).cast("long")


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, *,
               keys: list[str] | None = None,
               bin_width: int | None = None,
               closed: str = "left",
               how: str = "inner") -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [lo_col, hi_col] contains ``point_col`` (boundary per ``closed``),
    optionally also matching on equality ``keys``. Columns: all point
    columns + all interval columns (caller disambiguates name clashes).

    ``bin_width=None`` derives the width from the median interval span
    (one 1-row driver aggregate over the intervals side — the dimension
    side, small by assumption). ``how='left'`` keeps unmatched points
    with NULL interval columns (anti-join of the matched keys — the
    binned join itself stays inner).
    """
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {sorted(_CLOSED)}")
    keys = keys or []
    if bin_width is None:
        row = intervals.agg(
            F.expr(f"percentile_approx({hi_col} - {lo_col}, 0.5)")
            .alias("m")).first()
        bin_width = max(int(row["m"] or 1), 1)

    binned = intervals.withColumn(
        "_bin", F.explode(F.sequence(_bin(F.col(lo_col), bin_width),
                                     _bin(F.col(hi_col), bin_width))))
    pts = points.withColumn("_bin", _bin(F.col(point_col), bin_width))
    pred = _CLOSED[closed](F.col(point_col), F.col(lo_col), F.col(hi_col))
    matched = (pts.join(binned, ["_bin"] + keys).filter(pred).drop("_bin"))
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    unmatched = (pts.join(binned, ["_bin"] + keys, "left")
                 .withColumn("_hit", F.coalesce(pred, F.lit(False)))
                 .groupBy(*[F.col(c) for c in points.columns])
                 .agg(F.max("_hit").alias("_any"))
                 .filter(~F.col("_any")).drop("_any"))
    ival_cols = [c for c in intervals.columns if c not in keys]
    padded = unmatched.select(
        *points.columns,
        *[F.lit(None).cast(dict(intervals.dtypes)[c]).alias(c)
          for c in ival_cols])
    return matched.unionByName(padded)
