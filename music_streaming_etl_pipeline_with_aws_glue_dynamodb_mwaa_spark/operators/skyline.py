"""2-D skyline (Pareto frontier) — "no other row is at least as good on
both axes and strictly better on one". The multi-objective shortlist
query (cheapest-for-the-size catalog picks, price/quality trade-off
curves, model-selection frontiers).

Extension surface: the reference has no dominance queries at all.

Spark-first shape — NOT the naive O(n²) dominance anti-join. For two
dimensions (minimize ``x``, maximize ``y``) dominance collapses to a
prefix maximum: a row is dominated iff

    max(y over rows with strictly smaller x) ≥ its y        (case x'<x)
 OR max(y over rows with the same x)          > its y        (case x'=x)

so the whole frontier falls out of (a) one per-x groupBy for the
per-price best, (b) one ordered window over the DISTINCT x values for
the strict-prefix maximum (distinct-x is catalog-cardinality, tiny next
to the fact), and (c) one key join back. Every comparison is on exact
integers — fully oracle-hashable; the SQL twin is the literal
NOT EXISTS dominance definition, certifying the rewrite, not just the
rows.

At 100 TB: the window runs over DISTINCT x (bounded by the value
domain, not the row count); the heavy frames only ever see hash
exchanges on x. A billion-distinct-x frontier would range-partition
step (b) and merge boundary maxima — same algebra, two-phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, min_col: str,
                       max_col: str) -> DataFrame:
    """Rows NOT dominated under (minimize ``min_col``, maximize
    ``max_col``). Ties on both axes survive together (neither dominates
    the other). Input columns must be exactly comparable (ints/longs/
    dates/strings)."""
    per_x = (df.groupBy(min_col)
             .agg(F.max(max_col).alias("_best_y")))
    w = Window.orderBy(min_col)
    prefix_best = F.max("_best_y").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    thresholds = per_x.select(
        min_col,
        prefix_best.alias("_lt_best"),
        F.col("_best_y").alias("_eq_best"))
    joined = df.join(F.broadcast(thresholds), min_col)
    dominated = ((F.col("_lt_best").isNotNull()
                  & (F.col("_lt_best") >= F.col(max_col)))
                 | (F.col("_eq_best") > F.col(max_col)))
    return joined.filter(~dominated).drop("_lt_best", "_eq_best")
