"""Distributed closed-form linear regression — normal equations in one
aggregation pass, solved by Cramer's rule on the driver-free 1-row frame.

The canonical "train a model where only d² numbers cross the wire" move:
for a 2-feature-plus-intercept least-squares fit the sufficient statistics
are the nine sums (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y [+ Σy²
for R²]) — one map-side-combined aggregation over the fact table, after
which the solve is O(1) arithmetic on a single row. Nothing is collected;
the coefficient row stays a DataFrame and broadcast-joins back for
prediction. At 100 TB this is ONE scan + a 10-double reduce — the same
shape MLlib's ``summarizer`` path uses, reimplemented here as a pure
DataFrame op so the entire fit is plan-visible and oracle-checkable.

Engine-portability contract (the repo's exact-arithmetic idiom, see
``operators/stats.py`` header): inputs are exact BIGINTs (cents /
small-integer features), every sufficient statistic is a BIGINT sum
(order-independent — no float accumulation), and the solve is a fixed
tree of IEEE doubles (*, -, /) evaluated identically by Spark and DuckDB,
so coefficients, R² and per-row residuals hash bit-for-bit against a SQL
oracle. The shared solve text lives in ``DET_SQL``/``B0_SQL``/… and is
interpolated into BOTH the Spark ``selectExpr`` and the DuckDB oracle —
one source of truth, two engines.

Overflow envelope: with |y| ≤ C cents and features ≤ F, the largest sum
is n·C² — for C = 10⁶ this holds to n ≈ 9×10⁶ rows per int64; beyond
that switch the two y² sums to DECIMAL(38,0) (both engines sum decimals
exactly); the solve is unchanged. The events fit (C ≈ 10⁵, F ≤ 23) is
safe past 10⁸ rows.

Reference parity: the reference pipeline has no model surface at all
(its "analysis" ends at groupBy KPIs, REF/glue_jobs/transform.py:26-36);
this is extension-family surface for the training-data mandate
(seasonality de-trending, quality-probe fits, leakage-checked baselines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 3x3 Cramer determinants over the double-cast sufficient statistics
#: (dn,d1,d2,dy,d11,d12,d22,d1y,d2y). Fixed parenthesization — the tree
#: is what makes the doubles portable; do not "simplify".
DET_SQL = ("(dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2) "
           "+ d2 * (d1 * d12 - d11 * d2))")
DET0_SQL = ("(dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y) "
            "+ d2 * (d1y * d12 - d11 * d2y))")
DET1_SQL = ("(dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2) "
            "+ d2 * (d1 * d2y - d1y * d2))")
DET2_SQL = ("(dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2) "
            "+ dy * (d1 * d12 - d11 * d2))")

#: projection from the BIGINT sums row to the double statistics row —
#: shared verbatim by the Spark selectExpr and the oracle CTE.
CAST_COLS = [
    "CAST(n AS BIGINT) AS n",
    "CAST(n AS DOUBLE) AS dn", "CAST(s1 AS DOUBLE) AS d1",
    "CAST(s2 AS DOUBLE) AS d2", "CAST(sy AS DOUBLE) AS dy",
    "CAST(s11 AS DOUBLE) AS d11", "CAST(s12 AS DOUBLE) AS d12",
    "CAST(s22 AS DOUBLE) AS d22", "CAST(s1y AS DOUBLE) AS d1y",
    "CAST(s2y AS DOUBLE) AS d2y", "CAST(syy AS DOUBLE) AS dyy",
]

#: coefficient + fit-quality projection over (n, dets, doubles row).
#: SSE from the sufficient statistics (no second data pass):
#: SSE = Σy² − b0·Σy − b1·Σx1y − b2·Σx2y;  SST = Σy² − (Σy)²/n.
SOLVE_COLS = [
    "n",
    "det0 / det AS b0",
    "det1 / det AS b1",
    "det2 / det AS b2",
    "1.0 - (dyy - (det0 / det) * dy - (det1 / det) * d1y "
    "- (det2 / det) * d2y) / (dyy - dy * dy / dn) AS r2",
]


def linear_fit_grouped(df: DataFrame, keys: list[str], y_col: str,
                       x1_col: str, x2_col: str) -> DataFrame:
    """Least-squares fit  y ≈ b0 + b1·x1 + b2·x2  PER KEY GROUP — one row
    (keys…, n, b0, b1, b2, r2) per group, from a single groupBy pass.
    This is the "fit a million small models in one scan" shape (per-tenant
    seasonality baselines, per-source quality probes): the shuffle carries
    ten longs per (task, group), the solve is a map-side projection over
    the group rows, and no fit ever touches the driver. Degenerate groups
    (constant features → singular normal matrix) yield NULL/NaN
    coefficients for that row only — surfaced, not masked."""
    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    sums = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"), F.sum(x2).alias("s2"), F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"), F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"), F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"), F.sum(y * y).alias("syy"))
    doubles = sums.selectExpr(*keys, *CAST_COLS)
    dets = doubles.selectExpr(
        "*", f"{DET_SQL} AS det", f"{DET0_SQL} AS det0",
        f"{DET1_SQL} AS det1", f"{DET2_SQL} AS det2")
    return dets.selectExpr(*keys, *SOLVE_COLS)


def linear_fit(df: DataFrame, y_col: str, x1_col: str,
               x2_col: str) -> DataFrame:
    """Global least-squares fit — ONE row (n, b0, b1, b2, r2); the
    keys=[] case of :func:`linear_fit_grouped`. Stays a DataFrame, so the
    fit composes (broadcast into :func:`linear_predict`, union across
    folds, …) without touching the driver. Partial aggregation collapses
    each task to one 10-long row, so the exchange is 10 numbers per task
    regardless of fact size."""
    return linear_fit_grouped(df, [], y_col, x1_col, x2_col)


def linear_predict(df: DataFrame, fit: DataFrame, y_col: str, x1_col: str,
                   x2_col: str) -> DataFrame:
    """Apply a :func:`linear_fit` row to every fact row: adds ``pred``
    (b0 + b1·x1 + b2·x2, doubles in the same tree as the oracle) and
    ``resid`` (y − pred). The 1-row fit is broadcast — the standard
    scalar-join shape (no shuffle, plan shows BroadcastNestedLoopJoin
    over exactly one build row, the repo's documented allowed set)."""
    joined = df.crossJoin(F.broadcast(fit.select("b0", "b1", "b2")))
    pred = (F.col("b0") + F.col(x1_col).cast("double") * F.col("b1")
            + F.col(x2_col).cast("double") * F.col("b2"))
    return (joined.withColumn("pred", pred)
            .withColumn("resid", F.col(y_col).cast("double") - F.col("pred"))
            .drop("b0", "b1", "b2"))
