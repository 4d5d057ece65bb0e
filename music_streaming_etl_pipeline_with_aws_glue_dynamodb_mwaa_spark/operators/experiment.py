"""Experimentation statistics — Welch's two-sample t and the chi-square
independence table, computed from EXACT integer sufficient statistics so
both oracle-hash bit for bit.

Extension surface: the reference has no inference at all; this is the
A/B-readout layer every engagement pipeline bolts onto its KPI tables
(did the treatment move spend? is event mix independent of weekday?).

Exactness contract (the repo's standard trick, cf. operators/stats.py,
regression.py): aggregate ONLY exact longs (n, Σx, Σx² of integer
measures; contingency counts and marginals), then derive the float
outputs through ONE fixed tree of IEEE ops (±, ·, ÷, √ are correctly
rounded by the standard, so any engine evaluating the same tree on the
same longs produces the same bits — ln/exp are NOT in the tree, which is
why it's Welch-t and chi-square here, not a p-value).

Scale: Welch is one map-side-combinable aggregation over the fact (the
conditional-sum form — no pivot, no second pass); chi-square is the
contingency groupBy plus two marginal broadcasts and a tiny dim×dim
grid. Nothing shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def welch_t(df: DataFrame, group_col: str, value: Column, *,
            group_a, group_b) -> DataFrame:
    """One-row Welch two-sample t readout comparing ``value`` (an exact
    long Column, e.g. cents) between ``group_a`` and ``group_b`` rows of
    ``group_col``: (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    welch_df). Sample variance via n·Σx² − (Σx)² over n(n−1) — callers
    own the overflow envelope (|Σx| < ~3·10⁹ per group for long safety).
    """
    def side(tag, cond):
        x = F.when(cond, value)
        return [F.count(x).alias(f"n_{tag}"),
                F.sum(x).alias(f"s_{tag}"),
                F.sum(x * x).alias(f"ss_{tag}")]

    agg = df.agg(*side("a", F.col(group_col) == group_a),
                 *side("b", F.col(group_col) == group_b))

    def derive(tag):
        n = F.col(f"n_{tag}")
        s, ss = F.col(f"s_{tag}"), F.col(f"ss_{tag}")
        mean = s.cast("double") / n.cast("double")
        var = ((n * ss - s * s).cast("double")
               / (n * (n - 1)).cast("double"))
        return n, mean, var

    n_a, mean_a, var_a = derive("a")
    n_b, mean_b, var_b = derive("b")
    q_a = var_a / n_a.cast("double")
    q_b = var_b / n_b.cast("double")
    se2 = q_a + q_b
    t = (mean_a - mean_b) / F.sqrt(se2)
    dof = ((se2 * se2)
           / ((q_a * q_a) / (n_a - 1).cast("double")
              + (q_b * q_b) / (n_b - 1).cast("double")))
    return agg.select(
        n_a.alias("n_a"), n_b.alias("n_b"),
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        var_a.alias("var_a"), var_b.alias("var_b"),
        t.alias("t_stat"), dof.alias("welch_df"))


def chi_square_cells(df: DataFrame, row_col: str,
                     col_col: str) -> DataFrame:
    """Per-cell chi-square independence table over two categoricals:
    (row, col, observed, row_total, col_total, expected, contribution),
    INCLUDING zero-observed cells (the full dim×dim grid — a chi-square
    without its empty cells is wrong).

    expected = rt·ct/N and contribution = (o·N − rt·ct)²/(N·rt·ct) are
    single divisions of exact long products — the algebraically
    cleared (o−e)²/e, so no intermediate float feeds another aggregate.
    The cross-grid is dim×dim (category cardinalities, not rows) and
    both marginals broadcast. Per-cell output deliberately: summing the
    contributions to one scalar would stack engine-ordered float adds;
    the tiny final Σ belongs to the caller's presentation layer.
    Overflow envelope: o·N and N·rt·ct must stay under 2⁶³ — fine up to
    N ≈ 3·10⁹ observations; past that, compute contributions in DOUBLE
    and accept approximate (document, don't silently switch).
    """
    obs = (df.groupBy(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
           .agg(F.count(F.lit(1)).alias("observed")))
    rows = obs.groupBy("r").agg(F.sum("observed").alias("row_total"))
    cols = obs.groupBy("c").agg(F.sum("observed").alias("col_total"))
    total = obs.agg(F.sum("observed").alias("n_total"))
    grid = (rows.select("r").crossJoin(F.broadcast(cols.select("c"))))
    full = (grid.join(obs, ["r", "c"], "left")
            .join(F.broadcast(rows), "r")
            .join(F.broadcast(cols), "c")
            .crossJoin(F.broadcast(total))
            .withColumn("observed",
                        F.coalesce("observed", F.lit(0).cast("bigint"))))
    rt, ct, n = F.col("row_total"), F.col("col_total"), F.col("n_total")
    o = F.col("observed")
    expected = (rt * ct).cast("double") / n.cast("double")
    dev = o * n - rt * ct
    contribution = (dev * dev).cast("double") / (n * rt * ct).cast("double")
    return full.select(
        F.col("r").alias(row_col), F.col("c").alias(col_col),
        "observed", "row_total", "col_total",
        expected.alias("expected"), contribution.alias("contribution"))
