"""Binary-classification evaluation — confusion matrix and the derived
metric suite (accuracy / precision / recall / F1 / Cohen's kappa) as ONE
aggregation over a (label, prediction) frame.

Every curation classifier in this repo (the hashed linear quality model,
the repetition gate, the adaptive quality gate) ships documents it KEEPS;
this operator closes the loop by scoring a predictor against a reference
label column at corpus scale: one full scan collapsing to four BIGINT
conditional counts (map-side combined — four numbers per task cross the
exchange), then a fixed tree of IEEE divisions. No collect, no second
pass, and — per the repo's exact-arithmetic idiom — the metric doubles
hash bit-for-bit against a SQL oracle because the counts are exact
integers and the derived tree (products / sums / divisions, no ln) is
evaluated identically by Spark and DuckDB. Intermediate products are
computed in DOUBLE (dtp*…) so the n² terms in kappa's expected agreement
can never overflow int64 at any corpus size.

The metric projection text is shared verbatim with the DuckDB oracle
(``METRIC_COLS``) — one source of truth, two engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ids

#: derived-metric projection over (tp,fp,fn,tn) + their double casts.
#: po/pe are Cohen's observed / chance agreement; fixed parenthesization.
METRIC_COLS = [
    "CAST(tp AS BIGINT) AS tp", "CAST(fp AS BIGINT) AS fp",
    "CAST(fn AS BIGINT) AS fn", "CAST(tn AS BIGINT) AS tn",
    "(dtp + dtn) / dn AS accuracy",
    "dtp / (dtp + dfp) AS precision_",
    "dtp / (dtp + dfn) AS recall_",
    "(2.0 * dtp) / (2.0 * dtp + dfp + dfn) AS f1",
    "((dtp + dtn) / dn - ((dtp + dfp) * (dtp + dfn) "
    "+ (dfn + dtn) * (dfp + dtn)) / (dn * dn)) "
    "/ (1.0 - ((dtp + dfp) * (dtp + dfn) "
    "+ (dfn + dtn) * (dfp + dtn)) / (dn * dn)) AS kappa",
]

#: double casts of the confusion counts, shared with the oracle CTE.
CAST_COLS = [
    "*",
    "CAST(tp AS DOUBLE) AS dtp", "CAST(fp AS DOUBLE) AS dfp",
    "CAST(fn AS DOUBLE) AS dfn", "CAST(tn AS DOUBLE) AS dtn",
    "CAST(tp + fp + fn + tn AS DOUBLE) AS dn",
]


def binary_report(df: DataFrame, label: Column, pred: Column) -> DataFrame:
    """Confusion counts + metric suite for boolean ``pred`` against
    boolean ``label``. Returns ONE row
    (tp, fp, fn, tn, accuracy, precision_, recall_, f1, kappa).
    Degenerate slices follow SQL semantics: an all-negative prediction
    yields NULL precision (0/0), perfect agreement yields NULL kappa
    (pe = 1) — surfaced, not masked."""
    one = F.lit(1)
    zero = F.lit(0)
    counts = df.agg(
        F.sum(F.when(label & pred, one).otherwise(zero)).alias("tp"),
        F.sum(F.when(~label & pred, one).otherwise(zero)).alias("fp"),
        F.sum(F.when(label & ~pred, one).otherwise(zero)).alias("fn"),
        F.sum(F.when(~label & ~pred, one).otherwise(zero)).alias("tn"))
    return counts.selectExpr(*CAST_COLS).selectExpr(*METRIC_COLS)


def auc(df: DataFrame, label: Column, score: Column) -> DataFrame:
    """Exact ROC-AUC by the rank-sum (Mann-Whitney) identity, computed
    scalably: AUC = (#(pos,neg) pairs with score_pos > score_neg
    + ½·ties) / (P·N). Returns ONE row (p, n_neg, w2, auc) where
    ``w2`` is the integer 2×pair-win count — so everything up to the one
    final IEEE division is exact and the AUC double oracle-hashes.

    Shape: collapse to DISTINCT score values with per-value pos/neg
    counts (one groupBy — the only fact-sized exchange), then an
    inclusive running total of negatives below each value via the
    two-phase ``ids.global_cumsum`` (range-partition + driver prefix of
    k partition sums — NOT a single-task ``sum() OVER (ORDER BY)``), then
    one final reduce:  w2 = Σ_v 2·pos_v·neg_below_v + pos_v·neg_v.

    Overflow envelope: w2 ≤ 2·P·N must fit int64 → P·N < 4.6×10¹⁸,
    i.e. safe to ~2×10⁹ of each class; beyond that sum w2 as
    DECIMAL(38,0) (both engines sum decimals exactly)."""
    one = F.lit(1)
    zero = F.lit(0)
    g = (df.select(score.alias("s"), label.alias("_l"))
         .groupBy("s")
         .agg(F.sum(F.when(F.col("_l"), one).otherwise(zero)).alias("np"),
              F.sum(F.when(~F.col("_l"), one).otherwise(zero)).alias("nn")))
    c = ids.global_cumsum(g, ["s"], "nn", out_col="cum_nn")
    won2 = (F.lit(2) * F.col("np") * (F.col("cum_nn") - F.col("nn"))
            + F.col("np") * F.col("nn"))
    sums = c.agg(F.sum("np").alias("p"), F.sum("nn").alias("n_neg"),
                 F.sum(won2).alias("w2"))
    return sums.selectExpr(
        "CAST(p AS BIGINT) AS p", "CAST(n_neg AS BIGINT) AS n_neg",
        "CAST(w2 AS BIGINT) AS w2",
        "CAST(w2 AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) "
        "* CAST(n_neg AS DOUBLE)) AS auc")


def calibration_bins(df: DataFrame, label: Column, score: Column, *,
                     inv_width: int = 10) -> DataFrame:
    """Reliability diagram substrate: bucket a continuous score into
    fixed-width bins (bin = floor(score · inv_width), width
    1/inv_width) and report the empirical positive rate per bin —
    (bin, bin_lo, n, n_pos, frac_pos). A well-calibrated scorer has
    frac_pos tracking bin_lo.

    One groupBy over ≤ a-few-dozen bins (partial agg collapses each task
    to the bin count); counts are exact BIGINTs, frac_pos one IEEE
    division, and the bin id itself is portable because floor(double) is
    correctly rounded on both engines — so the whole diagram
    oracle-hashes. Fixed-width (not quantile) bins on purpose: quantile
    edges need a second pass or a sketch; calibration reads the same
    either way."""
    one = F.lit(1)
    zero = F.lit(0)
    binc = F.floor(score * F.lit(float(inv_width))).cast("long")
    return (df.select(label.alias("_l"), binc.alias("bin"))
            .groupBy("bin")
            .agg(F.count(one).alias("n"),
                 F.sum(F.when(F.col("_l"), one).otherwise(zero))
                  .alias("n_pos"))
            .select("bin",
                    (F.col("bin").cast("double") / F.lit(float(inv_width)))
                    .alias("bin_lo"),
                    "n", "n_pos",
                    (F.col("n_pos").cast("double")
                     / F.col("n").cast("double")).alias("frac_pos")))
