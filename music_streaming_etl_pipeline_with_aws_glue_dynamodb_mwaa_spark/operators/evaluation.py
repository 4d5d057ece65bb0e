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


#: Pearson-over-doubled-average-ranks solve; fixed parenthesization,
#: shared verbatim with the DuckDB oracle.
RHO_SQL = ("(dn * dab - da * db) "
           "/ (sqrt(dn * daa - da * da) * sqrt(dn * dbb - db * db))")


def _doubled_avg_ranks(df: DataFrame, col: str, out: str) -> DataFrame:
    """Per-row 2×average-rank of ``col`` — an exact BIGINT even under
    ties (avg rank is half-integral; doubling clears the fraction):
    R2 = 2·competition_rank + ties − 1 = 2·cum_cnt − cnt + 1 over the
    per-value counts. Computed scalably: ONE groupBy to distinct values
    + ``ids.global_cumsum`` (range-partition two-phase, never a
    single-task global window) + an equi-join back onto the rows."""
    g = df.groupBy(F.col(col).alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    c = ids.global_cumsum(g, ["_v"], "_c", out_col="_cum")
    r2 = c.select(F.col("_v"),
                  (F.lit(2) * F.col("_cum") - F.col("_c") + F.lit(1))
                  .cast("long").alias(out))
    return df.join(r2, df[col] == r2["_v"]).drop("_v")


def spearman_rho(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Spearman rank correlation between two numeric columns, EXACT and
    tie-correct: classical tie-averaged ranks are half-integers, so both
    rank vectors are carried as 2×avg-rank BIGINTs (scaling both sides
    doesn't move a correlation) and every sufficient statistic
    (n, Σr_a, Σr_b, Σr_a², Σr_b², Σr_a·r_b) is an exact integer sum —
    order-independent — before ONE fixed IEEE tree (``RHO_SQL``, the
    Pearson solve) yields the rho double, which therefore oracle-hashes.

    The curation use: agreement between two quality SIGNALS (a fast
    heuristic vs an expensive model score) is a rank question — Pearson
    on raw scores rewards matching magnitudes, Spearman asks "do they
    ORDER the corpus the same way", which is what a filter threshold
    actually consumes.

    Shape: two rank passes (each = value-groupBy + two-phase global
    cumsum + join back — the ``auc`` skeleton, no global window), one
    6-sum reduce. Overflow envelope: Σr_a·r_b ≤ 4n³ caps BIGINT safety
    at n ≈ 1.3×10⁶ rows; past that, bucket the signals first (rank
    correlation over quantized buckets — same operator over the bucket
    ids) or lift the six sums to DECIMAL(38,0), which both engines sum
    exactly. Returns ONE row (n, rho).

    NULL policy (round-5 ADVICE made it explicit): rows with NULL in
    EITHER column are excluded up front (complete-case analysis — the
    standard Spearman convention; a NULL has no rank), so the reported
    ``n`` is the pairwise-complete count, by construction rather than
    as a silent artifact of the rank join.
    """
    ranked = _doubled_avg_ranks(
        _doubled_avg_ranks(
            df.select(col_a, col_b).dropna(subset=[col_a, col_b]),
            col_a, "_ra"),
        col_b, "_rb")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_ra").alias("sa"), F.sum("_rb").alias("sb"),
        F.sum(F.col("_ra") * F.col("_ra")).alias("saa"),
        F.sum(F.col("_rb") * F.col("_rb")).alias("sbb"),
        F.sum(F.col("_ra") * F.col("_rb")).alias("sab"))
    return (sums.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(n AS DOUBLE) AS dn", "CAST(sa AS DOUBLE) AS da",
        "CAST(sb AS DOUBLE) AS db", "CAST(saa AS DOUBLE) AS daa",
        "CAST(sbb AS DOUBLE) AS dbb", "CAST(sab AS DOUBLE) AS dab")
        .selectExpr("n", f"{RHO_SQL} AS rho"))


def label_gini_by_group(df: DataFrame, group_col: str,
                        label_col: str) -> DataFrame:
    """Label-distribution Gini impurity per group:
    ``1 − Σ_label (c/n)²`` — 0 = pure (one label), →1 = uniform mix.
    The no-logarithm diversity measure (entropy's ln is not portable
    across engines; Gini's squares and one division are), used as the
    per-source language-mix governance row next to
    ``cross_source_overlap``.

    Two stacked hash aggregations — (group, label) counts, then per-group
    Σc and Σc² — both map-side combinable; BIGINT counts, one IEEE tree.
    Returns (group, n, n_labels, gini). Σc² ≤ n² caps BIGINT safety at
    n ≈ 3×10⁹ rows per group.
    """
    cnt = (df.groupBy(F.col(group_col).alias("grp"),
                      F.col(label_col).alias("_l"))
           .agg(F.count(F.lit(1)).alias("_c")))
    agg = cnt.groupBy("grp").agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_labels"),
        F.sum(F.col("_c") * F.col("_c")).alias("ssq"))
    return agg.selectExpr(
        "grp", "CAST(n AS BIGINT) AS n",
        "CAST(n_labels AS BIGINT) AS n_labels",
        "1.0 - CAST(ssq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
        " AS gini")
