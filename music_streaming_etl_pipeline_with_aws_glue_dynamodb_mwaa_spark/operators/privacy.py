"""k-anonymity / l-diversity audit — release-gate privacy reporting.

The governance twin of the PII redaction pass (``operators/text.py``):
before a corpus or event extract is published, audit whether any
quasi-identifier (QI) combination isolates fewer than k individuals, and
whether any QI group is sensitive-value-homogeneous (l-diversity). The
reference pipeline publishes user-grain KPI tables with no such gate; a
training-data pipeline publishing derived extracts needs one.

Pure groupBy/agg — the audit is ONE pass over the extract:
    group_n      = COUNT(*) per QI group          (k-anonymity)
    l_distinct   = COUNT(DISTINCT sensitive)      (l-diversity)
and the summary is a k-row reduction of the audit frame. Exact integers
throughout, so both tables are oracle-exact.

Scale: the QI groupBy is a map-side-partial hash aggregate on the QI key —
the same shape as any rollup; cardinality is bounded by the QI domain, not
the row count. No windows, no joins, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(df: DataFrame, qi_cols: list[Column | str],
                      sensitive_col: Column | str, *,
                      k: int = 5, l: int = 2) -> DataFrame:
    """Per-QI-group audit rows: size, sensitive diversity, violation flags."""
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_n"),
             F.countDistinct(sensitive_col).alias("l_distinct"))
        .withColumn("k_violation", F.col("group_n") < F.lit(k))
        .withColumn("l_violation", F.col("l_distinct") < F.lit(l))
    )


def k_anonymity_summary(df: DataFrame, qi_cols: list[Column | str],
                        sensitive_col: Column | str, *,
                        k: int = 5, l: int = 2) -> DataFrame:
    """One-row release-gate report over the audit frame."""
    audit = k_anonymity_audit(df, qi_cols, sensitive_col, k=k, l=l)
    flag = lambda c: F.col(c).cast("long")  # noqa: E731
    return audit.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(flag("k_violation")).alias("k_violating_groups"),
        F.sum(F.when(F.col("k_violation"), F.col("group_n"))
              .otherwise(F.lit(0))).alias("rows_at_risk"),
        F.sum(flag("l_violation")).alias("l_violating_groups"),
        F.min("group_n").alias("min_group_n"),
        F.min("l_distinct").alias("min_l_distinct"),
    )


def t_closeness_audit(df: DataFrame, qi_cols: list[str],
                      ordered_col: str, *,
                      t_num: int = 1, t_den: int = 5) -> DataFrame:
    """t-closeness audit over an ORDERED sensitive attribute (Li,
    Li & Venkatasubramanian, ICDE'07): per QI group, the Earth-Mover's
    Distance between the group's sensitive-value distribution and the
    corpus-wide one, over the attribute's ordered categories —
    (qi…, n_rows, scaled_emd, emd, t_violation). The release gate
    k-anonymity misses: a group can be large AND diverse yet still
    leak because its distribution is skewed away from the population.

    Exactness: with B ordered buckets, EMD = Σ_b |F_g(b) − F(b)| /
    (B−1); both CDFs are cross-multiplied into the exact long
    S = Σ_b |cum_g(b)·N − cum(b)·n_g|, so emd = S / (n_g·N·(B−1)) is
    ONE IEEE division and the violation test S·t_den > t_num·n_g·N·(B−1)
    never compares floats. Overflow envelope: S ≤ (B−1)·n_g·N must fit
    int64 — at n_g·N ≈ 10¹⁵ keep B ≤ ~9000 or lift S to DECIMAL(38,0).

    Plan: one (qi, bucket) aggregation (the only fact-sized exchange),
    a bucket-grain global roll-up (B rows — constant), a broadcast
    grid join (groups × B) so zero-count buckets participate in the
    CDFs, a per-GROUP cumulative window (partitioned — never global),
    one group roll-up.
    """
    gb = (df.groupBy(*qi_cols, ordered_col)
          .agg(F.count(F.lit(1)).alias("_c")))
    g = gb.groupBy(*qi_cols).agg(F.sum("_c").alias("_ng"))
    b = gb.groupBy(ordered_col).agg(F.sum("_c").alias("_cb"))
    cum_b = (b.withColumn(
        "_cum_b",
        F.sum("_cb").over(Window.orderBy(ordered_col)
                          .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_n_total",
                    F.sum("_cb").over(Window.rowsBetween(
                        Window.unboundedPreceding,
                        Window.unboundedFollowing)))
        .withColumn("_n_buckets",
                    F.count(F.lit(1)).over(Window.rowsBetween(
                        Window.unboundedPreceding,
                        Window.unboundedFollowing)))
        .drop("_cb"))
    grid = g.crossJoin(F.broadcast(cum_b))
    j = grid.join(gb, [*qi_cols, ordered_col], "left") \
            .na.fill({"_c": 0})
    wg = (Window.partitionBy(*qi_cols).orderBy(ordered_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    cg = j.withColumn("_cum_g", F.sum("_c").over(wg))
    diff = F.abs(F.col("_cum_g") * F.col("_n_total")
                 - F.col("_cum_b") * F.col("_ng"))
    denom = (F.max("_ng") * F.max("_n_total")
             * (F.max("_n_buckets") - 1))
    return (cg.groupBy(*qi_cols)
            .agg(F.max("_ng").alias("n_rows"),
                 F.sum(diff).alias("scaled_emd"),
                 F.when(F.max("_n_buckets") > 1,
                        F.sum(diff).cast("double")
                        / denom.cast("double")).alias("emd"),
                 (F.sum(diff) * t_den > denom * t_num)
                 .alias("t_violation")))
