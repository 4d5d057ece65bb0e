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

from pyspark.sql import Column, DataFrame
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
