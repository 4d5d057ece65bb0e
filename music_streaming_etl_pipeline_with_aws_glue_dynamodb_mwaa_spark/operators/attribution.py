"""Multi-touch conversion attribution — split each conversion's value
across the engagement touches that preceded it inside an attribution
window (the marketing-analytics workhorse; last-touch is the asof join
in operators/asof.py, this is its LINEAR multi-touch sibling).

Spark-first shape: ONE user-keyed equi-join with the banded time
predicate pushed into the join condition (conversions ⋈ touches of the
same user in [conv_ts − window, conv_ts)), then a per-conversion count
window riding the same user exchange, then credit = value / n_touches —
ONE IEEE division of exact longs per row, so every credit DOUBLE
oracle-hashes.

At 100 TB the join is user-keyed (the natural co-partitioning for both
event streams); the window bound keeps per-conversion fan-out small and
a pathological always-on user is bounded by touches-per-window, not
history length. For unbounded windows use the asof/range-join machinery
(operators/rangejoin.py) with time bucketing instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def linear_attribution(conversions: DataFrame, touches: DataFrame,
                       key_col: str, ts_col: str, *,
                       conv_id: str, touch_id: str, value: Column,
                       window_expr: Column) -> DataFrame:
    """(key, conv_id, touch_id, touch_ts, n_touches, credit) — every
    touch of the same ``key_col`` with ``conv_ts − window ≤ touch_ts <
    conv_ts`` receives value/n_touches. Conversions with NO preceding
    touch in the window are dropped (attribute-or-nothing; emit them
    from the asof last-touch operator if "direct" credit is wanted).
    ``value`` must be an exact long Column on the conversions side.
    """
    c = conversions.select(F.col(key_col).alias("_k"),
                           F.col(conv_id).alias("conv_id"),
                           F.col(ts_col).alias("_cts"),
                           value.alias("_v"))
    t = touches.select(F.col(key_col).alias("_k"),
                       F.col(touch_id).alias("touch_id"),
                       F.col(ts_col).alias("touch_ts"))
    j = c.join(t, ["_k"]).where(
        (F.col("touch_ts") < F.col("_cts"))
        & (F.col("touch_ts") >= F.col("_cts") - window_expr))
    w = Window.partitionBy("_k", "conv_id")
    n = F.count(F.lit(1)).over(w)
    return (j.withColumn("n_touches", n.cast("bigint"))
            .select(F.col("_k").alias(key_col), "conv_id", "touch_id",
                    "touch_ts", "n_touches",
                    (F.col("_v").cast("double")
                     / F.col("n_touches").cast("double")).alias("credit")))
