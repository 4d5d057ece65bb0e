"""Mergeable sketch columns (DataSketches HLL, built into Spark ≥3.5) —
the pre-aggregation pattern that makes 100 TB distinct-count rollups
cheap: store a BINARY sketch per (fine-grained group), merge sketches to
any coarser grain later WITHOUT touching raw rows again.

Exact distinct counts don't re-aggregate (distinct-of-union ≠ sum of
distincts), so a lake of daily exact counts can never answer "monthly
uniques". A lake of daily SKETCHES can: ``hll_union_agg`` is associative
and preserves the error envelope (merging never degrades the bound below
the target lgK), so the monthly roll-up costs |days×groups| sketch merges —
no fact scan, no giant shuffle. Estimate error is the standard HLL ±~1.6%
at lgK=12 (tunable), self-tested in tests/test_sketches.py against exact
distinct counts. Note the merged estimate is not guaranteed BIT-identical
to a direct sketch of the union — the union gadget can take a different
sparse→dense representation path — but both sit inside the same bound.

All JVM expressions (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`); engine-deterministic for fixed input (the sketch
is hash-based, no randomness) but not oracle-portable (DuckDB's HLL is a
different implementation), so queries register rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(df: DataFrame, keys: list[str], value_col: str, *,
                      lg_k: int = 12,
                      sketch_col: str = "sketch") -> DataFrame:
    """One HLL sketch per key group over ``value_col`` — the storable,
    mergeable form of count-distinct. One hash agg (map-side partials
    merge sketches, not rows)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col))


def merge_sketches(df: DataFrame, keys: list[str], *,
                   sketch_col: str = "sketch",
                   estimate_col: str | None = None) -> DataFrame:
    """Roll sketches up to a coarser grain (drop some key columns, merge
    the rest). ``estimate_col`` additionally materializes the distinct
    estimate as a long."""
    out = df.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col))
    if estimate_col:
        out = out.withColumn(estimate_col,
                             F.hll_sketch_estimate(F.col(sketch_col)))
    return out


def estimate(df: DataFrame, *, sketch_col: str = "sketch",
             estimate_col: str = "n_distinct_est") -> DataFrame:
    """Attach the HLL cardinality estimate for each sketch row."""
    return df.withColumn(estimate_col,
                         F.hll_sketch_estimate(F.col(sketch_col)))
