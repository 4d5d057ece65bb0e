"""Multi-dimensional aggregation surface — ROLLUP / CUBE subtotals, pivot /
unpivot reshaping, and fixed-width histograms (OLAP extension, SURVEY.md §7
E-class).

The reference's only aggregation is a flat (day, genre) group-by
(``REF/glue_jobs/transform.py:31-38``); a warehouse user expects the
subtotal lattice (per-genre, per-day, grand total) and wide/long reshaping
on top. These are all single-pass Expand-based plans in Spark — no
self-union of k aggregations.

Hash-portability notes baked into the shapes:

- ROLLUP/CUBE emit NULL for rolled-up keys; the operators coalesce those to
  an ``'ALL'`` sentinel AND carry ``grouping_id()`` so a real NULL key is
  never conflated with a subtotal row (the oracle mirrors GROUPING()).
- Pivot uses an EXPLICIT value list — no pre-pass over the data to discover
  columns (a hidden ``collect()`` at scale), and a deterministic column
  order for the hash.
- Histogram bins are pure integer arithmetic over exact cents
  (``floor((c-min)*nbins / span)``) — the single double division is
  bit-identical across engines, and the bin index needs no clamp because
  ``(c-min) ≤ span-1`` keeps the quotient strictly below ``nbins``.

Scale posture (100 TB): Expand multiplies rows ×(k+1) for rollup / ×2^k for
cube BEFORE the exchange — partial aggregation collapses them map-side, so
the shuffle carries only group rows. The histogram's min/max ride one
window exchange; the bin roll-up is a second, smaller one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .stats import cents


def rollup_counts(df: DataFrame, keys: list[str], aggs: list[Column], *,
                  sentinel: str = "ALL") -> DataFrame:
    """Subtotal lattice over ``keys`` (k+1 levels: detail → grand total) in
    ONE Expand pass. Rolled-up key slots surface as ``sentinel``;
    ``gid`` (grouping_id) disambiguates them from genuine key values."""
    grouped = df.rollup(*keys).agg(F.grouping_id().alias("gid"), *aggs)
    outs = [F.coalesce(F.col(k).cast("string"), F.lit(sentinel)).alias(k)
            for k in keys]
    rest = [c for c in grouped.columns if c not in keys]
    return grouped.select(*outs, *rest)


def cube_counts(df: DataFrame, keys: list[str], aggs: list[Column], *,
                sentinel: str = "ALL") -> DataFrame:
    """Full 2^k subtotal lattice — same Expand shape as :func:`rollup_counts`
    with every key subset."""
    grouped = df.cube(*keys).agg(F.grouping_id().alias("gid"), *aggs)
    outs = [F.coalesce(F.col(k).cast("string"), F.lit(sentinel)).alias(k)
            for k in keys]
    rest = [c for c in grouped.columns if c not in keys]
    return grouped.select(*outs, *rest)


def pivot_counts(df: DataFrame, row_key: str, pivot_key: str,
                 pivot_values: list[str]) -> DataFrame:
    """Wide contingency table: one row per ``row_key``, one count column per
    ``pivot_values`` entry. The explicit value list keeps the plan a single
    pass (Spark otherwise runs a distinct-collect job to discover columns —
    a scan of the full input before the real one). Absent cells are 0."""
    wide = (df.groupBy(row_key)
            .pivot(pivot_key, pivot_values)
            .agg(F.count(F.lit(1))))
    return wide.select(
        row_key,
        *[F.coalesce(F.col(v), F.lit(0)).alias(f"n_{v.lower()}")
          for v in pivot_values])


def unpivot_measures(df: DataFrame, ids: list[str],
                     measures: list[str], *, var_col: str = "measure",
                     value_col: str = "value") -> DataFrame:
    """Wide → long: one output row per (id row, measure). A zero-shuffle
    Expand projection (``DataFrame.unpivot``) — the inverse of
    :func:`pivot_counts` for feeding long-format consumers."""
    return df.unpivot(ids, measures, var_col, value_col)


def histogram_fixed(df: DataFrame, keys: list[str], value_col: str, *,
                    nbins: int = 10) -> DataFrame:
    """Per-group equi-width histogram of the exact cent values:
    (keys…, bin, bin_lo_cents, bin_hi_cents, n_rows).

    Group min/max ride ONE unordered window on the group exchange (no
    stats-table join-back); the bin index is
    ``floor((c − min)·nbins / (max − min + 1))`` — integer numerator,
    one IEEE division, portable. Single-valued groups land in bin 0.
    """
    c = cents(value_col)
    w = Window.partitionBy(*keys)
    mn = F.min(c).over(w)
    span = F.max(c).over(w) - mn + F.lit(1)
    binned = df.select(
        *keys,
        F.floor(((c - mn) * nbins).cast("double")
                / span.cast("double")).cast("long").alias("bin"),
        mn.alias("_mn"), span.alias("_span"))
    return (binned.groupBy(*keys, "bin")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 # bin edges are group-constant: derive from (mn, span)
                 F.max(F.col("_mn") + F.floor(
                     (F.col("bin") * F.col("_span")).cast("double") / nbins)
                     .cast("long")).alias("bin_lo_cents"),
                 F.max(F.col("_mn") + F.floor(
                     ((F.col("bin") + 1) * F.col("_span")).cast("double") / nbins)
                     .cast("long") - 1).alias("bin_hi_cents")))
