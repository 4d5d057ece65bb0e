"""Table profiling — the ANALYZE-style data-quality summary a pipeline
runs before trusting a new data drop: per-column row/non-null/distinct
counts in ONE pass over the data.

Shape: a single aggregation computes count + count(col) + count(DISTINCT
col) for every column simultaneously (Spark plans multi-distinct with one
Expand — one scan, not one job per column), then a literal-pivot unions
the k column summaries into (column, n_rows, n_nonnull, n_distinct) rows.
All exact integers → oracle hash-exact. (Min/max as strings are
deliberately excluded: engine float→string formatting differs; use the
typed stats operators for numeric columns.)

At 100 TB: exact multi-column DISTINCT is the expensive honest answer
(Expand multiplies rows by #distinct-columns); ``approx=True`` swaps in
HLL++ sketches — one pass, no Expand, mergeable — which is what you
actually run on the full lake (rows-only vs the oracle, same contract as
daily_genre_kpis_approx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None, *,
                  approx: bool = False) -> DataFrame:
    """(col_name, n_rows, n_nonnull, n_distinct) per profiled column —
    long-format, ordered by column name for determinism."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append((F.approx_count_distinct(c) if approx
                     else F.countDistinct(c)).alias(f"_nd_{c}"))
    one = df.agg(*aggs)
    stack = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("_n").alias("n_rows"),
                 F.col(f"_nn_{c}").alias("n_nonnull"),
                 F.col(f"_nd_{c}").alias("n_distinct"))
        for c in sorted(cols)])
    return (one.select(F.explode(stack).alias("p"))
            .select("p.col_name", "p.n_rows", "p.n_nonnull", "p.n_distinct"))


def benford_leading_digit(df: DataFrame, value: "F.Column") -> DataFrame:
    """Benford's-law audit table: distribution of the leading significant
    digit of an exact positive long measure — (digit, n, share), digits
    1–9, share = ONE division of exact longs (hash-exact). The ln-based
    Benford expectation (log10(1+1/d)) is deliberately NOT emitted —
    ln/exp aren't in the portable IEEE tree; compare client-side.

    One groupBy on a 9-value key; the digit extraction is string head of
    the long (no float log10), JVM-side.
    """
    digit = F.substring(value.cast("string"), 1, 1).cast("bigint")
    counts = (df.where(value > 0)
              .groupBy(digit.alias("digit"))
              .agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n").alias("_tot"))
    return (counts.crossJoin(F.broadcast(total))
            .select("digit", "n",
                    (F.col("n").cast("double")
                     / F.col("_tot").cast("double")).alias("share"))
            .orderBy("digit"))


def fd_audit(df: DataFrame, lhs_cols: list[str],
             rhs_cols: list[str]) -> DataFrame:
    """Functional-dependency audit ``lhs → rhs``: one row per lhs group
    with (lhs…, n_rows, n_rhs_distinct, violated) — the schema-inference
    / data-contract check ("does source determine lang?"). A group
    violates the FD iff it maps to more than one distinct rhs
    combination. Exact counts (BIGINT), so the table oracle-hashes.

    Plan: one hash aggregation at (lhs, rhs) grain, one at lhs grain —
    both partial+final map-side combined; no expensive
    ``countDistinct`` expand, no window. At 100 TB the grain is bounded
    by the attribute domain, not the fact row count.
    """
    pairs = (df.groupBy(*lhs_cols, *rhs_cols)
             .agg(F.count(F.lit(1)).alias("_c")))
    return (pairs.groupBy(*lhs_cols)
            .agg(F.sum("_c").alias("n_rows"),
                 F.count(F.lit(1)).alias("n_rhs_distinct"))
            .withColumn("violated", F.col("n_rhs_distinct") > 1))


def key_candidates_audit(df: DataFrame,
                         candidates: list[list[str]]) -> DataFrame:
    """Candidate-key audit: for each candidate column set, ONE row
    (candidate, n_rows, n_distinct, n_dup_rows, is_key) — the
    uniqueness profile a modeler reads before declaring a primary key
    or a dedup identity. n_dup_rows counts rows beyond the first of
    each duplicated combination (Σ max(c−1, 0)); is_key ⇔ no dup rows.

    Plan: one aggregation pair per candidate (combination grain then
    scalar), unioned — k candidates = k independent scans that AQE can
    run concurrently; nothing key-grain ever reaches the driver."""
    outs = []
    for cand in candidates:
        g = df.groupBy(*cand).agg(F.count(F.lit(1)).alias("_c"))
        outs.append(g.agg(
            F.lit(",".join(cand)).alias("candidate"),
            F.sum("_c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("_c") - 1).alias("n_dup_rows"),
        ).withColumn("is_key", F.col("n_dup_rows") == 0))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def profile_table_portable_approx(df: DataFrame, canon: list, *,
                                  lg_k: int = 12) -> DataFrame:
    """(col_name, n_rows, n_nonnull, n_distinct_est) — the ORACLE-EXACT
    approx profile (round 11): distinct estimates ride the portable
    register-table HLL (operators/sketches.py §HLL-as-a-table) over
    caller-declared CANONICAL KEYS ``[(col_name, Column)]`` — a
    documented per-type string form both engines render identically
    (ints/strings as-is, timestamps → epoch micros, doubles → the
    repo-wide exact-cents measure; engine float→string formatting is NOT
    portable, which is why the canon is explicit). NULL canonicals are
    excluded from the sketch (n_nonnull still counts them exactly).

    Shape (round 12, guide §2.4 — fused single pass): ONE melt
    (map-side explode, ×n_cols rows like profile_table's Expand) feeds
    the register pipeline AND the exact counts — the r11 form ran a
    separate exact-count scan next to the melt (two scans of the fact).
    The fused level-1 grain (col_name, j) carries the row/nonnull count
    partials next to rho_max, so the exchange still holds ≤
    n_cols·(2^lg_k + 1) partial rows per task regardless of input size
    (NULL canonicals land on j = NULL: counted in n_rows, excluded from
    the sketch). A literal col_name skeleton left-joins the result so an
    empty input still reports its n_cols zero rows — bit-identical
    output, pinned by tests/test_analytics_ops.py::
    test_profile_portable_fused_equals_two_pass."""
    from . import sketches
    canon = sorted(canon, key=lambda nc: nc[0])
    melted = df.select(F.explode(F.array(*[
        F.struct(F.lit(name).alias("col_name"),
                 c.cast("string").alias("v"))
        for name, c in canon])).alias("m")).select("m.*")
    lvl1 = sketches.hll_fused_level1(
        melted, ["col_name"], F.col("v"), lg_k=lg_k,
        measure_aggs=[F.count(F.lit(1)).alias("_cnt")])
    est = sketches.hll_fused_estimates(
        lvl1, ["col_name"], lg_k=lg_k, out_col="n_distinct_est",
        measure_aggs=[
            F.sum("_cnt").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("j").isNotNull(),
                                    F.col("_cnt"))),
                       F.lit(0)).alias("n_nonnull")])
    skeleton = df.sparkSession.createDataFrame(
        [(name,) for name, _ in canon], "col_name string")
    return (skeleton.join(est, "col_name", "left")
            .select("col_name",
                    F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                    F.coalesce("n_nonnull", F.lit(0)).alias("n_nonnull"),
                    "n_distinct_est"))
