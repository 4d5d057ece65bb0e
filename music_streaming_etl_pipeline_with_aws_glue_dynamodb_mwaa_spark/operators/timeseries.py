"""Calendar gap-fill and linear interpolation over keyed daily series —
the resampling step every time-series feature pipeline needs before a
model sees the data (regular grids, no missing rows).

The reference aggregates per (date, genre) and stops
(`REF/glue_jobs/transform.py:26-36`); days with no plays simply don't
exist in its output. This operator densifies: per key, every day from
the key's first to last observation exists exactly once, observed days
carry their exact value, and missing days are linearly interpolated
between the nearest observed neighbors.

Spark-first shape, ONE key exchange end to end:

1. per-(key, day) exact aggregation (caller supplies integer measures —
   e.g. money as cents — so the observed values oracle-hash);
2. per-key day grid via ``sequence(min_day, max_day)`` + ``explode`` —
   a JVM generator, no driver loop, no UDF;
3. left join of the grid onto the observations **on the same key** —
   AQE sees both sides partitioned by key;
4. previous/next observed (day, value) via ``last(..., ignorenulls)``
   forward scan and ``first(..., ignorenulls)`` backward scan — the
   standard LOCF/NOCB window pair, both riding the key partitioning;
5. fill = prev + (next − prev) · ((day − prev_day) / (next_day −
   prev_day)) — subtractions of exact longs, then ONE division, ONE
   multiply, ONE add, parenthesized identically in the SQL oracle, so
   even the interpolated DOUBLEs hash bit for bit.

At 100 TB the explode fan-out is bounded by the key's calendar span
(≤ 365·years rows/key/year) — dense but linear; skewed "immortal" keys
amortize across the same key exchange the aggregation already paid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill_linear(daily: DataFrame, keys: list[str], day_col: str,
                   val_col: str) -> DataFrame:
    """Densify a per-(key, day) series to each key's full day range and
    linearly interpolate missing days.

    ``daily`` must hold one row per (keys, day) with an exact numeric
    ``val_col`` (long). Returns one row per (keys, day in span) with:
    ``val`` (the observed long, NULL on filled days), ``filled_value``
    (DOUBLE: the observed value, or the interpolation), and
    ``is_interpolated``.
    """
    grid = (daily.groupBy(*keys)
            .agg(F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1"))
            .select(*keys, F.explode(F.sequence("_d0", "_d1"))
                    .alias(day_col)))
    joined = grid.join(daily, [*keys, day_col], "left")

    w = Window.partitionBy(*keys).orderBy(day_col)
    before = w.rowsBetween(Window.unboundedPreceding, 0)
    after = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last(val_col, ignorenulls=True).over(before)
    next_v = F.first(val_col, ignorenulls=True).over(after)
    obs_day = F.when(F.col(val_col).isNotNull(), F.col(day_col))
    prev_d = F.last(obs_day, ignorenulls=True).over(before)
    next_d = F.first(obs_day, ignorenulls=True).over(after)

    # Exact long arithmetic up to one (div, mul, add) IEEE tail — the
    # oracle SQL mirrors this parenthesization token for token.
    frac = (F.datediff(F.col(day_col), prev_d).cast("double")
            / F.datediff(next_d, prev_d).cast("double"))
    interp = (prev_v.cast("double")
              + (next_v - prev_v).cast("double") * frac)
    filled = F.when(F.col(val_col).isNotNull(),
                    F.col(val_col).cast("double")).otherwise(interp)
    return joined.select(
        *keys, day_col,
        F.col(val_col).alias("val"),
        filled.alias("filled_value"),
        F.col(val_col).isNull().alias("is_interpolated"))


def cusum_changepoint(df: DataFrame, keys: list[str], order_col: str,
                      val_col: str, *,
                      tiebreak: list[str] | None = None) -> DataFrame:
    """Per-key single change-point locator via the INTEGER-exact scaled
    CUSUM: at ordered position i of n, C_i = n·S_i − i·S_n (S = running
    sum of the exact long ``val_col``) — n² × the classic mean-shift
    statistic S_i − (i/n)·S_n, cleared of both divisions, so the whole
    search is BIGINT comparisons and hash-exact.

    Returns one row per key: (keys, n, split_idx, split_at, cusum_scaled)
    where |C| peaks (first position on ties — deterministic), ``split_at``
    the ``order_col`` value at that position. The peak position estimates
    where the series' mean shifts (Page's CUSUM / binary-segmentation
    step 1).

    Plan: one key-partitioned ordered window (running sum + row_number),
    the per-key totals ride the same exchange, then a rank-1 window →
    WindowGroupLimit. Overflow envelope: |n·S| < 2⁶³ — per-key series up
    to ~10⁶ rows of ~10⁶-unit values; shard longer keys by coarse time
    first (same pattern as spans.py's note). Pass ``tiebreak`` columns
    whenever ``order_col`` isn't unique per key — the statistic is
    order-dependent, so the total order must be deterministic.
    """
    w = Window.partitionBy(*keys).orderBy(order_col, *(tiebreak or []))
    run = df.select(
        *keys, order_col,
        F.sum(val_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_s"),
        F.row_number().over(w).cast("bigint").alias("_i"),
        F.sum(val_col).over(
            Window.partitionBy(*keys).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_tot"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*keys).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"))
    c = (F.col("n") * F.col("_s") - F.col("_i") * F.col("_tot"))
    scored = run.withColumn("cusum_scaled", c)
    best = Window.partitionBy(*keys).orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("_i").asc())
    return (scored.withColumn("_rk", F.row_number().over(best))
            .filter(F.col("_rk") == 1)
            .select(*keys, "n", F.col("_i").alias("split_idx"),
                    F.col(order_col).alias("split_at"), "cusum_scaled"))


def series_ssd_topk(daily: DataFrame, key_col: str, day_col: str,
                    val_col: str, query_keys: list, *,
                    k: int = 3) -> DataFrame:
    """Distributed top-k time-series similarity search (the
    EDBT'19/'20 / REPOSE problem re-expressed relationally): for each
    query key, the ``k`` keys whose daily ``val_col`` series (missing
    days = 0) is closest by squared Euclidean distance.

    EXACT and hash-portable because the whole computation stays in
    BIGINT: SSD(a, b) = Σa² + Σb² − 2·Σ(a_d·b_d over SHARED days) — the
    sparse decomposition, so there is NO dense per-key vector and no
    float fold anywhere. Plan:

    1. per-key norm² (one aggregation over the sparse daily table);
    2. dot products: query slice (bounded, broadcast) ⋈ daily on the
       day key — only co-observed days produce terms, so the join is
       sparse-sized, never |keys|²·|days|;
    3. assemble SSD via broadcast norm lookups (missing dot ⇒ 0), drop
       self-pairs, rank-k per query on (ssd asc, key asc) →
       WindowGroupLimit.

    ``query_keys`` is a bounded literal set (same contract as
    ann_cosine_topk's query slice); for all-pairs similarity use the
    LSH/banding machinery in operators/similarity.py instead.
    """
    d = daily.select(F.col(key_col).alias("_k"),
                     F.col(day_col).alias("_day"),
                     F.col(val_col).alias("_v"))
    norms = d.groupBy("_k").agg(F.sum(F.col("_v") * F.col("_v"))
                                .alias("_n2"))
    q = d.where(F.col("_k").isin(query_keys)).select(
        F.col("_k").alias("query_key"), "_day",
        F.col("_v").alias("_qv"))
    dots = (F.broadcast(q).join(d, "_day")
            .groupBy("query_key", "_k")
            .agg(F.sum(F.col("_qv") * F.col("_v")).alias("_dot")))
    qn = norms.where(F.col("_k").isin(query_keys)).select(
        F.col("_k").alias("query_key"), F.col("_n2").alias("_qn2"))
    pairs = (norms.crossJoin(F.broadcast(qn))
             .where(F.col("_k") != F.col("query_key"))
             .join(dots, ["query_key", "_k"], "left")
             .select("query_key", F.col("_k").alias(key_col),
                     (F.col("_qn2") + F.col("_n2")
                      - 2 * F.coalesce("_dot", F.lit(0).cast("bigint")))
                     .alias("ssd")))
    w = Window.partitionBy("query_key").orderBy(
        F.col("ssd").asc(), F.col(key_col).asc())
    return (pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rnk") <= k)
            .select("query_key", key_col, "ssd", "rnk"))
