"""The analytical core: daily-genre KPI aggregation (SURVEY.md §3.2).

Re-expresses ``REF/glue_jobs/transform.py:13-36`` as a composable operator:

    streams + to_date(listen_time)                  (:19,  F2)
    songs projected to 4 columns                    (:20,  F1)
    inner equi-join on track_id                     (:23,  J1)
    groupBy(listen_date, track_genre).agg(
        countDistinct(user_id)  AS unique_listeners (:27)
        sum(duration_ms)        AS total_listening_time (:28)
        count(track_id)         AS listen_count     (:29)
    )                                               (A1)
    + avg_listening_time_per_user = total/unique    (:33-36, A4/F3)

Scale posture (100 TB fact side):
- the songs dim is broadcast (explicit ``F.broadcast`` — the canonical
  broadcast-hash-join; no shuffle of the fact table for the join).
- exact ``countDistinct`` forces Spark's distinct-expand + double shuffle —
  correct but the #1 scale risk (SURVEY.md §2.4). ``approx=True`` swaps in
  ``approx_count_distinct`` (HLL++, single shuffle) as the documented scale
  variant; the oracle checks the exact one.
- the join output fans out to three consumers in the reference without
  caching (recomputed 3×, ``transform.py:53-55``); callers here persist the
  joined frame once (see plans.pipeline).

The semantic trap preserved faithfully: ``avg_listening_time_per_user`` is a
ratio of two aggregates (total time / distinct listeners), NOT ``avg()`` per
stream row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import safe_div


def with_listen_date(streams: DataFrame, ts_col: str = "listen_time") -> DataFrame:
    """F2: derive the daily bucket from the event timestamp
    (REF/glue_jobs/transform.py:19)."""
    return streams.withColumn("listen_date", F.to_date(F.col(ts_col)))


def join_streams_songs(streams: DataFrame, songs: DataFrame,
                       key: str = "track_id") -> DataFrame:
    """J1: fact ⋈ dim inner equi-join (REF/glue_jobs/transform.py:23),
    dim side broadcast."""
    return streams.join(F.broadcast(songs), on=key, how="inner")


def daily_genre_kpis(joined: DataFrame, *, approx: bool = False,
                     approx_rsd: float = 0.05) -> DataFrame:
    """A1 + A4: per (listen_date, track_genre) KPIs
    (REF/glue_jobs/transform.py:26-36).

    ``duration_ms`` is integral (SURVEY.md §1.2), so the sum is exact under
    any parallel aggregation order, and the derived average is one IEEE
    division of exact inputs — deterministic across runs and engines (no
    rounding needed; ROUND semantics on doubles differ between engines at
    .5 boundaries).

    ``approx=True`` swaps HLL++ (``approx_count_distinct``) for the exact
    distinct. Error bound: ``approx_rsd`` is HLL++'s target relative
    standard deviation (default 0.05) for LARGE cardinalities; Spark's
    implementation is dense-only (no sparse-exact mode), so tiny groups
    additionally carry O(1) absolute error (measured ≤2 counts at sf0.01).
    Asserted against the exact operator in
    tests/test_kpi.py::test_approx_kpis_within_rsd.
    """
    distinct_users = (
        F.approx_count_distinct("user_id", approx_rsd) if approx
        else F.countDistinct("user_id")
    ).alias("unique_listeners")
    kpis = joined.groupBy("listen_date", "track_genre").agg(
        distinct_users,
        F.sum("duration_ms").alias("total_listening_time"),
        F.count("track_id").alias("listen_count"),
    )
    return kpis.withColumn(
        "avg_listening_time_per_user",
        safe_div(F.col("total_listening_time"), F.col("unique_listeners")),
    )


def genre_kpi_pipeline(streams: DataFrame, songs: DataFrame, *,
                       approx: bool = False, approx_rsd: float = 0.05) -> DataFrame:
    """The flagship chain: F2 → F1 → J1 → A1 → A4."""
    return daily_genre_kpis(
        join_streams_songs(with_listen_date(streams), songs),
        approx=approx, approx_rsd=approx_rsd,
    )


def daily_genre_kpis_portable_approx(joined: DataFrame, *,
                                     lg_k: int = 12) -> DataFrame:
    """A1 + A4 with the distinct count replaced by the PORTABLE
    register-table HLL estimate (operators/sketches.py §HLL-as-a-table)
    — round 11's oracle-exact scale variant: exact sums ride one hash
    agg, the uniques estimate rides the register pipeline on the SAME
    keys (co-partitioned join, no extra exchange under AQE), and every
    float step is reproducible bit-for-bit in DuckDB. The engine-native
    ``approx_count_distinct`` path (daily_genre_kpis(approx=True))
    remains the zero-extra-shuffle production alternative.

    ``unique_listeners_est`` is the double estimate; the derived average
    divides the exact total by it (one IEEE division). Groups whose
    user_id is entirely NULL keep their exact KPIs with NULL estimate,
    mirroring the sketch only-sees-inserts contract.

    Round 12 (guide §2.4): exact measures and register pipeline fused
    into ONE fact pass — the r11 form computed them as two subtrees over
    the same scan+join (two fact passes, two fact-sized exchanges); now
    the exact sums ride the register aggregation's level-1 grain
    (keys..., j), which refines the report grain, so one scan + one
    bounded exchange (≤ groups·(2^lg_k + 1) partial rows) feeds both.
    Bit-identical output (two-level BIGINT sums are associative-exact;
    the estimate arithmetic is unchanged — pinned by
    tests/test_kpi.py::test_portable_approx_fused_equals_two_pass)."""
    from . import sketches
    keys = ["listen_date", "track_genre"]
    lvl1 = sketches.hll_fused_level1(
        joined, keys, F.col("user_id"), lg_k=lg_k,
        measure_aggs=[F.sum("duration_ms").alias("_d"),
                      F.count("track_id").alias("_c")])
    out = sketches.hll_fused_estimates(
        lvl1, keys, lg_k=lg_k, out_col="unique_listeners_est",
        measure_aggs=[F.sum("_d").alias("total_listening_time"),
                      # coalesce keeps count()'s non-nullable schema (a
                      # group always has >= 1 level-1 row, so the sum is
                      # never actually NULL)
                      F.coalesce(F.sum("_c"), F.lit(0).cast("long"))
                      .alias("listen_count")])
    return out.select(*keys, "unique_listeners_est",
                      "total_listening_time", "listen_count",
                      (F.col("total_listening_time").cast("double")
                       / F.col("unique_listeners_est"))
                      .alias("avg_listening_time_per_user"))
