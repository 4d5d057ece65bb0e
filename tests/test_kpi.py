from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

from .conftest import SF_SMOKE


def _tiny_fixture(spark):
    """Deterministic music-domain fixture per FIXTURES.md §A."""
    songs = spark.createDataFrame(
        [("t1", "Alpha", "rock", 200_000), ("t2", "Beta", "rock", 100_000),
         ("t3", "Gamma", "jazz", 300_000)],
        "track_id string, track_name string, track_genre string, duration_ms long",
    )
    ts = datetime.datetime
    streams = spark.createDataFrame(
        [
            ("u1", "t1", ts(2024, 1, 1, 10)),
            ("u1", "t1", ts(2024, 1, 1, 11)),   # same user twice → 1 unique
            ("u2", "t2", ts(2024, 1, 1, 12)),
            ("u3", "t3", ts(2024, 1, 2, 9)),
            ("u1", "tX", ts(2024, 1, 2, 9)),    # no song match → dropped by inner join
        ],
        "user_id string, track_id string, listen_time timestamp",
    )
    return streams, songs


def test_daily_genre_kpis_semantics(spark):
    streams, songs = _tiny_fixture(spark)
    out = kpi.genre_kpi_pipeline(streams, songs).collect()
    rows = {(str(r["listen_date"]), r["track_genre"]): r for r in out}
    # 2024-01-01 rock: users u1,u2 → 2 unique; 3 plays; total 200k+200k+100k
    r = rows[("2024-01-01", "rock")]
    assert r["unique_listeners"] == 2
    assert r["listen_count"] == 3
    assert r["total_listening_time"] == 500_000.0
    # avg is per UNIQUE LISTENER, not per stream (SURVEY.md §2.4 A4)
    assert r["avg_listening_time_per_user"] == 250_000.0
    # unmatched track dropped by inner join → no ('2024-01-02', None) group
    assert all(k[1] in ("rock", "jazz") for k in rows)


def test_avg_null_on_zero_unique(spark):
    # degenerate frame: all user_id null → countDistinct = 0 → avg null, not crash
    songs = spark.createDataFrame([("t1", "A", "rock", 10)],
                                  "track_id string, track_name string, track_genre string, duration_ms long")
    streams = spark.createDataFrame(
        [(None, "t1", datetime.datetime(2024, 1, 1))],
        "user_id string, track_id string, listen_time timestamp")
    out = kpi.genre_kpi_pipeline(streams, songs).collect()
    assert out[0]["unique_listeners"] == 0
    assert out[0]["avg_listening_time_per_user"] is None


def test_flagship_on_testdata(spark):
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, SF_SMOKE, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, SF_SMOKE, "part"))
    df = kpi.genre_kpi_pipeline(streams, songs)
    assert df.count() > 0
    assert df.filter(F.col("listen_count") <= 0).count() == 0


def test_approx_kpis_within_rsd(spark):
    """HLL++ error bound (VERDICT r1 #10): per-group approx unique_listeners
    vs the exact operator at sf0.01. With rsd=0.05, groups under the sparse
    threshold are exact; for the rest we allow 4 sigma per group plus a
    <= 1% violation budget at 2 sigma — loose enough to be deterministic,
    tight enough that a broken sketch (or a wrong rsd plumb-through) fails."""
    sf = "/root/testdata/sf0.01"
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, sf, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, sf, "part"))
    rsd = 0.05
    exact = kpi.genre_kpi_pipeline(streams, songs).select(
        "listen_date", "track_genre", F.col("unique_listeners").alias("n_exact"))
    approx = kpi.genre_kpi_pipeline(streams, songs, approx=True, approx_rsd=rsd).select(
        "listen_date", "track_genre", F.col("unique_listeners").alias("n_approx"))
    rows = exact.join(approx, ["listen_date", "track_genre"]).select(
        "n_exact", "n_approx").collect()
    assert len(rows) > 100
    # Spark's HLL++ is dense-only (no sparse-exact mode): tiny cardinalities
    # carry O(1) absolute error, large ones ~N(0, rsd) relative. Measured at
    # sf0.01 the worst deviation is 2 counts; 3 gives deterministic headroom.
    for r in rows:
        abs_err = abs(r["n_approx"] - r["n_exact"])
        assert (abs_err <= 3 if r["n_exact"] < 100
                else abs_err / r["n_exact"] <= 4 * rsd), dict(r.asDict())
    mean_abs = sum(abs(r["n_approx"] - r["n_exact"]) for r in rows) / len(rows)
    assert mean_abs <= 1.5


def test_broadcast_join_in_plan(spark):
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, SF_SMOKE, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, SF_SMOKE, "part"))
    plan = kpi.join_streams_songs(kpi.with_listen_date(streams), songs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_portable_approx_fused_equals_two_pass(spark):
    """Round-12 fusion guard: the single-pass (keys, j)-grain pipeline in
    daily_genre_kpis_portable_approx must reproduce the r11 two-pass form
    (separate exact agg + register table, left-joined) EXACTLY — including
    the NULL-estimate row for a group whose user_id is entirely NULL."""
    import datetime as dt

    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
        sketches,
    )

    ts = dt.datetime
    rows = [
        ("u1", "t1", ts(2024, 1, 1, 10)), ("u1", "t1", ts(2024, 1, 1, 11)),
        ("u2", "t2", ts(2024, 1, 1, 12)), ("u3", "t3", ts(2024, 1, 2, 9)),
        (None, "t3", ts(2024, 1, 2, 10)),        # null user inside a group
        (None, "t1", ts(2024, 1, 3, 9)),         # group with ONLY null users
    ]
    streams = spark.createDataFrame(
        rows, "user_id string, track_id string, listen_time timestamp")
    songs = spark.createDataFrame(
        [("t1", "Alpha", "rock", 200_000), ("t2", "Beta", "rock", 100_000),
         ("t3", "Gamma", "jazz", 300_000)],
        "track_id string, track_name string, track_genre string, duration_ms long")
    joined = kpi.join_streams_songs(kpi.with_listen_date(streams), songs)

    fused = kpi.daily_genre_kpis_portable_approx(joined)

    # the r11 two-pass reference form, built literally
    keys = ["listen_date", "track_genre"]
    exact = joined.groupBy(*keys).agg(
        F.sum("duration_ms").alias("total_listening_time"),
        F.count("track_id").alias("listen_count"))
    est = sketches.hll_distinct_estimates(
        joined, keys, F.col("user_id"), out_col="unique_listeners_est")
    two_pass = (exact.join(est, keys, "left")
                .select(*keys, "unique_listeners_est",
                        "total_listening_time", "listen_count",
                        (F.col("total_listening_time").cast("double")
                         / F.col("unique_listeners_est"))
                        .alias("avg_listening_time_per_user")))

    assert fused.schema == two_pass.schema
    f = sorted(map(tuple, fused.collect()))
    t = sorted(map(tuple, two_pass.collect()))
    assert f == t                      # bit-exact, doubles included
    # the only-null-user group really exercises the NULL-estimate path
    null_rows = [r for r in f if r[0] == dt.date(2024, 1, 3)]
    assert null_rows and null_rows[0][2] is None
