from __future__ import annotations

import datetime

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi, topk
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

from .conftest import SF_SMOKE

D = datetime.date


def _joined(spark):
    """Fixture with listen_count ties inside (date, genre) — FIXTURES.md §A."""
    rows = []
    # genre 'rock' on one day: 4 tracks, two tied at 2 plays -> rank must
    # tie-break alphabetically; k=3 must cut one track.
    plays = {"A": 3, "B": 2, "C": 2, "D": 1}
    for name, n in plays.items():
        rows += [(D(2024, 1, 1), "rock", name)] * n
    rows += [(D(2024, 1, 1), "jazz", "Z")]
    return spark.createDataFrame(rows, "listen_date date, track_genre string, track_name string")


def test_top_songs_tie_break_deterministic(spark):
    out = topk.top_songs_per_genre(_joined(spark), k=3)
    got = [(r["track_name"], r["rank"]) for r in
           out.filter("track_genre = 'rock'").orderBy("rank").collect()]
    # B beats C on the alphabetical tie-break; D (1 play) is cut by k=3
    assert got == [("A", 1), ("B", 2), ("C", 3)]


def test_top_genres_k_cuts(spark):
    rows = [(D(2024, 1, 1), g, "t") for g in "abcdefg" for _ in range(1)]
    df = spark.createDataFrame(rows, "listen_date date, track_genre string, track_name string")
    out = topk.top_genres_per_day(df, k=5).collect()
    assert len(out) == 5
    # all counts tied at 1 -> alphabetical genres win
    assert sorted(r["track_genre"] for r in out) == list("abcde")


def test_window_group_limit_in_plan(spark):
    """Spark ≥3.5 must push rank<=k into WindowGroupLimit — the top-k is not
    a full per-group sort at scale (SURVEY.md §4)."""
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, SF_SMOKE, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, SF_SMOKE, "part"))
    joined = kpi.join_streams_songs(kpi.with_listen_date(streams), songs)
    plan = topk.top_songs_per_genre(joined)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
