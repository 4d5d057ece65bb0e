from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import validate


def _df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string, c string")


def test_split_basic(spark):
    df = _df(spark, [("1", "x", None), ("2", None, "y"), (None, "z", "w"), ("3", "ok", "ok")])
    good, bad = validate.split_valid_invalid(df, ["a", "b"])
    assert {r["a"] for r in good.collect()} == {"1", "3"}
    assert bad.count() == 2  # null b, null a


def test_missing_required_column_hard_fails(spark):
    df = _df(spark, [("1", "x", "y")])
    with pytest.raises(validate.MissingRequiredColumns):
        validate.split_valid_invalid(df, ["a", "nope"])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.text(min_size=1, max_size=5)),
              st.one_of(st.none(), st.text(min_size=1, max_size=5)),
              st.one_of(st.none(), st.text(min_size=1, max_size=5))),
    min_size=0, max_size=30))
def test_split_invariants(spark, rows):
    """good ∪ bad == input and good ∩ bad == ∅ for any null pattern
    (SURVEY.md §5.4)."""
    df = _df(spark, rows) if rows else spark.createDataFrame([], "a string, b string, c string")
    good, bad = validate.split_valid_invalid(df, ["a", "b"])
    n_good, n_bad = good.count(), bad.count()
    assert n_good + n_bad == len(rows)
    expected_good = sum(1 for r in rows if r[0] is not None and r[1] is not None)
    assert n_good == expected_good


def test_corrupt_record_routed_to_quarantine(spark, tmp_path):
    """A CSV row that fails type coercion must land in bad, not crash."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.schemas import SONGS
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import io

    p = tmp_path / "songs.csv"
    p.write_text(
        "track_id,track_name,track_genre,duration_ms\n"
        "t1,Alpha,rock,200000\n"
        "t2,Beta,jazz,NOT_A_NUMBER\n"   # coercion failure -> corrupt
        "t3,,pop,1000\n"                # null required field
    )
    df = io.read_csv(spark, str(p), SONGS)
    good, bad = validate.split_valid_invalid(df, ["track_id", "track_name", "duration_ms"])
    assert {r["track_id"] for r in good.collect()} == {"t1"}
    assert bad.count() == 2
