"""As-of join: inclusive tie semantics, both directions, tolerance,
unmatched-null behavior, and a brute-force reference on random data."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import asof


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (2, _ts(20), "a"), (3, _ts(5), "b"),
         (4, _ts(30), "c")],
        "lid bigint, ts timestamp, k string")
    right = spark.createDataFrame(
        [(100, _ts(10), "a"), (101, _ts(15), "a"), (102, _ts(25), "b")],
        "rid bigint, ts timestamp, k string")
    return left, right


def test_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    out = asof.asof_join(left, right, ["k"], right_cols=["rid"])
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    # lid1: rid100 at same instant (inclusive); lid2: latest ≤ is rid101;
    # lid3: b's only right row is later -> null; lid4: key c has no rows
    assert got == {1: 100, 2: 101, 3: None, 4: None}


def test_forward(spark):
    left, right = _frames(spark)
    out = asof.asof_join(left, right, ["k"], right_cols=["rid"],
                         direction="forward")
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 100, 2: None, 3: 102, 4: None}


def test_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    out = asof.asof_join(left, right, ["k"], right_cols=["rid"],
                         tolerance_seconds=60)
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    # lid2's nearest match is 5 min old -> outside the 60 s budget
    assert got == {1: 100, 2: None, 3: None, 4: None}


def test_matches_brute_force_random(spark):
    rng = random.Random(11)
    lrows = [(i, _ts(0) + dt.timedelta(seconds=rng.randrange(7200)),
              str(rng.randrange(4))) for i in range(80)]
    rrows = [(1000 + i, _ts(0) + dt.timedelta(seconds=rng.randrange(7200)),
              str(rng.randrange(4))) for i in range(60)]
    left = spark.createDataFrame(lrows, "lid bigint, ts timestamp, k string")
    right = spark.createDataFrame(rrows, "rid bigint, ts timestamp, k string")
    out = {r["lid"]: r["asof_rid"]
           for r in asof.asof_join(left, right, ["k"],
                                   right_cols=["rid"]).collect()}

    def expect(lts, k):
        cands = [(ts, rid) for rid, ts, rk in rrows if rk == k and ts <= lts]
        return max(cands)[1] if cands else None

    assert out == {lid: expect(ts, k) for lid, ts, k in lrows}


def test_left_columns_and_payload_preserved(spark):
    left, right = _frames(spark)
    out = asof.asof_join(left, right, ["k"])
    assert out.columns == ["lid", "ts", "k", "asof_rid", "asof_ts"]
    row = {r["lid"]: r for r in out.collect()}[2]
    assert row["asof_ts"] == _ts(15) and row["asof_rid"] == 101
