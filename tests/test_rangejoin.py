"""Range join: boundary semantics per `closed`, overlapping intervals,
keyed matching, left-join nulls, brute-force parity, and the no-BNLJ plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import rangejoin


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 15), (4, 99)], "pid bigint, v bigint")
    ivals = spark.createDataFrame(
        [(100, 0, 10), (101, 10, 20), (102, 5, 15)],  # 102 overlaps both
        "iid bigint, lo bigint, hi bigint")
    return points, ivals


def test_closed_left_boundaries_and_overlap(frames):
    points, ivals = frames
    out = rangejoin.range_join(points, ivals, "v", "lo", "hi", closed="left")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # v=10: NOT in [0,10) but in [10,20) and [5,15); v=99 matches nothing
    assert got == [(1, 100), (1, 102), (2, 101), (2, 102), (3, 101)]


def test_closed_both(frames):
    points, ivals = frames
    out = rangejoin.range_join(points, ivals, "v", "lo", "hi", closed="both")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (1, 102), (2, 100), (2, 101), (2, 102),
                   (3, 101), (3, 102)]


def test_left_join_keeps_unmatched(frames):
    points, ivals = frames
    out = rangejoin.range_join(points, ivals, "v", "lo", "hi",
                               closed="left", how="left")
    rows = {r["pid"]: r for r in out.collect() if r["iid"] is None}
    assert list(rows) == [4] and rows[4]["lo"] is None


def test_keyed_range_join(spark):
    points = spark.createDataFrame([(1, "x", 5), (2, "y", 5)],
                                   "pid bigint, k string, v bigint")
    ivals = spark.createDataFrame([(10, "x", 0, 10)],
                                  "iid bigint, k string, lo bigint, hi bigint")
    out = rangejoin.range_join(points, ivals, "v", "lo", "hi",
                               keys=["k"], closed="left")
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 10)]


def test_matches_brute_force_random(spark):
    rng = random.Random(3)
    pts = [(i, rng.randrange(1000)) for i in range(150)]
    ivs = []
    for i in range(40):
        lo = rng.randrange(950)
        ivs.append((1000 + i, lo, lo + rng.randrange(1, 120)))
    points = spark.createDataFrame(pts, "pid bigint, v bigint")
    ivals = spark.createDataFrame(ivs, "iid bigint, lo bigint, hi bigint")
    for width in (None, 7, 500):
        out = rangejoin.range_join(points, ivals, "v", "lo", "hi",
                                   closed="left", bin_width=width)
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        expect = sorted((p, i) for p, v in pts for i, lo, hi in ivs
                        if lo <= v < hi)
        assert got == expect, f"width={width}"


def test_no_nested_loop_in_plan(frames):
    points, ivals = frames
    plan = (rangejoin.range_join(points, ivals, "v", "lo", "hi")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
