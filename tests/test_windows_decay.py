"""Sliding-window distinct actives (E92) and exponential time-decay
scoring (E93): brute-force reference parity + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import stats


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1 active days 0,1,9; user 2 active days 1,2; user 3 day 9 twice
    for u, d, v in [(1, 0, 1.00), (1, 1, 2.00), (1, 9, 4.00),
                    (2, 1, 8.00), (2, 2, 16.00),
                    (3, 9, 32.00), (3, 9, 64.00)]:
        rows.append((u, base + dt.timedelta(days=d, hours=u), float(v)))
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_sliding_distinct_matches_bruteforce(spark):
    ev = _events(spark)
    out = {r["report_day"]: r["active"]
           for r in stats.sliding_distinct_count(
               ev, "user_id", "ts", window_days=3).collect()}
    # brute force: day d counts users active in [d-2, d]
    active = {(1, 0), (1, 1), (1, 9), (2, 1), (2, 2), (3, 9)}
    days = sorted({d for _, d in active})
    for d in range(0, 10):
        expect = len({u for (u, ad) in active if d - 2 <= ad <= d})
        got = out.get(dt.date(2024, 1, 1) + dt.timedelta(days=d), 0)
        assert got == expect, (d, got, expect)
    # report days stop at the max observed day (no phantom tail), and
    # fully-inactive windows produce NO row (sparse output, not zero-fill —
    # compose with streaming/windowed.dense grid when zeros are needed)
    assert max(out) == dt.date(2024, 1, 10)
    assert set(out) == {dt.date(2024, 1, 1) + dt.timedelta(days=d)
                        for d in (0, 1, 2, 3, 4, 9)}


def test_sliding_distinct_no_fact_rescan(spark):
    ev = _events(spark)
    plan = (stats.sliding_distinct_count(ev, "user_id", "ts", window_days=3)
            ._jdf.queryExecution().optimizedPlan().toString())
    # one explode, no join back to the fact, no window operator
    assert plan.count("Generate explode") == 1
    assert "Window" not in plan


def test_decayed_sum_matches_reference(spark):
    ev = _events(spark)
    out = {r["user_id"]: r for r in
           stats.decayed_sum(ev, ["user_id"], "value", "ts",
                             horizon_days=9).collect()}
    # max day = day 9; age = 9 - d; weight = 2^(9-age) = 2^d
    def ref(pairs):
        return sum(int(v * 100) * (1 << (9 - (9 - d))) for d, v in pairs)
    assert out[1]["decay_scaled"] == ref([(0, 1.0), (1, 2.0), (9, 4.0)])
    assert out[2]["decay_scaled"] == ref([(1, 8.0), (2, 16.0)])
    assert out[3]["decay_scaled"] == ref([(9, 32.0), (9, 64.0)])
    for r in out.values():
        assert abs(r["decay_score"] - r["decay_scaled"] / 512.0) < 1e-12


def test_decayed_sum_drops_events_past_horizon(spark):
    ev = _events(spark)
    out = {r["user_id"]: r["decay_scaled"] for r in
           stats.decayed_sum(ev, ["user_id"], "value", "ts",
                             horizon_days=2).collect()}
    # horizon 2 from day 9: only days 7..9 survive → users 1 (day 9) and 3
    assert set(out) == {1, 3}
    assert out[1] == 400 * (1 << 2)              # age 0 → shift 2
    assert out[3] == (3200 + 6400) * (1 << 2)


def test_gini_udaf_matches_numpy_reference(spark):
    import numpy as np
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.functions.udafs import gini_numerator

    vals = [5, 1, 1, 3, 10, 0, 7]
    df = spark.createDataFrame([("a", v) for v in vals] + [("b", 4)],
                               ["k", "cents"])
    out = {r["k"]: r["num"] for r in
           df.groupBy("k").agg(gini_numerator("cents").alias("num"))
           .collect()}
    x = np.sort(np.array(vals, dtype=np.int64))
    i = np.arange(1, len(x) + 1)
    assert out["a"] == int(((2 * i - len(x) - 1) * x).sum())
    assert out["b"] == 0  # single-member group: (2·1−1−1)·x = 0
    # classic identity: all-equal distribution → gini numerator 0
    eq = spark.createDataFrame([("c", 7)] * 5, ["k", "cents"])
    got = eq.groupBy("k").agg(gini_numerator("cents").alias("num")).collect()
    assert got[0]["num"] == 0
