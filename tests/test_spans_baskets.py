"""Interval merge (gaps-and-islands), basket pair mining, per-group OLS."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import baskets, spans, stats


# ---------------------------------------------------------------- spans ---

def test_merge_intervals_basic(spark):
    df = spark.createDataFrame(
        [("u", 0, 10), ("u", 5, 12), ("u", 12, 20),   # overlap+touch → one
         ("u", 30, 40),                               # separate island
         ("v", 0, 1)],
        "k string, s long, e long")
    got = {(r["k"], r["span_start"], r["span_end"], r["n_spans"])
           for r in spans.merge_intervals(df, ["k"], "s", "e").collect()}
    assert got == {("u", 0, 20, 3), ("u", 30, 40, 1), ("v", 0, 1, 1)}


def test_merge_intervals_gap(spark):
    df = spark.createDataFrame(
        [("u", 0, 10), ("u", 13, 20), ("u", 26, 30)],
        "k string, s long, e long")
    # gap=3 bridges the 10→13 hole but not 20→26
    got = sorted((r["span_start"], r["span_end"]) for r in
                 spans.merge_intervals(df, ["k"], "s", "e",
                                       max_gap=3).collect())
    assert got == [(0, 20), (26, 30)]


def test_merge_intervals_contained_span(spark):
    # a span fully inside an earlier one must not split the island even
    # though its own end is small (running-max-end, not lag(end))
    df = spark.createDataFrame(
        [("u", 0, 100), ("u", 10, 20), ("u", 50, 200)],
        "k string, s long, e long")
    got = spans.merge_intervals(df, ["k"], "s", "e").collect()
    assert len(got) == 1 and got[0]["span_end"] == 200


def _brute_merge(ivs, gap=0):
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


def test_merge_intervals_random_parity(spark):
    rng = np.random.RandomState(7)
    rows = [("k%d" % rng.randint(4), int(s), int(s + rng.randint(1, 30)))
            for s in rng.randint(0, 200, size=300)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {}
    for r in spans.merge_intervals(df, ["k"], "s", "e").collect():
        got.setdefault(r["k"], set()).add(
            (r["span_start"], r["span_end"], r["n_spans"]))
    for k in set(r[0] for r in rows):
        expect = _brute_merge([(s, e) for kk, s, e in rows if kk == k])
        assert got[k] == expect, k


def test_interval_coverage(spark):
    df = spark.createDataFrame(
        [("u", 0, 10), ("u", 5, 12), ("u", 30, 40)],
        "k string, s long, e long")
    row = spans.interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert (row["n_islands"], row["n_spans"], row["covered"]) == (2, 3, 22)


def test_merge_single_exchange(spark):
    df = spark.createDataFrame([("u", 0, 1)], "k string, s long, e long")
    plan = spans.merge_intervals(df, ["k"], "s", "e") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# -------------------------------------------------------------- baskets ---

def test_pair_support_counts(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "c"), (4, "d")]          # d is infrequent at min_support=2
    df = spark.createDataFrame(rows, "bk long, it string")
    out = {(r["item_a"], r["item_b"]): r
           for r in baskets.pair_support(df, "bk", "it",
                                         min_support=2).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r["n_pair"], r["n_a"], r["n_b"], r["n_baskets"]) == (3, 3, 3, 4)
    assert r["support"] == pytest.approx(3 / 4)
    assert r["lift"] == pytest.approx(3 * 4 / (3 * 3))


def test_pair_support_duplicate_rows_collapse(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b"),
            (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk long, it string")
    r = baskets.pair_support(df, "bk", "it", min_support=2).collect()[0]
    assert r["n_pair"] == 2          # per-basket multiplicity ignored


def test_pair_support_mega_basket_cap(spark):
    # two mega-baskets of the same 50 items (so every item IS frequent and
    # the cap, which applies after pruning, is what drops them) + two small
    # baskets that keep the (i0, i1) pair alive
    rows = [(b, f"i{j}") for b in (0, 1) for j in range(50)] + \
           [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = baskets.pair_support(df, "bk", "it", min_support=2,
                               max_basket_size=10).collect()
    assert {(r["item_a"], r["item_b"], r["n_pair"]) for r in out} \
        == {("i0", "i1", 2)}


# ------------------------------------------------------------ group_ols ---

def test_group_ols_matches_numpy(spark):
    rng = np.random.RandomState(3)
    rows = []
    for g in ("a", "b"):
        for x in range(12):
            rows.append((g, x, float(2.5 * x + (5 if g == "a" else -3)
                                     + rng.randn() * 0.1)))
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {r["g"]: r for r in
           stats.group_ols(df, ["g"], "x", "y").collect()}
    for g in ("a", "b"):
        xs = np.array([r[1] for r in rows if r[0] == g], dtype=np.float64)
        ys = np.array([round(r[2] * 100) for r in rows if r[0] == g],
                      dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g]["slope_cents"] == pytest.approx(slope, rel=1e-9)
        assert got[g]["intercept_cents"] == pytest.approx(intercept, rel=1e-6)


def test_group_ols_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("one", 5, 1.0),                      # n=1
         ("flat", 7, 1.0), ("flat", 7, 2.0)],  # zero x-variance
        "g string, x long, y double")
    got = {r["g"]: r for r in stats.group_ols(df, ["g"], "x", "y").collect()}
    assert got["one"]["slope_cents"] is None
    assert got["flat"]["slope_cents"] is None
    assert got["flat"]["n"] == 2
