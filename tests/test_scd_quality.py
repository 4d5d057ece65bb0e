"""SCD2 build/lookup, salted join, quality expectations, per-group
sampling, incremental aggregate merge."""

from __future__ import annotations

import datetime as dt

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    merge,
    quality,
    sampling,
    scd,
    skew,
)

TS = dt.datetime  # noqa: N816


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


# ---------------------------------------------------------------- scd2_build

def test_scd2_build_compresses_runs(spark):
    log = spark.createDataFrame(
        [(1, _ts(9), "A"), (1, _ts(10), "A"), (1, _ts(11), "B"),
         (1, _ts(12), "A"),                       # return to A = NEW version
         (2, _ts(9), "X")],
        "k long, ts timestamp, state string")
    out = scd.scd2_build(log, ["k"], "ts", ["state"]).collect()
    by_key = sorted(((r["k"], r["valid_from"], r["state"], r["valid_to"],
                      r["is_current"]) for r in out))
    assert by_key == [
        (1, _ts(9), "A", _ts(11), False),
        (1, _ts(11), "B", _ts(12), False),
        (1, _ts(12), "A", None, True),
        (2, _ts(9), "X", None, True),
    ]


def test_scd2_build_null_state_not_spurious(spark):
    log = spark.createDataFrame(
        [(1, _ts(9), None), (1, _ts(10), None), (1, _ts(11), "B")],
        "k long, ts timestamp, state string")
    out = sorted(scd.scd2_build(log, ["k"], "ts", ["state"]).collect(),
                 key=lambda r: r["valid_from"])
    assert [(r["state"], r["valid_from"]) for r in out] == \
        [(None, _ts(9)), ("B", _ts(11))]


def test_scd2_lookup_picks_active_version(spark):
    hist = spark.createDataFrame(
        [(1, "A", _ts(9), _ts(11)), (1, "B", _ts(11), None)],
        "k long, state string, valid_from timestamp, valid_to timestamp")
    facts = spark.createDataFrame(
        [(100, 1, _ts(8)),    # before first version -> NULL
         (101, 1, _ts(9)),    # inclusive valid_from
         (102, 1, _ts(10, 59)),
         (103, 1, _ts(11)),   # exclusive valid_to -> B
         (104, 2, _ts(12))],  # unknown key -> NULL
        "fid long, k long, ts timestamp")
    out = {r["fid"]: r["dim_state"]
           for r in scd.scd2_lookup(facts, hist, ["k"], "ts",
                                    attr_cols=["state"]).collect()}
    assert out == {100: None, 101: "A", 102: "A", 103: "B", 104: None}
    # half-open intervals: join must not fan out
    assert len(out) == 5


# --------------------------------------------------------------- salted join

def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "id long, k long")
    right = spark.createDataFrame(
        [(0, "zero"), (0, "zero2"), (1, "one")], "k long, label string")
    got = sorted((r["id"], r["label"]) for r in
                 skew.salted_join(left, right, ["k"], buckets=4).collect())
    want = sorted((r["id"], r["label"]) for r in
                  left.join(right, "k").collect())
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 7), (2, 8)], "id long, k long")
    right = spark.createDataFrame([(7, "x")], "k long, v string")
    out = {r["id"]: r["v"] for r in
           skew.salted_join(left, right, ["k"], buckets=3, how="left").collect()}
    assert out == {1: "x", 2: None}


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        skew.salted_join(df, df, ["id"], how="full_outer")


# ---------------------------------------------------------------- quality

def test_expectations_report(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0, "1-URGENT"),
         (2, "O", -5.0, "9-BAD"),          # range + regex violations
         (2, "Z", 3.0, "2-HIGH"),          # dup key + bad status
         (None, "F", 1.0, "3-MEDIUM")],    # null key
        "k long, status string, amount double, prio string")
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    rep = {r["check"]: (r["n_violations"], r["passed"])
           for r in (quality.Expectations()
                     .expect_not_null("k")
                     .expect_unique(["k"])
                     .expect_accepted_values("status", ["O", "F"])
                     .expect_in_range("amount", lo=0)
                     .expect_matches("prio", "^[1-5]-")
                     .expect_fk("k", dim, "dk")
                     .report(df)).collect()}
    assert rep["not_null(k)"] == (1, False)
    assert rep["unique(k)"] == (1, False)          # 4 rows, 3 distinct keys
    assert rep["accepted_values(status)"] == (1, False)
    assert rep["in_range(amount)"] == (1, False)
    assert rep["matches(prio)"] == (1, False)
    assert rep["fk(k)"] == (0, True)               # nulls skipped, 1/2 present


def test_expectations_validate_gate(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    assert quality.Expectations().expect_not_null("k") \
        .expect_unique(["k"]).validate(df)
    assert not quality.Expectations().expect_in_range("k", hi=1).validate(df)


def test_expectations_empty_table_passes_row_checks(spark):
    df = spark.createDataFrame([], "k long")
    rep = quality.Expectations().expect_not_null("k").report(df).collect()
    assert rep[0]["n_violations"] == 0 and rep[0]["passed"]


# ---------------------------------------------------------------- sampling

def test_sample_n_per_group_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], "id long, g string")
    a = sampling.sample_n_per_group(df, ["g"], "id", 4)
    b = sampling.sample_n_per_group(df.repartition(7), ["g"], "id", 4)
    ra = sorted((r["g"], r["id"]) for r in a.collect())
    rb = sorted((r["g"], r["id"]) for r in b.collect())
    assert ra == rb                      # partition-layout independent
    from collections import Counter
    assert set(Counter(g for g, _ in ra).values()) == {4}


def test_sample_n_per_group_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "id long, g string")
    assert sampling.sample_n_per_group(df, ["g"], "id", 10).count() == 2


# ------------------------------------------------------- merge_aggregates

def test_merge_aggregates_equals_full_agg(spark):
    from pyspark.sql import functions as F
    rows = [(i % 5, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v double")

    def agg(d):
        return d.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("v").alias("sum_v"),
                                  F.min("v").alias("min_v"))

    parts = [agg(df.filter(F.col("v") < 100)),
             agg(df.filter(F.col("v") >= 100))]
    merged = {r["k"]: (r["n"], r["sum_v"], r["min_v"]) for r in
              merge.merge_aggregates(parts, ["k"],
                                     {"n": "sum", "sum_v": "sum",
                                      "min_v": "min"}).collect()}
    full = {r["k"]: (r["n"], r["sum_v"], r["min_v"])
            for r in agg(df).collect()}
    assert merged == full


def test_merge_aggregates_rejects_non_monoid(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        merge.merge_aggregates([df], ["id"], {"avg_v": "avg"})
