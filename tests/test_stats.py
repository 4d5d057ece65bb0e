"""Distribution stats: parity with numpy references, edge cases (single-row
groups), and the one-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import stats

ROWS = [("a", 1.00), ("a", 2.00), ("a", 3.00), ("a", 10.00),
        ("b", 5.50), ("b", 5.50), ("b", 7.25),
        ("c", 42.42)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "k string, value double")


def test_group_moments_match_numpy(df):
    out = {r["k"]: r for r in
           stats.group_moments(df, ["k"], "value").collect()}
    for k in ("a", "b"):
        vals = np.array([int(v * 100 + 0.5) for g, v in ROWS if g == k])
        assert out[k]["n"] == len(vals)
        assert out[k]["sum_cents"] == vals.sum()
        assert out[k]["sumsq_cents"] == (vals.astype(np.int64) ** 2).sum()
        assert out[k]["mean_cents"] == pytest.approx(vals.mean(), abs=1e-9)
        assert out[k]["var_cents"] == pytest.approx(vals.var(ddof=1), rel=1e-12)
    # single-row group: variance/stddev NULL, not a crash or inf
    assert out["c"]["var_cents"] is None and out["c"]["stddev_cents"] is None


def test_zscore_flags_match_numpy(df):
    out = [r for r in stats.zscore_flags(df, ["k"], "value",
                                         z_threshold=1.0).collect()
           if r["k"] == "a"]
    vals = np.array([int(v * 100 + 0.5) for g, v in ROWS if g == "a"],
                    dtype=np.float64)
    mu, sd = vals.mean(), vals.std(ddof=1)
    expect = {v: (v - mu) / sd for v in vals}
    for r in out:
        c = int(r["value"] * 100 + 0.5)
        assert r["z"] == pytest.approx(expect[c], rel=1e-12)
        assert r["is_anomaly"] == (abs(expect[c]) > 1.0)
    # single-row group: z NULL, flag False
    crow = [r for r in stats.zscore_flags(df, ["k"], "value").collect()
            if r["k"] == "c"][0]
    assert crow["z"] is None and crow["is_anomaly"] is False


def test_percentiles_match_numpy(df):
    out = {r["k"]: r for r in
           stats.group_percentiles(df, ["k"], "value",
                                   ps=(0.5, 0.95)).collect()}
    for k in ("a", "b", "c"):
        vals = np.array(sorted(int(v * 100 + 0.5) for g, v in ROWS if g == k),
                        dtype=np.float64)
        assert out[k]["p50_cents"] == pytest.approx(
            np.percentile(vals, 50, method="linear"), rel=1e-12)
        assert out[k]["p95_cents"] == pytest.approx(
            np.percentile(vals, 95, method="linear"), rel=1e-12)


def test_zscore_single_shuffle_no_join(df):
    plan = (stats.zscore_flags(df, ["k"], "value")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_percentiles_approx_close_to_exact(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
    ev = catalog.load_table(spark, "/root/testdata/sf0.001", "events")
    exact = {r["event_type"]: r for r in
             stats.group_percentiles(ev, ["event_type"], "value").collect()}
    approx = {r["event_type"]: r for r in
              stats.group_percentiles_approx(ev, ["event_type"],
                                             "value").collect()}
    # GK guarantees bounded RANK error (returns a real data value near the
    # target rank), so assert in rank space, not value space: the approx
    # value's rank within the group must sit within a few positions of
    # target (1/accuracy rank error ≈ exact at this size; slack for the
    # interpolated exact value falling between order statistics)
    grp = {}
    for r in ev.select("event_type", stats.cents("value").alias("c")).collect():
        grp.setdefault(r["event_type"], []).append(r["c"])
    for k, e in exact.items():
        vals = sorted(grp[k])
        n = len(vals)
        for col, p in (("p50_cents", 0.5), ("p95_cents", 0.95)):
            import bisect
            rank = bisect.bisect_left(vals, approx[k][col])
            assert abs(rank - p * (n - 1)) <= 3, (k, col, rank, p * n)


def test_gk_replay_matches_engine(spark):
    """pyref.GKReplay must reproduce Spark's percentile_approx EXACTLY
    under the pinned contract (single buffer, ascending inserts) — the
    basis for the events_value_percentiles_approx replay oracle. Covers
    single-batch (< 50000 head buffer) and multi-batch sizes, duplicate-
    heavy and unique values, and three accuracies."""
    import random

    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import pyref

    rng = random.Random(7)
    sizes = (1, 2, 100, 2000, 9999, 10001, 60000)
    ps = (0.5, 0.95, 0.01, 0.25)
    for acc in (100, 10_000):
        for n in sizes:
            for dist in ("uniq", "dup"):
                hi = 500 if dist == "dup" else 10**9
                vals = sorted(float(rng.randint(0, hi)) for _ in range(n))
                df = spark.createDataFrame(
                    [(v,) for v in vals], "v double").coalesce(1)
                got = df.agg(F.percentile_approx(
                    "v", F.array(*[F.lit(p) for p in ps]),
                    F.lit(acc))).collect()[0][0]
                mine = pyref.gk_percentiles(vals, ps, acc)
                assert list(got) == mine, (acc, n, dist)


def test_pinned_gk_survives_many_groups_per_partition(spark):
    """round-12 (VERDICT r11 item 7): the pinned path SELF-RAISES the
    ObjectHashAggregate sort-fallback threshold, so >128 distinct keys
    landing in one partition — the caveat that previously could silently
    break the insert-order contract — still matches the pyref replay,
    including a group past the 50000-row GK head buffer where insert
    order genuinely matters."""
    import random

    import pandas as pd

    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import pyref

    rng = random.Random(12)
    ks: list[str] = []
    vs: list[float] = []
    for g in range(200):                 # 200 distinct keys > default 128
        n = 60_000 if g == 0 else 10     # g000 overflows the head buffer
        ks.extend([f"g{g:03d}"] * n)
        vs.extend(float(rng.randint(0, 500)) for _ in range(n))
    df = spark.createDataFrame(pd.DataFrame({"k": ks, "value": vs}))
    conf_key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_thr = spark.conf.get(conf_key, "128")
    spark.conf.set("spark.sql.shuffle.partitions", "1")  # all keys, 1 task
    spark.conf.set(conf_key, "128")      # stock threshold going in
    try:
        ps, acc = (0.5, 0.95), 100
        out = {r["k"]: [r["p50_cents"], r["p95_cents"]]
               for r in stats.group_percentiles_approx(
                   df, ["k"], "value", ps=ps, accuracy=acc,
                   pinned=True).collect()}
        # the pinned call must have raised the threshold itself
        assert int(spark.conf.get(conf_key)) \
            >= stats._GK_PINNED_FALLBACK_THRESHOLD
        groups: dict[str, list[float]] = {}
        for k, v in zip(ks, vs):
            groups.setdefault(k, []).append(float(int(v) * 100))
        assert len(out) == 200
        for k, vals in groups.items():
            assert out[k] == pyref.gk_percentiles(sorted(vals), ps, acc), k
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(conf_key, old_thr)


def test_pinned_percentiles_single_partition_per_group(spark):
    """The pinned plan's determinism contract: hash repartition on the
    group key puts every group in exactly one partition."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b", "c"] * 400,
                      "value": [float(i % 37) for i in range(1200)]}))
    out = stats.group_percentiles_approx(df, ["k"], "value", pinned=True)
    assert out.count() == 3
    # group → one partition: distinct partition ids per key == 1
    pinned_input = (df.select("k", stats.cents("value").alias("_c"))
                    .repartition(F.col("k"))
                    .withColumn("_pid", F.spark_partition_id()))
    per_key = (pinned_input.groupBy("k")
               .agg(F.countDistinct("_pid").alias("nparts")).collect())
    assert all(r["nparts"] == 1 for r in per_key)
