"""HLL sketch columns: estimate accuracy, merge ≡ direct sketch of union,
rollup without raw rescan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sketches


def _events(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") % 10).alias("day"),
        ((F.col("id") * 2654435761) % 700).alias("user"))


def test_estimate_within_hll_error(spark):
    df = _events(spark)
    sk = sketches.distinct_sketches(df, ["day"], "user")
    est = {r["day"]: r["n_distinct_est"]
           for r in sketches.estimate(sk).collect()}
    exact = {r["day"]: r["n"]
             for r in df.groupBy("day")
             .agg(F.countDistinct("user").alias("n")).collect()}
    for day, n in exact.items():
        assert est[day] == pytest.approx(n, rel=0.05)


def test_merge_tracks_direct_sketch(spark):
    """Union of per-day sketches must estimate the union's cardinality
    within the same HLL error envelope as one global sketch. NOT asserted
    bit-identical: the union gadget may walk a different sparse→dense
    representation path than a direct sketch of the union, so the two
    estimates can differ by a few counts while both stay inside the lgK=12
    ±~1.6%·z bound vs truth."""
    df = _events(spark)
    daily = sketches.distinct_sketches(df, ["day"], "user")
    merged = sketches.merge_sketches(
        daily.withColumn("all", F.lit(1)), ["all"],
        estimate_col="n_distinct_est").first()["n_distinct_est"]
    direct = sketches.estimate(
        sketches.distinct_sketches(
            df.withColumn("all", F.lit(1)), ["all"], "user")
    ).first()["n_distinct_est"]
    exact = df.select("user").distinct().count()
    assert merged == pytest.approx(exact, rel=0.05)
    assert direct == pytest.approx(exact, rel=0.05)
    # merged estimate stays close to the direct-global estimate too
    assert merged == pytest.approx(direct, rel=0.05)


def test_rollup_grain_change(spark):
    df = _events(spark).withColumn("week", F.col("day") % 2)
    daily = sketches.distinct_sketches(df, ["week", "day"], "user")
    weekly = {r["week"]: r["est"] for r in sketches.merge_sketches(
        daily, ["week"], estimate_col="est").collect()}
    exact = {r["week"]: r["n"] for r in df.groupBy("week")
             .agg(F.countDistinct("user").alias("n")).collect()}
    assert set(weekly) == set(exact)
    for w, n in exact.items():
        assert weekly[w] == pytest.approx(n, rel=0.05)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key probes true (structural guarantee); on a
    disjoint probe set the 1008-bit/4-hash filter at n=200 keys stays
    well under a ~10% false-positive ceiling ((1-e^{-kn/m})^k ≈ 4.6%)."""
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bloom = sketches.bloom_build(keys, "k")
    # ≤ 16 words, each within the 63-bit mask
    rows = bloom.collect()
    assert len(rows) <= 16
    assert all(0 <= r["word_idx"] < 16 for r in rows)
    hits = sketches.bloom_probe(keys, bloom, "k").collect()
    assert all(r["in_bloom"] for r in hits) and len(hits) == 200
    others = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    fp = sketches.bloom_probe(others, bloom, "k") \
        .filter("in_bloom").count()
    assert fp / 2000 < 0.10


def test_bloom_merge_is_wordwise_or(spark):
    """bloom(A ∪ B) == wordwise-OR of bloom(A), bloom(B) — the mergeable
    no-rescan property the HLL/CMS families share."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 250).select(F.col("id").alias("k"))
    direct = {r["word_idx"]: r["bits"]
              for r in sketches.bloom_build(a.union(b), "k").collect()}
    merged = {r["word_idx"]: r["bits"] for r in
              (sketches.bloom_build(a, "k")
               .unionByName(sketches.bloom_build(b, "k"))
               .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
               .collect())}
    assert direct == merged
