"""Bottom-k (KMV) sketches (operators/kmv.py, E118).

Pins: sample is the k smallest hashes regardless of row order/duplicates;
overlap counts are exact within-sample; the Jaccard estimate converges to
the true Jaccard for a nested set system; small-universe degeneracy (k >=
|universe|) makes estimates EXACT.
"""

from __future__ import annotations

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kmv


def test_sample_deterministic_and_bounded(spark):
    rows = [(v,) for v in range(100)] + [(v,) for v in range(50)]  # dupes
    df = spark.createDataFrame(rows, "user_id long")
    s1 = kmv.bottomk_sample(df, "user_id", k=10).collect()
    s2 = kmv.bottomk_sample(
        df.orderBy("user_id", ascending=False), "user_id", k=10).collect()
    assert [r["user_id"] for r in s1] == [r["user_id"] for r in s2]
    assert len(s1) == 10
    assert [r["r"] for r in s1] == list(range(1, 11))
    hvs = [r["hv"] for r in s1]
    assert hvs == sorted(hvs)


def test_overlap_exact_when_k_covers_universe(spark):
    # A={0..9}, B={5..14}: true inter 5, union 15.
    rows = [("A", v) for v in range(10)] + [("B", v) for v in range(5, 15)]
    df = spark.createDataFrame(rows, "s string, member long")
    [r] = kmv.set_overlap_estimates(df, "s", "member", k=100).collect()
    assert (r["set_a"], r["set_b"]) == ("A", "B")
    assert (r["m_a"], r["m_b"], r["n_inter"], r["n_union"]) == (10, 10, 5, 15)
    assert abs(r["est_jaccard"] - 5 / 15) < 1e-12


def test_overlap_estimate_converges(spark):
    # A = all of 0..1999, B = evens: true Jaccard = 0.5.
    rows = [("A", v) for v in range(2000)] + \
        [("B", v) for v in range(0, 2000, 2)]
    df = spark.createDataFrame(rows, "s string, member long")
    [r] = kmv.set_overlap_estimates(df, "s", "member", k=256).collect()
    assert r["m_a"] == 256          # sample drawn from A's full universe
    assert abs(r["est_jaccard"] - 0.5) < 0.15
