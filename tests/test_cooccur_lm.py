"""Co-occurrence pair enumeration vs brute force; bigram-LM scores vs
numpy; CMS table/estimate guarantees."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import cooccur, ranking, sketches


TEXTS = [(1, "a b c a b"),
         (2, "b c d"),
         (3, "a a a"),
         (4, "x")]


def _brute_pairs(texts, window):
    pc = Counter()
    for _, t in texts:
        toks = t.split(" ")
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pc[(a, b)] += 1
    return pc


def test_cooccurrence_counts_match_brute(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    for window in (1, 2, 3):
        got = {(r["a"], r["b"]): r["n_pair"]
               for r in cooccur.cooccurrence_counts(
                   df, "text", window=window).collect()}
        assert got == dict(_brute_pairs(TEXTS, window)), window


def test_association_ratio_values(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    out = {(r["a"], r["b"]): r for r in cooccur.association_scores(
        df, "text", window=2, min_pair_count=2).collect()}
    toks = [t for _, s in TEXTS for t in s.split(" ")]
    total, uni = len(toks), Counter(toks)
    brute = _brute_pairs(TEXTS, 2)
    assert set(out) == {p for p, c in brute.items() if c >= 2}
    for (a, b), r in out.items():
        assert r["n_pair"] == brute[(a, b)]
        assert r["assoc_ratio"] == pytest.approx(
            brute[(a, b)] * total / (2 * uni[a] * uni[b]))


def test_doc_lm_scores_match_numpy(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ranking.doc_lm_scores(df, "doc_id", "text", add_k=0.5).collect()}
    # reference: add-k bigram model trained on the same corpus
    bigrams, ctx = Counter(), Counter()
    for _, t in TEXTS:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            bigrams[(toks[i], toks[i + 1])] += 1
            ctx[toks[i]] += 1
    V = len(ctx) + 1
    for did, t in TEXTS:
        toks = t.split(" ")
        if len(toks) < 2:
            assert did not in got         # no bigrams → drops out
            continue
        lps = [math.log((bigrams[(toks[i], toks[i + 1])] + 0.5)
                        / (ctx[toks[i]] + 0.5 * V))
               for i in range(len(toks) - 1)]
        assert got[did]["n_bigrams"] == len(lps)
        assert got[did]["sum_logprob"] == pytest.approx(sum(lps), rel=1e-12)
        assert got[did]["mean_logprob"] == pytest.approx(
            sum(lps) / len(lps), rel=1e-12)


def test_lm_scores_held_out_model(spark):
    train = spark.createDataFrame(TEXTS, "doc_id long, text string")
    score = spark.createDataFrame([(9, "a b q")], "doc_id long, text string")
    row = ranking.doc_lm_scores(score, "doc_id", "text",
                                lm_docs=train, add_k=0.5).collect()[0]
    # "b q" is unseen: prob = k / (C(b) + k·V) — still finite, negative
    assert row["n_bigrams"] == 2
    assert row["sum_logprob"] < 0


def test_cms_estimate_bounds(spark):
    df = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(1000)], "k string")
    cms = sketches.cms_table(df, "k", depth=4, width=64)
    # total mass conserved per row of the sketch
    per_row = cms.groupBy("row").agg(F.sum("n").alias("s")).collect()
    assert all(r["s"] == 1000 for r in per_row)
    est = {r["k"]: r["est_count"] for r in
           sketches.cms_estimate(cms, df, "k", depth=4, width=64).collect()}
    exact = Counter(f"k{i % 7}" for i in range(1000))
    for k, c in exact.items():
        assert est[k] >= c                       # never under-estimates
        assert est[k] <= c + 1000                # trivial upper sanity


def test_cms_merge_equals_rebuild(spark):
    a = spark.createDataFrame([("x",), ("y",)], "k string")
    b = spark.createDataFrame([("x",), ("z",)], "k string")
    both = a.unionAll(b)
    merged = sketches.cms_merge(
        sketches.cms_table(a, "k", depth=2, width=16),
        sketches.cms_table(b, "k", depth=2, width=16))
    direct = sketches.cms_table(both, "k", depth=2, width=16)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_doc_lm_count_table_matches_brute(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ranking.doc_lm_count_table(df, "doc_id", "text").collect()}
    bigrams, ctx = Counter(), Counter()
    for _, t in TEXTS:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            bigrams[(toks[i], toks[i + 1])] += 1
            ctx[toks[i]] += 1
    V = len(ctx) + 1
    for did, t in TEXTS:
        toks = t.split(" ")
        if len(toks) < 2:
            assert did not in got
            continue
        grams = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        r = got[did]
        assert r["n_bigrams"] == len(grams)
        assert r["sum_c12"] == sum(bigrams[g] for g in grams)
        assert r["sum_c1"] == sum(ctx[g[0]] for g in grams)
        assert r["vocab_n"] == V


def test_doc_lm_count_table_held_out_unseen_zero(spark):
    train = spark.createDataFrame(TEXTS, "doc_id long, text string")
    score = spark.createDataFrame([(9, "zz qq")], "doc_id long, text string")
    r = ranking.doc_lm_count_table(score, "doc_id", "text",
                                   lm_docs=train).collect()[0]
    # fully-unseen bigram: both model counts coalesce to 0, never NULL
    assert (r["n_bigrams"], r["sum_c12"], r["sum_c1"]) == (1, 0, 0)


def test_lm_joined_self_trained_equals_held_out_same_corpus(spark):
    # round-12 fused substrate: the self-trained path (ONE keyed gram
    # pass serving both sides) must produce exactly the two-stream
    # shape's rows when the model corpus IS the scored corpus
    df = spark.createDataFrame([(1, "a b a c"), (2, "a b"), (3, "x")],
                               "doc_id long, text string")
    fused = ranking._lm_joined(df, "doc_id", "text")
    two = ranking._lm_joined(df, "doc_id", "text", lm_docs=df)
    cols = ["_id", "_bg", "_c12", "_c1", "_v"]
    assert sorted(map(tuple, fused.select(cols).collect())) == \
        sorted(map(tuple, two.select(cols).collect()))
