"""Feature-hashed linear quality classifier (operators/classify.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import classify


@pytest.fixture(scope="module")
def corpus(spark):
    # two token distributions with a shared stopword core: positives speak
    # "alpha/beta/gamma", negatives "zork/quux/blarg"
    pos_words = ["alpha", "beta", "gamma", "delta"]
    neg_words = ["zork", "quux", "blarg", "mumble"]
    rows = []
    for i in range(40):
        w = pos_words if i % 2 == 0 else neg_words
        body = " ".join(w[(i + j) % 4] for j in range(12))
        rows.append((i, f"the of {body}", "good" if i % 2 == 0 else "bad"))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_classifier_separates_proxy_classes(corpus):
    scored = classify.quality_classifier(
        corpus, F.col("label") == "good", id_col="doc_id")
    got = {r["doc_id"]: r for r in scored.collect()}
    assert len(got) == 40
    for i in range(40):
        r = got[i]
        assert r["keep"] == (i % 2 == 0)
        assert r["keep"] == (r["margin_num"] > 0)
        assert -1.0 <= r["margin"] <= 1.0
        assert r["n_tokens"] == 14  # 2 stopwords + 12 body tokens


def test_weights_are_bounded_and_centered(corpus):
    w = classify.train_hashed_weights(corpus, F.col("label") == "good")
    rows = w.collect()
    assert all(abs(r["w"]) <= classify.SCALE // 2 for r in rows)
    # the shared stopwords occur equally in both classes → near-zero weight
    stop = classify.train_hashed_weights(
        corpus.select("label", F.lit("the of").alias("text")),
        F.col("label") == "good").collect()
    assert all(abs(r["w"]) <= classify.SCALE // 100 for r in stop)


def test_unseen_buckets_score_zero(spark, corpus):
    """Docs made entirely of tokens absent from training get margin 0 (the
    centered prior) and are dropped by the strict > 0 gate."""
    w = classify.train_hashed_weights(corpus, F.col("label") == "good")
    unseen = spark.createDataFrame(
        [(100, "xylophone qwerty unseen")], ["doc_id", "text"])
    r = classify.score_docs(unseen, w).collect()[0]
    assert r["margin_num"] == 0 and r["margin"] == 0.0 and not r["keep"]


def test_sampled_train_frame(corpus):
    """Training on a half-corpus slice still separates the held-out half."""
    train = corpus.filter(F.col("doc_id") < 20)
    scored = classify.quality_classifier(
        corpus.filter(F.col("doc_id") >= 20), F.col("label") == "good",
        train=train)
    for r in scored.collect():
        assert r["keep"] == (r["doc_id"] % 2 == 0)
