"""Curation operators: DSIR importance weights and epoch shuffling."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import curation
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def _bucket(gram: str, buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def test_dsir_matches_numpy_recompute(spark):
    rows = [(1, "a b a b c"), (2, "x y x y"), (3, "a b x")]
    trows = [(10, "a b a b"), (11, "a b c")]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(trows, "doc_id long, text string")
    B, sm = 50, 1.0
    got = {r["doc_id"]: r for r in
           curation.dsir_weights(raw, target, n=2, buckets=B).collect()}

    def grams(t):
        toks = t.split(" ")
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    rcount: dict[int, int] = {}
    tcount: dict[int, int] = {}
    for _, t in rows:
        for g in grams(t):
            rcount[_bucket(g, B)] = rcount.get(_bucket(g, B), 0) + 1
    for _, t in trows:
        for g in grams(t):
            tcount[_bucket(g, B)] = tcount.get(_bucket(g, B), 0) + 1
    r_total, t_total = sum(rcount.values()), sum(tcount.values())

    def llr(b):
        lt = math.log((tcount.get(b, 0) + sm) / (t_total + sm * B))
        lr = math.log((rcount.get(b, 0) + sm) / (r_total + sm * B))
        return lt - lr

    for did, text in rows:
        gs = grams(text)
        want = sum(llr(_bucket(g, B)) for g in gs) / len(gs)
        assert got[did]["n_grams"] == len(gs)
        assert got[did]["dsir_logratio"] == pytest.approx(want, rel=1e-12)


def test_dsir_ranks_target_like_docs_higher(spark):
    docs = catalog.load_table(spark, SF, "documents")
    target = docs.filter(F.pmod("doc_id", F.lit(10)) == 0)
    raw = docs
    w = curation.dsir_weights(raw, target, n=2, buckets=1000)
    # docs that ARE the target slice must average a higher logratio than
    # the rest (they literally match the target distribution)
    avg = (w.withColumn("_t", F.pmod("doc_id", F.lit(10)) == 0)
           .groupBy("_t").agg(F.avg("dsir_logratio").alias("a")).collect())
    scores = {r["_t"]: r["a"] for r in avg}
    assert scores[True] > scores[False]


def test_epoch_shuffle_dense_deterministic_and_epoch_dependent(spark):
    docs = catalog.load_table(spark, SF, "documents").select("doc_id")
    n = docs.count()
    e1 = curation.epoch_shuffle(docs, epoch=1)
    pos = sorted(r["epoch_pos"] for r in e1.collect())
    assert pos == list(range(n))                   # dense 0..N-1
    again = {r["doc_id"]: r["epoch_pos"]
             for r in curation.epoch_shuffle(docs, epoch=1).collect()}
    first = {r["doc_id"]: r["epoch_pos"] for r in e1.collect()}
    assert first == again                          # deterministic
    e2 = {r["doc_id"]: r["epoch_pos"]
          for r in curation.epoch_shuffle(docs, epoch=2).collect()}
    assert e2 != first                             # epochs reshuffle
