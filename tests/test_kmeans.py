"""Spherical k-means: assignment optimality vs numpy, monotone objective,
determinism, and cohesion bookkeeping."""

from __future__ import annotations

import numpy as np
import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kmeans
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return catalog.load_table(spark, SF, "embeddings")


def _numpy_corpus(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return pdf["vec_id"].to_numpy(), x


def test_assignments_are_nearest_centroid(emb):
    cents = kmeans.kmeans_fit(emb, k=6, max_iter=4, seed=7)
    ids, x = _numpy_corpus(emb)
    expect = dict(zip(ids, (x @ cents.T).argmax(axis=1)))
    got = {r["vec_id"]: r["cluster_id"]
           for r in kmeans.kmeans_assign(emb, cents).collect()}
    assert got == expect


def test_objective_monotone_under_refinement(emb):
    ids, x = _numpy_corpus(emb)

    def objective(c):
        return float((x @ c.T).max(axis=1).sum())

    c0 = kmeans.kmeans_fit(emb, k=6, max_iter=0, seed=7)   # init only
    c3 = kmeans.kmeans_fit(emb, k=6, max_iter=3, seed=7)
    assert objective(c3) >= objective(c0) - 1e-9


def test_fit_is_deterministic(emb):
    a = kmeans.kmeans_fit(emb, k=5, max_iter=2, seed=11)
    b = kmeans.kmeans_fit(emb, k=5, max_iter=2, seed=11)
    assert np.array_equal(a, b)


def test_cosine_and_sizes(emb):
    cents = kmeans.kmeans_fit(emb, k=4, max_iter=2, seed=3)
    assign = kmeans.kmeans_assign(emb, cents)
    rows = assign.collect()
    assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)
    sizes = kmeans.kmeans_cluster_sizes(assign).collect()
    assert sum(r["n"] for r in sizes) == len(rows)
    # cohesion should beat a random direction by a wide margin on average
    assert all(r["mean_cosine"] > 0 for r in sizes)
