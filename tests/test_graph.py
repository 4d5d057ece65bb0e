"""PageRank: convergence vs dense NumPy power iteration, mass
conservation, dangling handling."""

from __future__ import annotations

import numpy as np
import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import graph


def _numpy_pagerank(edges, n, damping=0.85, iterations=50):
    """Dense reference: column-stochastic matrix + uniform dangling fix."""
    M = np.zeros((n, n))
    out = np.zeros(n)
    for s, d in set(edges):
        M[d, s] += 1.0
        out[s] += 1.0
    for s in range(n):
        if out[s]:
            M[:, s] /= out[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = sum(r[s] for s in range(n) if out[s] == 0)
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return r


def test_pagerank_matches_numpy(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]  # node 4: isolated via 3
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(df, iterations=40).collect()}
    want = _numpy_pagerank(edges, 4, iterations=40)
    assert set(got) == {0, 1, 2, 3}
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], rel=1e-6)


def test_pagerank_mass_conserved_with_dangling(spark):
    # node 2 is dangling (no out-edges)
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ranks = graph.pagerank(df, iterations=15).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)
    assert len(ranks) == 3


def test_pagerank_symmetric_graph_uniform(spark):
    # undirected triangle -> uniform stationary distribution
    fwd = [(0, 1), (1, 2), (2, 0)]
    edges = fwd + [(d, s) for s, d in fwd]
    df = spark.createDataFrame(edges, "src long, dst long")
    for r in graph.pagerank(df, iterations=10).collect():
        assert r["rank"] == pytest.approx(1.0 / 3, rel=1e-9)
