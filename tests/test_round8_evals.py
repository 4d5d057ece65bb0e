"""Round-8 agreement evals (VERDICT r7 item 5): the hash-exact oracle rows
live in the driver gate; these tests pin the BRIDGES the oracle can't —
the expression-twin semdedup eval emits the same pair set as the
production numpy kernel given the same centroids, and the quantized-Lloyd
eval reproduces a pure-numpy replication of its own recurrence."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import (
    queries_extensions as qe,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    semdedup,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.queries_reference import (
    REGISTRY,
)

SF = "/root/testdata/sf0.01"


def _slice_np():
    """The eval's audit slice as numpy: (ids, vectors) sorted by vec_id."""
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    rows = sorted((int(i), np.array(v, dtype=np.float64))
                  for i, v in zip(t["vec_id"], t["embedding"])
                  if i % 4 == 0 and i < qe._EVAL_SLICE_CAP)
    ids = np.array([i for i, _ in rows])
    vecs = np.stack([v for _, v in rows])
    return ids, vecs


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right sequential fold — bit-identical to the twins'
    dot_expr / DuckDB list_dot_product arithmetic."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _nearest_seed(vecs, ids, seeds):
    """argmax cosine with the twins' SEQUENTIAL-FOLD arithmetic (dot =
    left-to-right acc + x·y, norm = sqrt(fold dot), cosine =
    dot/(na·nb)) instead of BLAS normalize-then-matmul (round-8 ADVICE:
    a BLAS-vs-fold ulp at an argmax near-tie would make the bridge
    flaky). Ties -> lowest seed id (the twins' tie rule)."""
    sv = sorted(((int(sid), [float(x) for x in v]) for sid, v in seeds),
                key=lambda t: t[0])
    sn = [(sid, v, math.sqrt(_fold_dot(v, v))) for sid, v in sv]
    out = []
    for row in vecs:
        vl = [float(x) for x in row]
        nv = math.sqrt(_fold_dot(vl, vl))
        best_sid, best_sim = None, None
        for sid, v, n in sn:             # ascending sid: strict > keeps
            sim = _fold_dot(vl, v) / (nv * n)   # the lowest id on ties
            if best_sim is None or sim > best_sim:
                best_sid, best_sim = sid, sim
        out.append(best_sid)
    return np.array(out)


def test_semdedup_twin_matches_production_kernel(spark):
    """Same centroids -> the production semantic_dup_pairs (numpy BLAS,
    applyInPandas block tasks) finds EXACTLY the within-cell pairs the
    expression-twin eval counts. This is the bridge that lets the
    hash-exact eval certify the rows-only production operator."""
    ids, vecs = _slice_np()
    seeds = [(int(ids[i]), vecs[i]) for i in range(qe._SDD_EVAL_NSEEDS)]

    # independent numpy ground truth for the twin's within-cell pair set
    cell = _nearest_seed(vecs, ids, seeds)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    n = len(ids)
    # the pairwise threshold compare stays BLAS (500k pairs); guard it:
    # BLAS and the twins' sequential fold agree to ~1e-15 relative, so
    # assert every pair clears the threshold by a margin orders of
    # magnitude wider — an arithmetic ulp can then never flip a >=
    # comparison between this ground truth and the twin (round-8 ADVICE)
    iu = np.triu_indices(n, k=1)
    assert np.abs(sims[iu] - qe._SDD_EVAL_THRESH).min() > 1e-9
    expect = set()
    for a in range(n):
        for b in range(a + 1, n):
            if cell[a] == cell[b] and sims[a, b] >= qe._SDD_EVAL_THRESH:
                expect.add((int(ids[a]), int(ids[b])))

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter((F.col("vec_id") % 4 == 0)
                & (F.col("vec_id") < qe._EVAL_SLICE_CAP))
    cents = np.stack([v for _, v in seeds])
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    got = {(int(r["doc_a"]), int(r["doc_b"]))
           for r in semdedup.semantic_dup_pairs(
               emb, threshold=qe._SDD_EVAL_THRESH,
               centroids=cents).collect()}
    assert got == expect
    assert len(expect) > 0  # non-trivial at sf0.01 (54 exact / 20 cell)

    # and the registered eval's counts agree with the same ground truth
    row = REGISTRY["semdedup_agreement_eval"][0](spark, SF).collect()[0]
    assert row["n_pairs_cell"] == len(expect)
    assert row["n_pairs_cell"] <= row["n_pairs_exact"]
    assert row["n_drop_cell"] <= row["n_drop_exact"]
    assert 0.0 < row["survivor_agreement"] <= 1.0


def test_kmeans_eval_matches_numpy_replication(spark):
    """Pure-numpy replication of the quantized-Lloyd recurrence (exact
    integer centroid sums, cosine argmax with lowest-id ties) produces
    the same per-cluster agreement table as the distributed eval."""
    ids, vecs = _slice_np()
    k, rounds = qe._KME_EVAL_K, qe._KME_EVAL_ROUNDS
    scale = qe._KME_EVAL_SCALE
    seeds = [(int(ids[i]), vecs[i]) for i in range(k)]
    a0 = _nearest_seed(vecs, ids, seeds)
    scaled = np.floor(vecs * scale + 0.5).astype(np.int64)
    assign = a0
    for _ in range(rounds):
        cents = []
        for cid in sorted(set(assign.tolist())):
            cents.append((cid, scaled[assign == cid].sum(axis=0)
                          .astype(np.float64)))
        assign = _nearest_seed(vecs, ids, cents)
    out = {r["cluster_id"]: (r["n_seed"], r["n_lloyd"], r["n_stay"])
           for r in REGISTRY["kmeans_assign_agreement_eval"][0](
               spark, SF).collect()}
    cids = sorted(set(a0.tolist()) | set(assign.tolist()))
    expect = {cid: (int((a0 == cid).sum()), int((assign == cid).sum()),
                    int(((a0 == cid) & (assign == cid)).sum()))
              for cid in cids}
    assert out == expect
    # sanity: partitions of the same slice
    n = len(ids)
    assert sum(v[0] for v in out.values()) == n
    assert sum(v[1] for v in out.values()) == n
    assert all(v[2] <= min(v[0], v[1]) for v in out.values())
