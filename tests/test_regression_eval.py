"""Closed-form linear regression (operators/regression.py), binary
classification report (operators/evaluation.py), and weighted bag-of-words
cosine pairs (operators/dedup.py::bow_cosine_pairs) — parity against
pure-Python/numpy references plus the OLS invariants."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    dedup,
    evaluation,
    regression,
)


# --------------------------------------------------------------------- #
# linear_fit / linear_predict
# --------------------------------------------------------------------- #

def _toy_rows():
    # deterministic pseudo-random integer features + planted linear signal
    rows = []
    for i in range(400):
        x1 = (i * 7) % 24
        x2 = (i * 11) % 7
        noise = ((i * 13) % 9) - 4          # mean-zero integer noise
        y = 500 + 30 * x1 - 12 * x2 + noise
        rows.append((i, y, x1, x2))
    return rows


@pytest.fixture(scope="module")
def toy_fit(spark):
    df = spark.createDataFrame(_toy_rows(), "id long, y long, x1 long, x2 long")
    fit = regression.linear_fit(df, "y", "x1", "x2").collect()[0]
    return df, fit


def test_linear_fit_matches_numpy_lstsq(toy_fit):
    _, fit = toy_fit
    rows = _toy_rows()
    X = np.array([[1.0, r[2], r[3]] for r in rows])
    y = np.array([float(r[1]) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert fit["n"] == len(rows)
    assert abs(fit["b0"] - beta[0]) < 1e-7
    assert abs(fit["b1"] - beta[1]) < 1e-9
    assert abs(fit["b2"] - beta[2]) < 1e-9
    # planted signal recovered through the noise
    assert abs(fit["b1"] - 30) < 0.1 and abs(fit["b2"] + 12) < 0.2


def test_linear_fit_r2(toy_fit):
    _, fit = toy_fit
    rows = _toy_rows()
    X = np.array([[1.0, r[2], r[3]] for r in rows])
    y = np.array([float(r[1]) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1.0 - float(resid @ resid) / float(((y - y.mean()) ** 2).sum())
    assert abs(fit["r2"] - r2) < 1e-9
    assert fit["r2"] > 0.99        # integer noise is tiny vs the signal


def test_linear_predict_residual_invariants(spark, toy_fit):
    df, _ = toy_fit
    fit = regression.linear_fit(df, "y", "x1", "x2")
    pred = regression.linear_predict(df, fit, "y", "x1", "x2")
    agg = pred.agg(F.sum("resid").alias("sr"),
                   F.sum(F.col("resid") * F.col("x1")).alias("sr1"),
                   F.sum(F.col("resid") * F.col("x2")).alias("sr2"),
                   F.count(F.lit(1)).alias("n")).collect()[0]
    # OLS normal-equation residual orthogonality: Σe = Σe·x1 = Σe·x2 = 0
    assert agg["n"] == 400
    assert abs(agg["sr"]) < 1e-5
    assert abs(agg["sr1"]) < 1e-4
    assert abs(agg["sr2"]) < 1e-4


def test_linear_fit_exact_on_noiseless_plane(spark):
    rows = [(i, 7 + 3 * ((i * 5) % 10) - 2 * (i % 4), (i * 5) % 10, i % 4)
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, y long, x1 long, x2 long")
    fit = regression.linear_fit(df, "y", "x1", "x2").collect()[0]
    assert abs(fit["b0"] - 7) < 1e-9
    assert abs(fit["b1"] - 3) < 1e-9
    assert abs(fit["b2"] + 2) < 1e-9
    assert abs(fit["r2"] - 1.0) < 1e-12


def test_linear_fit_grouped_matches_per_group_global(spark):
    # two groups with different planted planes; grouped fit == per-slice fit
    rows = []
    for i in range(200):
        x1, x2 = (i * 3) % 12, (i * 5) % 6
        rows.append(("a", 10 + 2 * x1 + 5 * x2, x1, x2, i))
        rows.append(("b", 90 - 4 * x1 + 1 * x2, x1, x2, i))
    df = spark.createDataFrame(
        rows, "g string, y long, x1 long, x2 long, id long")
    got = {r["g"]: r for r in regression.linear_fit_grouped(
        df, ["g"], "y", "x1", "x2").collect()}
    assert set(got) == {"a", "b"}
    for g in ("a", "b"):
        solo = regression.linear_fit(df.filter(F.col("g") == g),
                                     "y", "x1", "x2").collect()[0]
        for c in ("n", "b0", "b1", "b2", "r2"):
            assert got[g][c] == solo[c]       # identical tree -> identical bits
    assert abs(got["a"]["b1"] - 2) < 1e-9
    assert abs(got["b"]["b1"] + 4) < 1e-9


# --------------------------------------------------------------------- #
# binary_report
# --------------------------------------------------------------------- #

def test_binary_report_counts_and_metrics(spark):
    # 6 TP, 2 FP, 3 FN, 9 TN
    rows = ([(True, True)] * 6 + [(False, True)] * 2
            + [(True, False)] * 3 + [(False, False)] * 9)
    df = spark.createDataFrame(rows, "label boolean, pred boolean")
    r = evaluation.binary_report(df, F.col("label"), F.col("pred")) \
        .collect()[0]
    tp, fp, fn, tn = 6, 2, 3, 9
    n = tp + fp + fn + tn
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert abs(r["accuracy"] - (tp + tn) / n) < 1e-12
    assert abs(r["precision_"] - tp / (tp + fp)) < 1e-12
    assert abs(r["recall_"] - tp / (tp + fn)) < 1e-12
    p, q = tp / (tp + fp), tp / (tp + fn)
    assert abs(r["f1"] - 2 * p * q / (p + q)) < 1e-12
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_binary_report_chance_level_kappa_zero(spark):
    # prediction independent of label -> kappa == 0 exactly (po == pe)
    rows = [(l, p) for l in (True, False) for p in (True, False)
            for _ in range(5)]
    df = spark.createDataFrame(rows, "label boolean, pred boolean")
    r = evaluation.binary_report(df, F.col("label"), F.col("pred")) \
        .collect()[0]
    assert abs(r["kappa"]) < 1e-12
    assert abs(r["accuracy"] - 0.5) < 1e-12


def _py_auc(pairs):
    """Brute-force Mann-Whitney AUC over (score, label) rows."""
    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    w = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return w / (len(pos) * len(neg))


def test_auc_matches_bruteforce(spark):
    rows = [(0.9, True), (0.8, True), (0.8, False), (0.7, True),
            (0.5, False), (0.5, True), (0.5, False), (0.3, False),
            (0.2, True), (0.1, False), (0.1, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = evaluation.auc(df, F.col("label"), F.col("score")).collect()[0]
    assert r["p"] == 5 and r["n_neg"] == 6
    assert abs(r["auc"] - _py_auc(rows)) < 1e-12


def test_auc_extremes(spark):
    perfect = [(float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(perfect, "score double, label boolean")
    assert evaluation.auc(df, F.col("label"),
                          F.col("score")).collect()[0]["auc"] == 1.0
    inverted = [(float(-i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(inverted, "score double, label boolean")
    assert evaluation.auc(df, F.col("label"),
                          F.col("score")).collect()[0]["auc"] == 0.0
    allties = [(1.0, i % 2 == 0) for i in range(40)]
    df = spark.createDataFrame(allties, "score double, label boolean")
    assert abs(evaluation.auc(df, F.col("label"), F.col("score"))
               .collect()[0]["auc"] - 0.5) < 1e-12


def test_calibration_bins(spark):
    # scores in [0,1); label true with rate tracking the score bin
    rows = [(0.05, False)] * 8 + [(0.05, True)] * 2 \
        + [(0.55, False)] * 4 + [(0.55, True)] * 6 \
        + [(0.95, True)] * 5 + [(-0.31, False)] * 3
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bin"]: r for r in evaluation.calibration_bins(
        df, F.col("label"), F.col("score"), inv_width=10).collect()}
    assert set(got) == {0, 5, 9, -4}           # floor(-3.1) = -4
    assert got[0]["n"] == 10 and got[0]["n_pos"] == 2
    assert abs(got[0]["frac_pos"] - 0.2) < 1e-12
    assert got[5]["n"] == 10 and abs(got[5]["frac_pos"] - 0.6) < 1e-12
    assert got[9]["n_pos"] == 5 and abs(got[9]["frac_pos"] - 1.0) < 1e-12
    assert abs(got[-4]["bin_lo"] + 0.4) < 1e-12
    assert got[-4]["n_pos"] == 0


# --------------------------------------------------------------------- #
# bow_cosine_pairs
# --------------------------------------------------------------------- #

_DOCS = [
    (0, "red blue red green red"),
    (1, "red blue red green red"),            # exact dup of 0 -> cos 1
    (2, "red blue red green green"),          # near dup of 0
    (3, "cat dog cat bird"),                  # disjoint cluster
    (4, "cat dog cat bird bird"),
    (5, "unique singleton words only here"),  # no shared terms
]


def _py_cosine(a: str, b: str) -> float:
    ca, cb = Counter(a.split()), Counter(b.split())
    dot = sum(ca[t] * cb[t] for t in ca.keys() & cb.keys())
    return dot / (math.sqrt(sum(v * v for v in ca.values()))
                  * math.sqrt(sum(v * v for v in cb.values())))


def test_bow_cosine_pairs_match_bruteforce(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["cosine"]
           for r in dedup.bow_cosine_pairs(df, "doc_id", "text",
                                           threshold=0.8).collect()}
    want = {}
    for i, ta in _DOCS:
        for j, tb in _DOCS:
            if i < j:
                c = _py_cosine(ta, tb)
                if c >= 0.8:
                    want[(i, j)] = c
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    assert abs(got[(0, 1)] - 1.0) < 1e-15      # exact dup
    assert (0, 3) not in got                   # cross-cluster absent


def test_bow_cosine_threshold_monotone(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    lo = dedup.bow_cosine_pairs(df, "doc_id", "text", threshold=0.5).count()
    hi = dedup.bow_cosine_pairs(df, "doc_id", "text", threshold=0.95).count()
    assert hi <= lo


def test_bow_cosine_max_docfreq_valve(spark):
    # every doc shares the hot term; capping df removes it from vectors
    docs = [(i, "hot common" if i < 4 else "hot other") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = dedup.bow_cosine_pairs(df, "doc_id", "text", threshold=0.9)
    capped = dedup.bow_cosine_pairs(df, "doc_id", "text", threshold=0.9,
                                    max_docfreq=5)
    # 'hot' (df=6) is dropped by the valve; 'common'/'other' (df 4 and 2)
    # still pair their own clusters with cosine 1
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b} \
        | {(4, 5)}
    # uncapped: only within-cluster pairs reach .9 (cross pairs cos = .5)
    assert full.count() == 7


def test_bow_cosine_dense_matches_postings(spark):
    # the dense blocked-matmul path is a PHYSICAL strategy only: byte-for
    # byte the same (doc_a, doc_b, dot, cosine) rows as the postings join
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    post = {(r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
            for r in dedup.bow_cosine_pairs(
                df, "doc_id", "text", threshold=0.5).collect()}
    dense = {(r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
             for r in dedup.bow_cosine_pairs_dense(
                 df, "doc_id", "text", threshold=0.5).collect()}
    assert set(dense) == set(post)
    for k in post:
        assert dense[k][0] == post[k][0]          # exact BIGINT dot
        assert dense[k][1] == post[k][1]          # identical IEEE cosine


def test_bow_cosine_dense_multiblock(spark):
    # force >1 block so cross-block (bi != bj) tiles are exercised: pairs
    # must be found regardless of which block each doc hashes into
    docs = [(i, "alpha beta gamma") for i in range(8)] \
        + [(100 + i, "delta epsilon") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in dedup.bow_cosine_pairs_dense(
        df, "doc_id", "text", threshold=0.99, max_block_rows=3).collect()}
    want = {(a, b) for a, _ in docs for b, _ in docs
            if a < b and (a < 100) == (b < 100)}
    assert got == want


def test_bow_cosine_dense_vocab_guard(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab"):
        dedup.bow_cosine_pairs_dense(df, "doc_id", "text", max_vocab=3)


# --------------------------------------------------------------------- #
# spearman_rho / label_gini_by_group / edit_verify / cross_source_overlap
# --------------------------------------------------------------------- #

def test_spearman_monotone_and_reversed(spark):
    rows = [(i, i * 10, 100 - i) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    up = evaluation.spearman_rho(df.select("id", F.col("a").alias("x"),
                                           F.col("id").alias("y")),
                                 "x", "y").collect()[0]
    assert up["n"] == 20 and abs(up["rho"] - 1.0) < 1e-12
    down = evaluation.spearman_rho(df, "a", "b").collect()[0]
    assert abs(down["rho"] + 1.0) < 1e-12


def test_spearman_ties_match_numpy(spark):
    # tie-averaged ranks: compare against a direct numpy computation
    a = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    b = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]
    def avg_ranks(v):
        v = np.asarray(v, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j - 1) / 2.0 + 1.0
            i = j
        return r
    ra, rb = avg_ranks(a), avg_ranks(b)
    want = np.corrcoef(ra, rb)[0, 1]
    df = spark.createDataFrame(list(zip(a, b)), "a long, b long")
    got = evaluation.spearman_rho(df, "a", "b").collect()[0]["rho"]
    assert abs(got - want) < 1e-12


def test_label_gini_by_group(spark):
    rows = [("s1", "en")] * 4 + [("s2", "en"), ("s2", "fr"),
                                 ("s2", "de"), ("s2", "zh")]
    df = spark.createDataFrame(rows, "src string, lang string")
    got = {r["grp"]: r for r in
           evaluation.label_gini_by_group(df, "src", "lang").collect()}
    assert got["s1"]["gini"] == 0.0 and got["s1"]["n_labels"] == 1
    assert abs(got["s2"]["gini"] - 0.75) < 1e-12   # uniform over 4
    assert got["s2"]["n"] == 4


def test_edit_verify_pairs_known_distances(spark):
    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, "kitten")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    got = {(r["doc_a"], r["doc_b"]): r for r in dedup.edit_verify_pairs(
        pairs, docs, "doc_id", "text").collect()}
    assert got[(1, 2)]["edit_distance"] == 3       # classic kitten/sitting
    assert abs(got[(1, 2)]["edit_sim"] - (1 - 3 / 7)) < 1e-15
    assert got[(1, 3)]["edit_distance"] == 0
    assert got[(1, 3)]["edit_sim"] == 1.0
    # min_sim filter drops the weaker pair
    assert {(r["doc_a"], r["doc_b"]) for r in dedup.edit_verify_pairs(
        pairs, docs, "doc_id", "text", min_sim=0.9).collect()} == {(1, 3)}


def test_cross_source_overlap(spark):
    head = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, head + " tail one", "s1"), (2, head + " other tail", "s2"),
         (3, "x y z totally different doc here now", "s1"),
         (4, head + " third", "s3"), (5, "unshared words only here", "s2")],
        "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_shared_prefixes"]
           for r in dedup.cross_source_overlap(
               docs, "doc_id", "text", "source", prefix_k=8).collect()}
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 1}
