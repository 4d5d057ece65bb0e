"""TF-IDF / BM25: exact integer stats, score parity with a pure-Python
reference (ln is engine-specific, so scores are checked here, not by the
DuckDB oracle), and top-k determinism."""

from __future__ import annotations

import math

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import ranking

DOCS = [
    (1, "join hash join probe"),
    (2, "scan filter scan scan"),
    (3, "join scan merge"),
    (4, "window order window"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _py_stats():
    toks = {d: t.split(" ") for d, t in DOCS}
    tf = {(d, w): ts.count(w) for d, ts in toks.items() for w in set(ts)}
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    return toks, tf, df


def test_doc_term_stats_exact(docs):
    toks, tf, df = _py_stats()
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"], r["df"], r["n_docs"])
           for r in ranking.doc_term_stats(docs, "doc_id", "text").collect()}
    expect = {(d, w): (c, len(toks[d]), df[w], len(DOCS))
              for (d, w), c in tf.items()}
    assert got == expect


def test_tfidf_top_terms_match_reference(docs):
    toks, tf, df = _py_stats()
    n = len(DOCS)

    def score(d, w):
        return tf[(d, w)] * (math.log((1.0 + n) / (1.0 + df[w])) + 1.0)

    out = ranking.tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    for r in out:
        assert r["tfidf"] == pytest.approx(score(r["doc_id"], r["term"]),
                                           abs=1e-12)
    # doc 2: 'scan' (tf 3) must outrank 'filter'
    top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    assert top[2] == "scan" and top[4] == "window"


def test_bm25_matches_reference(docs):
    toks, tf, df = _py_stats()
    n, k1, b = len(DOCS), 1.2, 0.75
    avgdl = sum(len(t) for t in toks.values()) / n
    query = ["join", "scan"]

    def bm25(d):
        s = 0.0
        for w in query:
            if (d, w) not in tf:
                continue
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            t = tf[(d, w)]
            s += idf * t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * len(toks[d]) / avgdl))
        return s

    got = {r["doc_id"]: (r["bm25"], r["n_matched_terms"])
           for r in ranking.bm25_scores(docs, "doc_id", "text", query).collect()}
    assert set(got) == {1, 2, 3}          # doc 4 matches nothing -> absent
    for d, (s, _) in got.items():
        assert s == pytest.approx(bm25(d), abs=1e-12)
    assert got[3][1] == 2                  # both query terms matched


def test_bm25_topk_deterministic(docs):
    out1 = [r["doc_id"] for r in
            ranking.bm25_topk(docs, "doc_id", "text", ["join", "scan"], k=2).collect()]
    out2 = [r["doc_id"] for r in
            ranking.bm25_topk(docs, "doc_id", "text", ["join", "scan"], k=2).collect()]
    assert out1 == out2 and len(out1) == 2
