"""Round-9 agreement evals (VERDICT r8 items 5-6): the hash-exact oracle
rows live in the driver gate; these tests pin the BRIDGES the oracle
can't — the integer-mass PageRank recurrence against a pure-Python
replay AND against the float production path's ranking, and the
literal-idf lexical eval against the production ln-scored rankings."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import (
    queries_extensions as qe,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    graph,
    ranking,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.queries_reference import (
    REGISTRY,
)

SF = "/root/testdata/sf0.01"


def _slice_edges() -> list[tuple[int, int]]:
    """The eval's bounded symmetric edge list, straight from parquet."""
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"]).to_pydict()
    fwd = {(o * 2, p * 2 + 1)
           for o, p in zip(t["l_orderkey"], t["l_partkey"])
           if o < qe._PGR_EVAL_CAP}
    return sorted(fwd | {(b, a) for a, b in fwd})


def _ref_integer_pagerank(edges: list[tuple[int, int]], rounds: int,
                          init_mass: int) -> dict[int, int]:
    """Pure-Python replay of the graph.pagerank_integer recurrence."""
    from collections import defaultdict
    deg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    mass = {v: init_mass for v in deg}
    for _ in range(rounds):
        c = {v: (mass[v] * 85) // (100 * deg[v]) for v in mass}
        pool = sum(mass[v] - deg[v] * c[v] for v in mass)
        nxt: dict[int, int] = defaultdict(int)
        for s, d in edges:
            nxt[d] += c[s]
        share = pool // n
        mass = {v: m + share for v, m in nxt.items()}
    return dict(mass)


def test_pagerank_eval_matches_python_replay(spark):
    edges = _slice_edges()
    ref = _ref_integer_pagerank(edges, qe._PGR_EVAL_ROUNDS,
                                qe._PGR_EVAL_MASS)
    rows = REGISTRY["pagerank_agreement_eval"][0](spark, SF).collect()
    got = {}
    for r in rows:
        tag, key = r["node"].split(":")
        node = int(key) * 2 + (0 if tag == "o" else 1)
        got[node] = r["mass_int"]
    assert got == ref
    # mass conservation up to the documented dropped remainders: total
    # shrinks by < n per round, never grows
    n = len({s for s, _ in edges})
    total0 = n * qe._PGR_EVAL_MASS
    assert total0 - qe._PGR_EVAL_ROUNDS * n < sum(got.values()) <= total0


def test_pagerank_integer_agrees_with_float_ranks(spark):
    """The bridge to the rows-only production path: on the same slice,
    the float pagerank and the integer-mass recurrence agree on who the
    top nodes ARE (both damping-0.85 power iterations; the integer form
    just floors each send). Membership, not order — floor noise can swap
    adjacent near-ties."""
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_orderkey") < qe._PGR_EVAL_CAP))
    fwd = li.select(
        F.shiftleft(F.col("l_orderkey"), 1).alias("src"),
        (F.shiftleft(F.col("l_partkey"), 1) + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    fl = graph.pagerank(edges, iterations=qe._PGR_EVAL_ROUNDS,
                        symmetric=True)
    top_f = [r["node"] for r in fl.orderBy(F.col("rank").desc(),
                                           "node").limit(50).collect()]
    im = graph.pagerank_integer(edges, iterations=qe._PGR_EVAL_ROUNDS,
                                init_mass=qe._PGR_EVAL_MASS)
    top_i = [r["node"] for r in im.orderBy(F.col("mass").desc(),
                                           "node").limit(50).collect()]
    overlap = len(set(top_f) & set(top_i))
    assert overlap >= 45, (overlap, top_f[:5], top_i[:5])


def test_pagerank_integer_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    out = graph.pagerank_integer(e, iterations=2)
    assert out.columns == ["node", "mass"]
    assert out.count() == 0


def _stats_rows(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
        ranking as rk,
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return [tuple(r) for r in
            rk.doc_term_stats(docs, "doc_id", "text")
            .select("doc_id", "term", "tf", "dl", "df", "n_docs").collect()]


def test_lexical_eval_bridges_production_tfidf(spark):
    """The literal-idf tf-idf ranking (what the hash-exact eval scores)
    picks the same per-doc top-3 terms as the production engine-ln
    ranking — the bridge that lets the eval certify tfidf_top_terms."""
    stats = _stats_rows(spark)
    # python replication of the eval's literal-idf ranking
    by_doc: dict = {}
    for doc_id, term, tf, dl, df, n in stats:
        s = tf * qe._lex_eval_idf(n, df)[0]
        by_doc.setdefault(doc_id, []).append((-s, term))
    lit_top = {(d, t) for d, lst in by_doc.items()
               for _, t in sorted(lst)[:qe._LEX_EVAL_K]}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prod = {(r["doc_id"], r["term"])
            for r in ranking.tfidf_top_terms(docs, "doc_id", "text",
                                             k=qe._LEX_EVAL_K).collect()}
    # identical up to (at most) 1-ulp idf flips at exact score ties;
    # none exist at sf0.01, so require equality and let a future corpus
    # regeneration surface any tie loudly
    assert lit_top == prod


def test_lexical_eval_bridges_production_bm25(spark):
    stats = _stats_rows(spark)
    a1, b1, c1 = qe._lex_eval_consts()
    dls = {}
    for doc_id, term, tf, dl, df, n in stats:
        dls[doc_id] = dl
    avgdl = sum(dls.values()) / float(len(dls))
    per_doc: dict = {}
    for doc_id, term, tf, dl, df, n in stats:
        if term in qe._LEX_EVAL_TERMS:
            idf_b = qe._lex_eval_idf(n, df)[1]
            sco = idf_b * ((tf * a1) / (tf + b1 + (c1 * dl) / avgdl))
            per_doc.setdefault(doc_id, []).append((term, sco))
    folded = {}
    for doc_id, ts in per_doc.items():
        acc = 0.0
        for _, s in sorted(ts):
            acc = acc + s
        folded[doc_id] = acc
    lit_top = [d for _, d in
               sorted(((-s, d) for d, s in folded.items()))][:qe._LEX_EVAL_BMK]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prod = [r["doc_id"] for r in
            ranking.bm25_topk(docs, "doc_id", "text",
                              list(qe._LEX_EVAL_TERMS),
                              k=qe._LEX_EVAL_BMK).collect()]
    assert lit_top == prod


def test_lexical_eval_row_consistency(spark):
    row = REGISTRY["lexical_rank_agreement_eval"][0](spark, SF).collect()[0]
    assert row["tfidf_overlap"] <= row["tfidf_slots"]
    assert row["tfidf_rank_exact"] <= row["tfidf_overlap"]
    assert row["bm25_overlap"] <= row["bm25_k"] == qe._LEX_EVAL_BMK
    assert row["bm25_rank_exact"] <= row["bm25_overlap"]
    assert 0.0 < row["tfidf_overlap_share"] <= 1.0
    assert 0.0 < row["bm25_overlap_share"] <= 1.0


# -- round-9 continuation: the literal-log evals for the LAST two
# float-scored rows-only families (doc_lm_quality, dsir_doc_weights) ------


def test_lm_eval_bridges_production(spark):
    """The literal-log LM score table must match the production engine-ln
    path (doc_lm_quality) to float tolerance on every document — the
    bridge that lets the hash-exact eval certify the production scorer."""
    ev = {r["doc_id"]: r for r in
          REGISTRY["lm_quality_agreement_eval"][0](spark, SF).collect()}
    pr = {r["doc_id"]: r for r in
          REGISTRY["doc_lm_quality"][0](spark, SF).collect()}
    assert set(ev) == set(pr)
    for d, e in ev.items():
        p = pr[d]
        assert e["n_bigrams"] == p["n_bigrams"], d
        assert abs(e["sum_logprob_lit"] - p["sum_logprob"]) <= \
            1e-9 * abs(p["sum_logprob"]), d
        assert abs(e["mean_logprob_lit"] - p["mean_logprob"]) <= \
            1e-9 * abs(p["mean_logprob"]), d


def test_dsir_eval_bridges_production(spark):
    """Literal-llr DSIR weights vs the production engine-ln path
    (dsir_doc_weights): same doc set, exact n_grams, float-tolerance
    weights (nulls aligned for gram-less docs)."""
    ev = {r["doc_id"]: r for r in
          REGISTRY["dsir_agreement_eval"][0](spark, SF).collect()}
    pr = {r["doc_id"]: r for r in
          REGISTRY["dsir_doc_weights"][0](spark, SF).collect()}
    assert set(ev) == set(pr)
    n_scored = 0
    for d, e in ev.items():
        p = pr[d]
        assert e["n_grams"] == p["n_grams"], d
        if p["dsir_logratio"] is None:
            assert e["dsir_logratio_lit"] is None, d
            continue
        n_scored += 1
        assert abs(e["dsir_logratio_lit"] - p["dsir_logratio"]) <= \
            1e-9 * max(abs(p["dsir_logratio"]), 1e-12), d
    assert n_scored > 0


def test_lm_eval_lp_formula():
    """The injected literal is exactly the production formula."""
    import math
    assert qe._lm_eval_lp(3, 10, 7) == math.log((3 + 0.5) / (10 + 0.5 * 7))
    assert qe._dsir_eval_llr(2, 100, 5, 900) == (
        math.log((2 + 1.0) / (100 + 1000.0))
        - math.log((5 + 1.0) / (900 + 1000.0)))
