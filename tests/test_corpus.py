"""End-to-end corpus build (operators.corpus) — invariant tests."""

from __future__ import annotations

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import corpus, dedup, text

from .conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_corpus_build_invariants(spark):
    docs = _docs(spark)
    out = corpus.build_corpus(docs)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert 0 < len(rows) < docs.count()
    # 1. survivors pass the quality gate
    good = {r["doc_id"] for r in text.quality_score(docs).filter("keep").collect()}
    assert ids <= good
    # 2. no two survivors share a text
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))
    # 3. no surviving pair is near-dup at the band
    pairs = dedup.ngram_jaccard_pairs(out, "doc_id", "text", n=3, threshold=0.8)
    assert pairs.count() == 0
    # 4. schema is the full original row
    assert out.columns == docs.columns


def test_corpus_build_fanout_materialization_is_result_neutral(spark):
    docs = _docs(spark)
    fast = corpus.build_corpus(docs)
    plain = corpus.build_corpus(docs, materialize_fanout=False)
    assert sorted(r["doc_id"] for r in fast.collect()) == \
           sorted(r["doc_id"] for r in plain.collect())


def test_transitive_closure_differs_from_greedy_on_hub(spark):
    """doc3 is near-dup of doc1 AND doc2; doc1~doc2 is below the band.
    Greedy drop-doc_b keeps {1,2} (3 is the only doc_b); the transitive
    rule collapses the whole component to its min id and keeps {1} — the
    case where pairwise pruning under-deletes."""
    base = [f"w{i}" for i in range(30)]
    base[0], base[10], base[20] = "the", "of", "is"   # pass the stopword gate
    v1, v2 = list(base), list(base)
    v1[1] = "x1"           # differs early
    v2[28] = "x2"          # differs late
    docs = spark.createDataFrame(
        [(1, " ".join(v1), "en", "s", 1),
         (2, " ".join(v2), "en", "s", 1),
         (3, " ".join(base), "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint")
    greedy = sorted(r["doc_id"] for r in
                    corpus.build_corpus(docs, min_tokens=5).collect())
    transitive = sorted(r["doc_id"] for r in
                        corpus.build_corpus_transitive(
                            docs, min_tokens=5).collect())
    assert greedy == [1, 2]
    assert transitive == [1]


def test_transitive_equals_greedy_on_pair_only_corpus(spark):
    """The driver corpus plants PAIR duplicates (no chains), so both rules
    agree there — regression-pinning that equivalence."""
    docs = _docs(spark)
    g = sorted(r["doc_id"] for r in corpus.build_corpus(docs).collect())
    t = sorted(r["doc_id"] for r in
               corpus.build_corpus_transitive(docs).collect())
    assert g == t
