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
