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


def test_curation_pipeline_end_to_end(spark):
    """Integration: the full curation chain over the real smoke corpus,
    with every stage's contract spot-checked on the output."""
    from pyspark.sql import functions as F
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import corpus, dedup, repetition, text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.orderBy("doc_id").limit(3) \
        .select(F.col("doc_id").alias("bench_id"),
                F.col("text").alias("bench_text"))
    out = corpus.curation_pipeline(
        docs, bench.withColumnRenamed("bench_id", "doc_id")
                   .withColumnRenamed("bench_text", "text"),
        classifier_label=F.col("lang") == "en",
        shard_tokens=1000)
    rows = out.collect()
    assert rows, "pipeline must keep something"
    ids = {r["doc_id"] for r in rows}
    # survivors: no exact text dups
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))
    # no 0.8-near-dups among survivors
    surv = out.select("doc_id", "text")
    assert dedup.ngram_jaccard_pairs(surv, "doc_id", "text",
                                     n=3, threshold=0.8).count() == 0
    # every survivor passed the gates
    gates = repetition.repetition_gate(surv).collect()
    assert all(g["keep"] for g in gates)
    q = text.quality_score(surv, min_tokens=20, max_tokens=10_000).collect()
    assert all(r["keep"] for r in q)
    # benchmark docs themselves were decontaminated away
    bench_ids = {r["bench_id"] for r in bench.collect()}
    assert not (ids & bench_ids)
    # split + shards present and well-formed
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r["shard_id"] == (r["cum_tokens"] - r["n_tokens"]) // 1000
    # loose-band near-dups never straddle splits
    pairs = dedup.ngram_jaccard_pairs(surv, "doc_id", "text",
                                      n=3, threshold=0.5).collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    for p in pairs:
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]]


def test_corpus_drift_statuses_and_tokens(spark):
    """Drift classification: v1-only → removed, v2-only → added, digest
    change → changed, byte-equal → neither; token totals exact per side."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import corpus as corpus_ops

    v1 = spark.createDataFrame(
        [(1, "web", "a b"), (2, "web", "old text"), (3, "lib", "same")],
        "doc_id long, source string, text string")
    v2 = spark.createDataFrame(
        [(2, "web", "new text here"), (3, "lib", "same"),
         (4, "web", "fresh doc")],
        "doc_id long, source string, text string")
    rows = {r["source"]: r for r in
            corpus_ops.corpus_drift(v1, v2).collect()}
    web, lib = rows["web"], rows["lib"]
    assert (web["n_docs_v1"], web["n_docs_v2"]) == (2, 2)
    assert (web["n_added"], web["n_removed"], web["n_changed"]) == (1, 1, 1)
    assert (web["tokens_v1"], web["tokens_v2"]) == (2 + 2, 3 + 2)
    assert (lib["n_added"], lib["n_removed"], lib["n_changed"]) == (0, 0, 0)
    assert (lib["tokens_v1"], lib["tokens_v2"]) == (1, 1)
