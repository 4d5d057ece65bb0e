"""Round-5 addition tests: sign-bit Hamming near-dup, temporal embargo
split, k-fold assignment, boolean/phrase retrieval, vocabulary growth,
stream-static enrichment."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    ranking,
    sampling,
    similarity,
    text,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import joins

from .conftest import SF_SMOKE


# ---------------------------------------------------------------- sign-bit

def _vec(bits):
    """64-dim vector whose sign bits equal ``bits`` (1 → +1.0, 0 → -1.0)."""
    return [1.0 if b else -1.0 for b in bits]


def test_signbit_signature_packing(spark):
    bits = [0] * 64
    bits[0] = 1          # w0 bit 0
    bits[9] = 1          # w1 bit 1
    bits[63] = 1         # w7 bit 7
    df = spark.createDataFrame([(1, _vec(bits))],
                               "vec_id long, embedding array<float>")
    row = similarity.signbit_signatures(df).collect()[0]
    assert (row.w0, row.w1, row.w7) == (1, 2, 128)
    assert all(getattr(row, f"w{j}") == 0 for j in (2, 3, 4, 5, 6))


def test_signbit_pairs_pigeonhole_and_verify(spark):
    base = [0, 1] * 32
    flip3 = list(base)
    for i in (0, 20, 40):          # hamming 3 < n_blocks=8 → MUST be found
        flip3[i] ^= 1
    spread8 = list(base)
    for i in range(0, 64, 8):      # one flip per 8-bit word → no shared word
        spread8[i] ^= 1
    df = spark.createDataFrame(
        [(1, _vec(base)), (2, _vec(flip3)), (3, _vec(spread8))],
        "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b): r.hamming
           for r in similarity.signbit_hamming_pairs(df, max_hamming=17)
           .collect()}
    # pigeonhole guarantee: hamming 3 pair found with exact distance
    assert got[(1, 2)] == 3
    # (1,3) differs in every word → not a candidate despite hamming 8 <= 17
    assert (1, 3) not in got
    # (2,3): flips at bits 0 and 40 cancel, so words 0 and 5 match → found
    assert got[(2, 3)] == 7


def test_signbit_rejects_bad_geometry(spark):
    df = spark.createDataFrame([(1, [1.0] * 64)],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        similarity.signbit_signatures(df, n_blocks=7)


# ------------------------------------------------------- temporal embargo

def test_temporal_embargo_split_boundaries(spark):
    rows = [(i, f"2024-01-{d:02d} 12:00:00") for i, d in
            enumerate([1, 5, 10, 19, 20, 21, 23, 24, 28], start=1)]
    df = spark.createDataFrame(rows, "id long, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    lab = {r.id: r.split for r in sampling.temporal_embargo_split(
        df, "ts", test_days=7, embargo_days=2).collect()}
    # max = Jan 28 12:00; test > Jan 21 12:00; embargo > Jan 19 12:00
    assert lab[9] == "test" and lab[8] == "test" and lab[7] == "test"
    assert lab[6] == "embargo"                     # Jan 21 12:00 exactly → not > bound
    assert lab[5] == "embargo"
    assert lab[4] == "train" and lab[1] == "train"  # Jan 19 12:00 exactly
    with pytest.raises(ValueError):
        sampling.temporal_embargo_split(df, "ts", test_days=0)


# ------------------------------------------------------------------ kfold

def test_kfold_assign_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = sampling.kfold_assign(df, "doc_id", k=5)
    folds = [r.fold for r in a.orderBy("doc_id").collect()]
    assert set(folds) == {0, 1, 2, 3, 4}
    b = [r.fold for r in sampling.kfold_assign(df.repartition(7), "doc_id",
                                               k=5).orderBy("doc_id").collect()]
    assert folds == b                       # partition-layout independent
    with pytest.raises(ValueError):
        sampling.kfold_assign(df, "doc_id", k=1)


# -------------------------------------------------------------- retrieval

def test_conjunctive_search_and_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "c a c b"), (4, "d")],
        "doc_id long, text string")
    q = spark.createDataFrame([("q1", ["a", "b"]), ("q2", ["a", "a", "d"])],
                              "query_id string, terms array<string>")
    got = {(r.query_id, r.doc_id): r.n_terms
           for r in ranking.conjunctive_search(docs, q, "doc_id", "text")
           .collect()}
    assert set(got) == {("q1", 1), ("q1", 2), ("q1", 3), ("q2", 1)}
    assert got[("q2", 1)] == 2              # duplicate query terms collapse


def test_phrase_search_counts_nonoverlapping(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x"), (2, "x y"), (3, "zzz")],
        "doc_id long, text string")
    p = spark.createDataFrame([("p1", "x y x")], "phrase_id string, phrase string")
    got = {r.doc_id: r.n_occurrences
           for r in ranking.phrase_search(docs, p, "doc_id", "text").collect()}
    # left-to-right non-overlapping: "x y x y x" counts ONE "x y x"
    assert got == {1: 1}


# ------------------------------------------------------------ vocab growth

def test_vocab_growth_first_occurrence(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (3, "a d e"), (4, "e")],
        "doc_id long, text string")
    rows = {r.bucket: r for r in
            text.vocab_growth(docs, n_buckets=2).collect()}
    assert rows[1].n_docs_cum == 2 and rows[1].new_tokens == 3
    assert rows[2].n_docs_cum == 4 and rows[2].new_tokens == 2
    assert rows[2].vocab_size == 5


# ---------------------------------------------------------- stream-static

def test_stream_static_enrich_batch_semantics(spark):
    stream = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")],
                                   "user_id long, ev string")
    dim = spark.createDataFrame([(1, "high"), (2, "low")],
                                "user_id long, bucket string")
    inner = joins.stream_static_enrich(stream, dim, "user_id")
    assert {r.user_id for r in inner.collect()} == {1, 2}
    left = joins.stream_static_enrich(stream, dim, "user_id", how="left")
    got = {r.user_id: r.bucket for r in left.collect()}
    assert got[3] is None and len(got) == 3
    with pytest.raises(ValueError):
        joins.stream_static_enrich(stream, dim, "user_id", how="full")


# ----------------------------------------------------- funnel / OHLC / ORC

def test_curation_funnel_consistency(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import corpus
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

    docs = catalog.load_table(spark, SF_SMOKE, "documents")
    rows = {r.stage: r for r in corpus.curation_funnel(docs).collect()}
    assert list(sorted(rows)) == ["exact_dedup", "input", "neardup_prune",
                                  "quality_gate"]
    # telescoping: each stage's n_in equals the previous stage's n_kept
    order = ["input", "quality_gate", "exact_dedup", "neardup_prune"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur].n_in == rows[prev].n_kept
        assert rows[cur].n_dropped == rows[cur].n_in - rows[cur].n_kept
    assert rows["input"].n_in == rows["input"].n_kept == docs.count()
    # final survivor count equals the actual build output
    assert rows["neardup_prune"].n_kept == corpus.build_corpus(docs).count()


def test_daily_ohlc_first_last_semantics(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import stats

    df = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 10, 5.00),
         (1, "2024-01-01 02:00:00", 11, 1.25),   # low
         (1, "2024-01-01 03:00:00", 12, 9.75),   # high
         (1, "2024-01-01 03:00:00", 13, 2.00),   # close: later tie id wins
         (2, "2024-01-01 05:00:00", 14, 3.00)],
        "user_id long, ts string, event_id long, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .withColumn("day", F.col("ts").cast("date"))
    got = {r.user_id: r for r in stats.daily_ohlc(
        df, ["user_id", "day"], "ts", "event_id", "value").collect()}
    r1 = got[1]
    assert (r1.open_cents, r1.high_cents, r1.low_cents, r1.close_cents,
            r1.n_events) == (500, 975, 125, 200, 4)
    r2 = got[2]
    assert r2.open_cents == r2.close_cents == 300 and r2.n_events == 1


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog, io

    docs = catalog.load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_orc")
    io.write_orc(docs, path)
    back = io.read_orc(spark, path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    # filter + projection push into the ORC scan
    plan = back.filter(F.col("doc_id") < 10).select("doc_id", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(doc_id)" in plan
    assert "ReadSchema" in plan


def test_zscore_trainfit_uses_train_only(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import stats

    train = spark.createDataFrame(
        [("a", 1.00), ("a", 3.00), ("b", 5.00), ("b", 7.00)],
        "k string, value double")
    test = spark.createDataFrame(
        [(1, "a", 99.00), (2, "c", 1.00)], "id long, k string, value double")
    params = stats.group_moments(train, ["k"], "value")
    got = stats.zscore_apply(test, params, ["k"], "value").collect()
    # unseen category 'c' drops (inner join); 'a' scored by TRAIN stats
    assert [r.id for r in got] == [1]
    # train a: mean 200 cents, sample std sqrt(20000) — test value ignored
    import math
    assert abs(got[0].z - (9900 - 200) / math.sqrt(20000)) < 1e-12


def test_vocab_index_and_term_matrix(spark):
    docs = spark.createDataFrame(
        [(1, "b a b"), (2, "a c"), (3, "a")], "doc_id long, text string")
    vocab = {r.term: (r.term_idx, r.df)
             for r in ranking.vocab_index(docs, "doc_id", "text").collect()}
    # df: a=3, b=1, c=1 → a idx 0; ties (b, c) break alphabetically
    assert vocab == {"a": (0, 3), "b": (1, 1), "c": (2, 1)}
    m = {(r.doc_id, r.term_idx): r.tf
         for r in ranking.doc_term_matrix(docs, "doc_id", "text").collect()}
    assert m == {(1, 0): 1, (1, 1): 2, (2, 0): 1, (2, 2): 1, (3, 0): 1}
    # min_df prunes the tail
    v2 = ranking.vocab_index(docs, "doc_id", "text", min_df=2)
    assert [r.term for r in v2.collect()] == ["a"]
