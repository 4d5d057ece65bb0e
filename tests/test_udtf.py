"""Python UDTF surface (§2.10): lateral tokenizer vs its JVM twin."""

from __future__ import annotations

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.functions import udtfs


def test_udtf_matches_builtin_rowset(spark):
    docs = spark.createDataFrame(
        [(1, "a b a  c b"), (2, "solo"), (3, "")],
        "doc_id long, text string")
    got = sorted(map(tuple, udtfs.tokenize_first_seen_udtf(spark, docs)
                     .collect()))
    want = sorted(map(tuple, udtfs.tokenize_first_seen_builtin(docs)
                      .collect()))
    assert got == want
    assert len(got) > 0


def test_udtf_first_occurrence_semantics(spark):
    docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    rows = {r["pos"]: (r["token"], r["first_occurrence"])
            for r in udtfs.tokenize_first_seen_udtf(spark, docs).collect()}
    assert rows == {0: ("x", True), 1: ("y", True), 2: ("x", False)}
