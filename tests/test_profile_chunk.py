"""Table profiling and document chunking semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import profile, text
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def test_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "k bigint, v string")
    got = {r["col_name"]: (r["n_rows"], r["n_nonnull"], r["n_distinct"])
           for r in profile.profile_table(df).collect()}
    assert got == {"k": (4, 4, 3), "v": (4, 3, 2)}


def test_profile_single_pass(spark):
    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    plan = (profile.profile_table(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Expand") == 1          # one multi-distinct pass
    assert "Join" not in plan


def test_profile_approx_within_hll_error(spark):
    ev = catalog.load_table(spark, SF, "events")
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile.profile_table(ev).collect()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile.profile_table(ev, approx=True).collect()}
    for c, e in exact.items():
        # HLL++ default rsd = 5%; small cardinalities are near-exact
        bound = max(3, 4 * 0.05 * e)
        assert abs(approx[c] - e) <= bound, (c, e, approx[c])


def test_chunk_documents_structure(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],
        "doc_id bigint, text string")
    out = {r["chunk_idx"]: r for r in
           text.chunk_documents(docs, "doc_id", "text",
                                chunk_tokens=4, overlap_tokens=1).collect()}
    # stride 3, starts capped at n-1-overlap=8: 0,3,6 → 4,4,4 tokens
    # (a start at 9 would be a pure suffix of chunk 2 — must not exist)
    assert [out[i]["n_tokens"] for i in sorted(out)] == [4, 4, 4]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"     # 1-token overlap
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"     # covers the tail


def test_chunk_reconstruction_covers_all_tokens(spark):
    docs = catalog.load_table(spark, SF, "documents").limit(50)
    chunks = text.chunk_documents(docs, "doc_id", "text",
                                  chunk_tokens=32, overlap_tokens=8)
    # stride-aligned de-overlap: chunk 0 entire, others drop the first 8
    # (overlap) tokens; stitching in chunk order must rebuild the doc
    joined = chunks.withColumn(
        "part",
        F.when(F.col("chunk_idx") == 0, F.col("chunk_text"))
         .otherwise(F.concat_ws(
             " ", F.slice(F.split("chunk_text", " "), 9, 1_000_000))))
    import collections
    parts = collections.defaultdict(list)
    for r in joined.collect():
        parts[r["doc_id"]].append((r["chunk_idx"], r["part"]))
    rebuilt_py = {d: " ".join(p for _i, p in sorted(v))
                  for d, v in parts.items()}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rebuilt_py == orig


# --------------------------------------------------------------------------
# remove_common_segments (corpus boilerplate scrub)
# --------------------------------------------------------------------------

def test_remove_common_segments_drops_shared(spark):
    docs = spark.createDataFrame(
        [(1, "hdr foo a b c d"),       # "hdr foo" shared by docs 1+2
         (2, "hdr foo x y z w"),
         (3, "p q r s")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.remove_common_segments(docs, "doc_id", "text",
                                       seg_tokens=2, max_docfreq=1).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert out[1]["n_segs_dropped"] == 1 and out[1]["n_segs_kept"] == 2
    assert out[2]["clean_text"] == "x y z w"
    assert out[3]["clean_text"] == "p q r s"
    assert out[3]["n_segs_dropped"] == 0


def test_remove_common_segments_all_boilerplate_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "same same"), (2, "same same")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.remove_common_segments(docs, "doc_id", "text",
                                       seg_tokens=2, max_docfreq=1).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_segs_kept"] == 0
    assert set(out) == {1, 2}


def test_remove_common_segments_within_doc_repeat_kept(spark):
    # a segment repeated WITHIN one doc has docfreq 1 -> kept both times
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d e f")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.remove_common_segments(docs, "doc_id", "text",
                                       seg_tokens=2, max_docfreq=1).collect()}
    assert out[1]["clean_text"] == "a b a b"
