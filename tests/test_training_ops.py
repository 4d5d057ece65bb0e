"""Round-2 training-data operators: decontamination, deterministic
splits/sampling, sequence packing, normalization/redaction, quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    decontam,
    packing,
    sampling,
    similarity,
    text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- decontamination ---------------------------------------------------------

def test_decontaminate_removes_overlapping_docs(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),      # == bench 100
        (2, "one two three four five six seven"),        # clean
        (3, "alpha beta gamma delta nine ten"),          # partial overlap
    ])
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])

    pairs = {(r["doc_id"], r["bench_id"]): r["n_shared_ngrams"]
             for r in decontam.contamination_pairs(
                 train, bench, n=3, min_overlap=2).collect()}
    assert pairs[(1, 100)] == 4          # all 4 trigrams of the 6-token doc
    assert pairs[(3, 100)] == 2          # shared 'alpha beta gamma delta'
    assert (2, 100) not in pairs

    clean = decontam.decontaminate(train, bench, n=3, min_overlap=2)
    assert {r["doc_id"] for r in clean.collect()} == {2}

    # raising the bar keeps the partial-overlap doc
    loose = decontam.decontaminate(train, bench, n=3, min_overlap=3)
    assert {r["doc_id"] for r in loose.collect()} == {2, 3}


# -- deterministic splits / sampling -----------------------------------------

def test_hash_split_partitions_and_is_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = sampling.hash_split(df, "k", train_pct=80, val_pct=10)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000                 # partition: no loss
    assert 0.75 < counts["train"] / 2000 < 0.85         # ~uniform buckets
    assert 0.06 < counts["val"] / 2000 < 0.14
    # determinism: identical assignment on re-run
    again = sampling.hash_split(df, "k", train_pct=80, val_pct=10)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    # a different salt draws an independent assignment (some docs move)
    salted = (sampling.hash_split(df, "k", train_pct=80, val_pct=10, salt="s1")
              .withColumnRenamed("split", "split2"))
    moved = out.join(salted, "k").filter(F.col("split") != F.col("split2")).count()
    assert 0 < moved < 2000


def test_stratified_hash_sample_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("stratum"))
    out = sampling.stratified_hash_sample(
        df, "k", "stratum", {"a": 0.5, "b": 0.1}, default_fraction=0.0)
    counts = {r["stratum"]: r["count"]
              for r in out.groupBy("stratum").count().collect()}
    assert 0.4 < counts["a"] / 1000 < 0.6
    assert 0.05 < counts["b"] / 1000 < 0.15
    assert "c" not in counts                            # default 0 -> dropped
    # subset of input, deterministic
    assert out.join(df, ["k", "stratum"]).count() == out.count()


# -- sequence packing --------------------------------------------------------

def test_pack_documents_offsets_and_bins(spark):
    docs = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "d e f g"), (3, "s", "h i"),
         (10, "t", "x y z")],
        "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in
           packing.pack_documents(docs, budget_tokens=5).collect()}
    assert (out[1]["token_offset"], out[1]["bin_idx"], out[1]["bin_offset"]) == (0, 0, 0)
    assert (out[2]["token_offset"], out[2]["bin_idx"], out[2]["bin_offset"]) == (3, 0, 3)
    assert (out[3]["token_offset"], out[3]["bin_idx"], out[3]["bin_offset"]) == (7, 1, 2)
    assert (out[10]["token_offset"], out[10]["bin_idx"]) == (0, 0)   # new group

    stats = {r["source"]: r for r in packing.packing_stats(
        packing.pack_documents(docs, budget_tokens=5),
        budget_tokens=5).collect()}
    assert stats["s"]["n_bins"] == 2 and stats["s"]["total_tokens"] == 9
    assert stats["s"]["fill_ratio"] == 9 / 10
    assert stats["t"]["n_bins"] == 1 and stats["t"]["fill_ratio"] == 3 / 5


# -- normalization / redaction ----------------------------------------------

def test_normalize_text(spark):
    docs = _docs(spark, [(1, "  Hello,   WORLD!! (x=1) "), (2, "already clean")])
    out = {r["doc_id"]: r["norm_text"]
           for r in text.normalize_text(docs).collect()}
    assert out[1] == "hello world x1"
    assert out[2] == "already clean"


def test_redact_pii(spark):
    docs = _docs(spark, [
        (1, "mail a.b+c@ex-ample.org now"),
        (2, "see https://x.io/p?q=1 and http://y.z/"),
        (3, "host 10.0.255.1 up"),
        (4, "nothing to hide"),
    ])
    out = {r["doc_id"]: r["redacted_text"] for r in text.redact_pii(docs).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "see <URL> and <URL>"
    assert out[3] == "host <IP> up"
    assert out[4] == "nothing to hide"


# -- quantization ------------------------------------------------------------

def test_quantize_dequantize_error_bound(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -0.9, 0.0, 0.9]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    q = similarity.quantize_embeddings(emb, bits=8)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert abs(rows[1]["scale"] - 0.9) < 1e-6
    assert rows[1]["qvec"][3] == 127                    # x == +scale -> +L exactly
    assert rows[2]["scale"] == 0.0 and rows[2]["qvec"] == [0, 0, 0, 0]

    joined = emb.join(q, "vec_id").select(
        "vec_id", "scale",
        F.zip_with(F.col("embedding"),
                   similarity.dequantize_expr("qvec", "scale"),
                   lambda x, d: F.abs(x.cast("double") - d)).alias("err"))
    for r in joined.collect():
        bound = r["scale"] / 127 + 1e-12
        assert all(e <= bound for e in r["err"]), (r["vec_id"], r["err"])


def test_weighted_hash_sample_rates_and_determinism(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sampling
    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(0.8)).otherwise(F.lit(0.2))
        .alias("w"))
    kept = sampling.weighted_hash_sample(df, "k", F.col("w")).collect()
    even = sum(1 for r in kept if r["k"] % 2 == 0) / 10_000
    odd = sum(1 for r in kept if r["k"] % 2 == 1) / 10_000
    assert abs(even - 0.8) < 0.03 and abs(odd - 0.2) < 0.03
    again = sampling.weighted_hash_sample(df, "k", F.col("w")).collect()
    assert sorted(r["k"] for r in again) == sorted(r["k"] for r in kept)
    # weight 0 keeps nothing; weight 1 keeps everything
    assert sampling.weighted_hash_sample(
        df, "k", F.lit(0.0)).count() == 0
    assert sampling.weighted_hash_sample(
        df, "k", F.lit(1.0)).count() == 20_000


def test_ngram_counts_small(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import ranking
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id bigint, text string")
    got = {r["ngram"]: (r["cnt"], r["docfreq"])
           for r in ranking.ngram_counts(docs, "doc_id", "text", n=2).collect()}
    assert got == {"a b": (3, 2), "b a": (1, 1), "b c": (1, 1)}
    cont = {r["token"]: r["n_left_contexts"]
            for r in ranking.continuation_counts(docs, "text").collect()}
    assert cont == {"b": 1, "a": 1, "c": 1}


def test_leakage_safe_split_keeps_clusters_together(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import cluster, dedup, sampling
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                      n=3, threshold=0.8)
    assigns = cluster.cluster_assignments(docs, pairs, "doc_id")
    out = sampling.leakage_safe_split(docs.select("doc_id"), assigns,
                                      "doc_id").collect()
    assert len(out) == docs.count()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    # and the near-dup pairs specifically never straddle
    split_of = {r["doc_id"]: r["split"] for r in out}
    for p in pairs.collect():
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]]
    assert {r["split"] for r in out} >= {"train"}


def test_shard_by_token_budget_contiguous_and_bounded(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sorted(packing.shard_by_token_budget(docs, shard_tokens=500)
                 .collect(), key=lambda r: r["doc_id"])
    # cumsum consistency + shard of the first token
    acc = 0
    for r in out:
        assert r["cum_tokens"] == acc + r["n_tokens"]
        assert r["shard_id"] == acc // 500
        acc = r["cum_tokens"]
    # shards are contiguous id-ranges
    shards = [r["shard_id"] for r in out]
    assert shards == sorted(shards)
    # every full shard holds >= the budget's worth of starts
    total = out[-1]["cum_tokens"]
    assert shards[-1] == (total - out[-1]["n_tokens"]) // 500


def test_split_label_matches_hash_split(spark):
    # round-12 equivalence pin: the bare-Column split_label must assign
    # exactly what hash_split assigns, for non-default pcts too
    import pytest as _pytest

    df = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    a = sampling.hash_split(df, "k", train_pct=80, val_pct=10)
    b = df.select("k", sampling.split_label(
        F.col("k"), train_pct=80, val_pct=10).alias("split"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with _pytest.raises(ValueError):
        sampling.split_label("k", train_pct=0, val_pct=0)
