"""Mixture operators: domain token caps and weighted mixture scheduling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import mixture
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return catalog.load_table(spark, SF, "documents")


def test_cap_respects_budget_with_straddler(spark, docs):
    capped = mixture.cap_tokens_per_group(docs, cap_tokens=500)
    # every kept doc started strictly below the cap
    assert capped.filter(F.col("tokens_before") >= 500).count() == 0
    # and within each source the kept set is a doc_id-order prefix:
    # dropping a doc means every later doc of that source is dropped too
    joined = (docs.select("doc_id", "source")
              .join(capped.select("doc_id").withColumn("_kept", F.lit(1)),
                    "doc_id", "left"))
    w_max_kept = (joined.groupBy("source")
                  .agg(F.max(F.when(F.col("_kept") == 1,
                                    F.col("doc_id"))).alias("max_kept"),
                       F.min(F.when(F.col("_kept").isNull(),
                                    F.col("doc_id"))).alias("min_dropped")))
    bad = w_max_kept.filter(
        F.col("min_dropped").isNotNull()
        & (F.col("max_kept") > F.col("min_dropped"))).count()
    assert bad == 0


def test_cap_exclusive_never_exceeds(spark, docs):
    capped = mixture.cap_tokens_per_group(docs, cap_tokens=500,
                                          include_straddler=False)
    sums = capped.groupBy("source").agg(F.sum("n_tokens").alias("s"))
    assert sums.filter(F.col("s") > 500).count() == 0


def test_mixture_allocations_dict_and_expr(spark, docs):
    srcs = [r[0] for r in
            docs.select("source").distinct().limit(3).collect()]
    plan = mixture.mixture_allocations(
        docs, {srcs[0]: 2, srcs[1]: 1}, budget_tokens=10_000)
    rows = {r["source"]: r for r in plan.collect()}
    # zero-weight sources allocate nothing; allocations follow the 2:1 split
    assert rows[srcs[2]]["alloc_tokens"] == 0
    assert rows[srcs[0]]["alloc_tokens"] == 2 * 10_000 // 3
    assert rows[srcs[1]]["alloc_tokens"] == 10_000 // 3
    # expr-weight path: allocations over all sources sum to ≤ budget
    plan2 = mixture.mixture_allocations(
        docs, F.length(F.col("source")) % 3 + 1, budget_tokens=10_000)
    total_alloc = plan2.agg(F.sum("alloc_tokens")).collect()[0][0]
    assert 0 < total_alloc <= 10_000


def test_mixture_schedule_hits_budget_roughly(spark, docs):
    w = F.length(F.col("source")) % 3 + 1
    kept = mixture.mixture_schedule(docs, w, budget_tokens=50_000)
    kept_tokens = (kept.select(
        mixture.token_count("text").alias("n"))
        .agg(F.sum("n")).collect()[0][0])
    total = docs.select(mixture.token_count("text").alias("n")) \
        .agg(F.sum("n")).collect()[0][0]
    budget = min(50_000, total)
    # md5 sampling is Bernoulli per doc: expect the budget within ~35%
    assert 0.65 * budget * 0.9 < kept_tokens < 1.35 * budget
    # determinism: same inputs → identical kept set
    kept2 = mixture.mixture_schedule(docs, w, budget_tokens=50_000)
    assert {r[0] for r in kept.select("doc_id").collect()} == \
        {r[0] for r in kept2.select("doc_id").collect()}


def test_token_count_matches_split_semantics(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), ("one",), ("x  y",)], "text string")
    got = [r[0] for r in
           df.select(mixture.token_count("text")).collect()]
    want = [r[0] for r in
            df.select(F.size(F.split(F.col("text"), " "))).collect()]
    assert got == [int(w) for w in want]


def test_all_zero_weights_rejected(spark, docs):
    with pytest.raises(ValueError, match="zero"):
        mixture.mixture_allocations(docs, {"a": 0, "b": 0},
                                    budget_tokens=1000)


def test_zero_weight_expression_rejected(spark, docs):
    with pytest.raises(ValueError, match="empty"):
        mixture.mixture_schedule(docs, F.lit(0), budget_tokens=1000)
