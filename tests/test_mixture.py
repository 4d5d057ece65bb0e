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


def test_temperature_weights_flatten_toward_uniform(spark, docs):
    """α=0.5 weights must sit BETWEEN proportional (α=1) and uniform:
    the largest source's allocation share shrinks, the smallest's grows,
    and allocations never exceed the budget in total."""
    budget = 10_000
    prop = {r["source"]: r for r in mixture.mixture_allocations(
        docs, F.col("total_tokens"), budget_tokens=budget).collect()}
    temp = {r["source"]: r for r in mixture.temperature_mixture_plan(
        docs, budget_tokens=budget, alpha_halves=1).collect()}
    assert set(prop) == set(temp)
    assert sum(r["alloc_tokens"] for r in temp.values()) <= budget
    big = max(prop, key=lambda s: prop[s]["total_tokens"])
    small = min(prop, key=lambda s: prop[s]["total_tokens"])
    if prop[big]["total_tokens"] > prop[small]["total_tokens"]:
        assert temp[big]["alloc_tokens"] <= prop[big]["alloc_tokens"]
        assert temp[small]["alloc_tokens"] >= prop[small]["alloc_tokens"]
    # weight really is floor(sqrt(total))
    for s, r in temp.items():
        assert r["weight"] == int(float(r["total_tokens"]) ** 0.5)


def test_temperature_alpha_quarter_flattens_further(spark):
    # a 100:1 skewed corpus makes the flattening signal dominate the
    # integer-weight quantization (the near-uniform fixture doesn't)
    rows = [(f"big{i}", "big", "w " * 99 + "w") for i in range(100)]
    rows += [("s0", "small", "w " * 99 + "w")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    b = 10_000

    def share(alpha_halves):
        t = {r["source"]: r["alloc_tokens"]
             for r in mixture.temperature_mixture_plan(
                 df, budget_tokens=b,
                 alpha_halves=alpha_halves).collect()}
        return t["big"] / max(t["small"], 1)

    # proportional would be 100:1; α=.5 → 10:1; α=.25 → ~3.2:1
    assert share(1) < 15
    assert share(2) < share(1)
    with pytest.raises(ValueError):
        mixture.temperature_weights(0)


def test_overflow_envelope_dict_raises(spark, docs):
    """weight*budget ≥ 2^31 in the dict path raises with a rescale hint
    instead of overflowing the 32.32 threshold numerator (round-4 ADVICE)."""
    with pytest.raises(ValueError, match="2\\^31"):
        mixture.mixture_allocations(
            docs, {"web": 10**6, "books": 1}, budget_tokens=10**7)
    with pytest.raises(ValueError, match="2\\^31"):
        mixture.mixture_allocations(docs, {"web": 1}, budget_tokens=2**31)


def test_overflow_envelope_column_self_rescales(spark, docs):
    """Token-scale Column weights (the temperature path on a huge source)
    self-rescale in-plan: no ANSI overflow, thresholds stay in [0, 2^32],
    allocations still sum to ≈budget, and proportions track the weights."""
    w = F.when(F.col("source") == "web", F.lit(3 * 10**9)) \
         .otherwise(F.lit(10**9))
    plan = mixture.mixture_allocations(
        docs, w, budget_tokens=20_000_000).collect()
    assert plan                                  # executed, no overflow
    total_alloc = sum(r["alloc_tokens"] for r in plan)
    assert 0 < total_alloc <= 20_000_000
    for r in plan:
        assert 0 <= r["keep_threshold_32"] <= 2**32
    by_src = {r["source"]: r for r in plan}
    if "web" in by_src and len(by_src) > 1:
        other = next(s for s in by_src if s != "web")
        ratio = (by_src["web"]["alloc_tokens"]
                 / max(1, by_src[other]["alloc_tokens"]))
        assert 2.5 <= ratio <= 3.5               # 3:1 weights preserved


def test_in_envelope_column_path_is_noop_rescale(spark, docs):
    """Inside the envelope the rescale divisor is exactly 1 — results are
    bit-identical to the dict path with the same weights."""
    expr_plan = sorted(map(tuple, mixture.mixture_allocations(
        docs, F.lit(7), budget_tokens=1000).collect()))
    srcs = [r[0] for r in expr_plan]
    dict_plan = sorted(map(tuple, mixture.mixture_allocations(
        docs, {s: 7 for s in srcs}, budget_tokens=1000).collect()))
    assert expr_plan == dict_plan
