"""Bucketed-table writes: the co-located join layout. A join of two tables
bucketed on the join key with the same bucket count must run WITHOUT any
shuffle exchange — the bucket files are the shuffle, paid once at write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import io


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    # session warehouse dir is a tempdir (conftest); DROP TABLE cleans up
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("v"))
    dims = spark.range(0, 1_000).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("w"))
    io.write_bucketed(facts, "b_facts", ["user_id"], 8, sort_cols=["user_id"])
    io.write_bucketed(dims, "b_dims", ["user_id"], 8, sort_cols=["user_id"])
    try:
        joined = spark.table("b_facts").join(spark.table("b_dims"), "user_id")
        plan = _executed(joined)
        assert "Exchange" not in plan          # buckets ARE the shuffle
        assert "SelectedBucketsCount" in plan  # bucketed scan actually used
        assert joined.count() == 1_000
        # aggregation on the bucket key is exchange-free too
        agg = spark.table("b_facts").groupBy("user_id").agg(F.sum("v"))
        assert "Exchange" not in _executed(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_unbucketed_same_join_does_shuffle(spark, no_broadcast):
    """Control: the identical join without bucketing needs exchanges —
    proves the previous test's assertion is meaningful."""
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("v"))
    dims = spark.range(0, 1_000).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("w"))
    assert "Exchange" in _executed(facts.join(dims, "user_id"))
