"""Time-interval join: batch ≡ stream-stream equivalence, bound
inclusivity, and the batch plan staying a hash join."""

from __future__ import annotations

import datetime as dt

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import joins

T0 = dt.datetime(2024, 1, 1, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def frames(spark):
    purchases = spark.createDataFrame(
        [(1, _mins(60), 7), (2, _mins(200), 7), (3, _mins(60), 8)],
        "pid bigint, ts timestamp, user_id bigint")
    clicks = spark.createDataFrame(
        [(10, _mins(0), 7),     # exactly lower bound for pid1 (60 min)
         (11, _mins(45), 7),    # inside pid1's window
         (12, _mins(61), 7),    # after pid1 (upper=0), before pid2's window
         (13, _mins(150), 7),   # inside pid2's window
         (14, _mins(59), 9)],   # wrong user
        "cid bigint, ts timestamp, user_id bigint")
    return purchases, clicks


EXPECT = {(1, 10), (1, 11), (2, 13)}


def test_batch_interval_join(frames):
    purchases, clicks = frames
    out = joins.time_interval_join(purchases, clicks, "user_id",
                                   lower_seconds=3600, upper_seconds=0)
    got = {(r["pid"], r["r_cid"]) for r in out.collect()}
    assert got == EXPECT


def test_batch_plan_is_hash_join(frames):
    purchases, clicks = frames
    plan = (joins.time_interval_join(purchases, clicks, "user_id",
                                     lower_seconds=3600)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stream_stream_equals_batch(spark, tmp_path, frames):
    purchases, clicks = frames
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.coalesce(1).write.parquet(pdir)
    clicks.coalesce(1).write.parquet(cdir)
    ps = spark.readStream.schema(purchases.schema).parquet(pdir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    out = joins.time_interval_join(ps, cs, "user_id",
                                   lower_seconds=3600, upper_seconds=0)
    q = (out.writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["pid"], r["r_cid"])
           for r in spark.sql("select * from ssj").collect()}
    assert got == EXPECT
