from __future__ import annotations

import os

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.kvstore import KVStore
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.ledger import Ledger
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.pipeline import (
    KPI_TABLE,
    TOP_GENRES_TABLE,
    TOP_SONGS_TABLE,
    Pipeline,
    PipelineConfig,
)

SONGS_CSV = (
    "track_id,track_name,track_genre,duration_ms\n"
    "t1,Alpha,rock,200000\n"
    "t2,Beta,rock,100000\n"
    "t3,Gamma,jazz,300000\n"
)

STREAMS_1 = (
    "user_id,track_id,listen_time\n"
    "u1,t1,2024-01-01T10:00:00\n"
    "u1,t1,2024-01-01T11:00:00\n"
    "u2,t2,2024-01-01T12:00:00\n"
    "u3,t3,2024-01-02T09:00:00\n"
    ",t1,2024-01-02T09:30:00\n"      # null user_id -> quarantine
)

STREAMS_2 = (
    "user_id,track_id,listen_time\n"
    "u4,t2,2024-01-03T08:00:00\n"
)


@pytest.fixture()
def lake(tmp_path):
    base = tmp_path / "lake"
    (base / "raw" / "streams").mkdir(parents=True)
    (base / "raw" / "songs").mkdir(parents=True)
    (base / "raw" / "songs" / "songs.csv").write_text(SONGS_CSV)
    f1 = base / "raw" / "streams" / "streams1.csv"
    f1.write_text(STREAMS_1)
    os.utime(f1, (1000, 1000))  # oldest
    f2 = base / "raw" / "streams" / "streams2.csv"
    f2.write_text(STREAMS_2)
    os.utime(f2, (2000, 2000))
    return base


def test_kvstore_roundtrip(tmp_path):
    kv = KVStore(str(tmp_path / "kv.db"))
    kv.ensure_table("T", hash_key="pk", range_key="sk")
    kv.put_item("T", {"pk": "a", "sk": "b", "v": 1})
    kv.put_item("T", {"pk": "a", "sk": "b", "v": 2})  # upsert, not append
    assert kv.count("T") == 1
    assert kv.get_item("T", "a", "b")["v"] == 2
    kv.update_item("T", "a", {"v": 3}, range_value="b")
    assert kv.get_item("T", "a", "b")["v"] == 3


def test_ledger_idempotent(tmp_path):
    led = Ledger(KVStore(str(tmp_path / "kv.db")))
    assert led.try_claim("f.csv") is True
    assert led.try_claim("f.csv") is False   # same file twice -> second skipped
    led.mark_processed("f.csv")
    assert led.try_claim("f.csv") is False
    statuses = {e["filename"]: e["status"] for e in led.entries()}
    assert statuses == {"f.csv": "processed"}


def test_pipeline_end_to_end(spark, lake):
    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake)))
    done = pipe.run_all()
    assert done == ["streams1.csv", "streams2.csv"]  # oldest first

    # archive: raw emptied, archive populated (S12)
    assert os.listdir(lake / "raw" / "streams") == []
    assert sorted(os.listdir(lake / "archive" / "streams")) == ["streams1.csv", "streams2.csv"]

    # quarantine captured the null-user row (S9)
    bad = spark.read.parquet(str(lake / "bad-records" / "streams"))
    assert bad.count() == 1

    # partitioned parquet layout as documented (README.md:193, SURVEY.md §1.4)
    avg_dir = lake / "processed" / "avg_metrics"
    assert any(d.startswith("listen_date=") for d in os.listdir(avg_dir))

    # KV contents: KPIs for 2024-01-01 rock = 3 plays, 2 unique users
    kv = pipe.store
    item = kv.get_item(KPI_TABLE, "2024-01-01", "rock")
    assert item["listen_count"] == 3 and item["unique_listeners"] == 2
    assert item["total_listening_time"] == 500000.0
    assert item["avg_listen_time_per_user"] == 250000.0
    assert kv.count(TOP_SONGS_TABLE) > 0 and kv.count(TOP_GENRES_TABLE) > 0
    # composite genre_track key (F9)
    assert kv.get_item(TOP_SONGS_TABLE, "2024-01-01", "rock#Alpha")["rank"] == 1

    # re-running with nothing new is a no-op (ledger idempotency)
    assert pipe.run_all() == []


def test_pipeline_second_run_overwrites_partition_only(spark, lake):
    """Dynamic partition overwrite: reprocessing a late file for one date must
    not clobber other dates' partitions."""
    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake)))
    pipe.run_once()  # streams1: dates 01-01, 01-02
    d1 = set(os.listdir(lake / "processed" / "avg_metrics"))
    pipe.run_once()  # streams2: date 01-03 only
    d2 = set(os.listdir(lake / "processed" / "avg_metrics"))
    assert {d for d in d1 if d.startswith("listen_date=")} <= d2
    assert "listen_date=2024-01-03" in d2
