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
    route_reject_if_any_bad,
)

SONGS_CSV = (
    "track_id,track_name,track_genre,duration_ms\n"
    "t1,Alpha,rock,200000\n"
    "t2,Beta,rock,100000\n"
    "t3,Gamma,jazz,300000\n"
)

USERS_CSV = (
    "user_id,user_name,user_age,user_country,created_at\n"
    "u1,Ada,30,DE,2023-01-01T00:00:00\n"
    "u2,Ben,25,US,2023-02-01T00:00:00\n"
    "u3,Cam,,FR,2023-03-01T00:00:00\n"   # null age -> quarantine
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
    (base / "raw" / "users").mkdir(parents=True)
    (base / "raw" / "users" / "users.csv").write_text(USERS_CSV)
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

    # three-table validation (REF/glue_jobs/validate.py:53-67): validated
    # parquet per table, quarantine per table with bad rows
    assert spark.read.parquet(str(lake / "validated" / "streams")).count() == 5
    assert spark.read.parquet(str(lake / "validated" / "songs")).count() == 3
    users_ok = spark.read.parquet(str(lake / "validated" / "users"))
    assert {r["user_id"] for r in users_ok.collect()} == {"u1", "u2"}
    bad_users = spark.read.parquet(str(lake / "bad-records" / "users"))
    assert [r["user_id"] for r in bad_users.collect()] == ["u3"]

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


def test_pipeline_validation_routing_rejects(spark, lake):
    """branch_on_validation made real (REF DAG :65-67,105-110 is an
    always-continue stub): a strict router stops batches with quarantined
    rows — ledger shows 'rejected', raw file retained, no transform output —
    while clean batches still flow."""
    cfg = PipelineConfig(base_dir=str(lake),
                         on_validation_result=route_reject_if_any_bad)
    pipe = Pipeline(spark, cfg)
    done = pipe.run_all()
    # streams1 has a bad row (and users.csv always has one) -> both rejected
    # under the strict policy; nothing processes.
    assert done == []
    statuses = {e["filename"]: e["status"] for e in pipe.ledger.entries()}
    assert statuses == {"streams1.csv": "rejected", "streams2.csv": "rejected"}
    # rejected files stay in raw as evidence, nothing archived or processed
    assert sorted(os.listdir(lake / "raw" / "streams")) == [
        "streams1.csv", "streams2.csv"]
    assert not os.path.isdir(lake / "processed" / "avg_metrics")
    # rejected is terminal: a rerun never re-claims
    assert pipe.run_all() == []


def test_pipeline_cumulative_mode_merges_shared_dates(spark, lake):
    """Default granularity = the reference's last-file-wins on a shared
    listen_date; cumulative=True recomputes the affected dates from the
    (partition-pruned) validated lake so shared-date KPIs stay consistent."""
    f3 = lake / "raw" / "streams" / "streams3.csv"
    f3.write_text("user_id,track_id,listen_time\nu7,t1,2024-01-01T14:00:00\n")
    os.utime(f3, (3000, 3000))

    # default: streams3 (1 row for 2024-01-01) REPLACES that date's KPIs
    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake)))
    pipe.run_all()
    item = pipe.store.get_item(KPI_TABLE, "2024-01-01", "rock")
    assert (item["listen_count"], item["unique_listeners"]) == (1, 1)

    # cumulative: the date reflects streams1 (3 rock rows) + streams3 (1)
    import shutil
    shutil.rmtree(lake)  # rebuild the lake fixture fresh
    (lake / "raw" / "streams").mkdir(parents=True)
    (lake / "raw" / "songs").mkdir(parents=True)
    (lake / "raw" / "songs" / "songs.csv").write_text(SONGS_CSV)
    for name, body, mtime in [("streams1.csv", STREAMS_1, 1000),
                              ("streams2.csv", STREAMS_2, 2000)]:
        p = lake / "raw" / "streams" / name
        p.write_text(body)
        os.utime(p, (mtime, mtime))
    f3 = lake / "raw" / "streams" / "streams3.csv"
    f3.write_text("user_id,track_id,listen_time\nu7,t1,2024-01-01T14:00:00\n")
    os.utime(f3, (3000, 3000))

    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake), cumulative=True))
    pipe.run_all()
    item = pipe.store.get_item(KPI_TABLE, "2024-01-01", "rock")
    assert (item["listen_count"], item["unique_listeners"]) == (4, 3)
    # untouched dates keep their aggregates
    assert pipe.store.get_item(KPI_TABLE, "2024-01-03", "rock")["listen_count"] == 1


def test_pipeline_streaming_end_to_end_exactly_once(spark, lake):
    """SURVEY §2.9 closed loop: csv_file_stream → run_available_now →
    foreachBatch = validate+transform+KV load, checkpoint as the ledger.
    Restarting over the same checkpoint reprocesses nothing (KV and the
    validated lake are byte-stable); a late-arriving file gets exactly one
    micro-batch."""
    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake)))
    pipe.run_streaming()

    # both files drained through the full pipeline
    assert spark.read.parquet(str(lake / "validated" / "streams")).count() == 5
    item = pipe.store.get_item(KPI_TABLE, "2024-01-01", "rock")
    assert item["listen_count"] == 3 and item["unique_listeners"] == 2
    assert pipe.store.get_item(KPI_TABLE, "2024-01-03", "rock")["listen_count"] == 1
    kv_before = {t: pipe.store.scan(t) for t in
                 (KPI_TABLE, TOP_SONGS_TABLE, TOP_GENRES_TABLE)}

    # restart over the same checkpoint: exactly-once -> nothing replays
    pipe.run_streaming()
    assert spark.read.parquet(str(lake / "validated" / "streams")).count() == 5
    assert {t: pipe.store.scan(t) for t in kv_before} == kv_before

    # a late file is processed exactly once, existing dates untouched
    f3 = lake / "raw" / "streams" / "streams3.csv"
    f3.write_text("user_id,track_id,listen_time\nu9,t3,2024-01-04T12:00:00\n")
    os.utime(f3, (3000, 3000))
    pipe.run_streaming()
    assert spark.read.parquet(str(lake / "validated" / "streams")).count() == 6
    assert pipe.store.get_item(KPI_TABLE, "2024-01-04", "jazz")["listen_count"] == 1
    assert pipe.store.get_item(KPI_TABLE, "2024-01-01", "rock") == item


def test_pipeline_routing_counts_surface(spark, lake):
    """The router sees real per-table (good, bad) counts."""
    seen = {}

    def spy(counts):
        seen.update(counts)
        return True

    pipe = Pipeline(spark, PipelineConfig(base_dir=str(lake),
                                          on_validation_result=spy))
    pipe.run_once()  # streams1
    assert seen["streams"] == (4, 1)
    assert seen["songs"] == (3, 0)
    assert seen["users"] == (2, 1)
