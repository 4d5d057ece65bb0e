from __future__ import annotations

import os

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.schemas import STREAMS
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import filestream


def _write(dirpath, name, body, mtime):
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        f.write(body)
    os.utime(p, (mtime, mtime))
    return p


def test_available_now_drains_in_file_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.csv", "user_id,track_id,listen_time\nu1,t1,2024-01-01T10:00:00\n", 1000)
    _write(str(src), "b.csv", "user_id,track_id,listen_time\nu2,t1,2024-01-02T10:00:00\n", 2000)

    batches: list[int] = []
    seen_users: set[str] = set()

    def process(df, epoch_id):
        rows = df.collect()
        batches.append(len(rows))
        seen_users.update(r["user_id"] for r in rows)

    stream = filestream.csv_file_stream(spark, str(src), STREAMS, max_files_per_trigger=1)
    q = filestream.run_available_now(stream, process, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    # one file per micro-batch (the reference's one-file-per-DAG-run), all drained
    assert batches == [1, 1]
    assert seen_users == {"u1", "u2"}


def test_checkpoint_is_the_ledger(spark, tmp_path):
    """Restarting over the same source reprocesses nothing; a new file is
    picked up — exactly-once at file granularity (SURVEY.md §2.9)."""
    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.csv", "user_id,track_id,listen_time\nu1,t1,2024-01-01T10:00:00\n", 1000)

    counts = []

    def process(df, epoch_id):
        counts.append(df.count())

    ckpt = str(tmp_path / "ckpt")
    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    filestream.run_available_now(stream, process, ckpt).awaitTermination(120)
    assert sum(counts) == 1

    # restart: nothing new -> no rows reprocessed
    counts.clear()
    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    filestream.run_available_now(stream, process, ckpt).awaitTermination(120)
    assert sum(counts) == 0

    # add a file -> only it is processed
    _write(str(src), "b.csv", "user_id,track_id,listen_time\nu2,t2,2024-01-03T10:00:00\n", 3000)
    counts.clear()
    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    filestream.run_available_now(stream, process, ckpt).awaitTermination(120)
    assert sum(counts) == 1


def test_streaming_kpis_match_batch(spark, tmp_path):
    """foreachBatch runs the batch operators unchanged on streaming input."""
    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.csv",
           "user_id,track_id,listen_time\n"
           "u1,t1,2024-01-01T10:00:00\nu2,t1,2024-01-01T11:00:00\n", 1000)
    songs = spark.createDataFrame([("t1", "Alpha", "rock", 100)],
                                  "track_id string, track_name string, track_genre string, duration_ms long")
    out = []

    def process(df, epoch_id):
        out.extend(kpi.genre_kpi_pipeline(df, songs).collect())

    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    filestream.run_available_now(stream, process, str(tmp_path / "ckpt")).awaitTermination(120)
    assert len(out) == 1
    assert out[0]["unique_listeners"] == 2 and out[0]["listen_count"] == 2


def test_streaming_session_window_stateful(spark, tmp_path):
    """session_window as a genuine stateful streaming aggregation (not
    foreachBatch): two micro-batches, complete-mode memory sink; the final
    table must equal the batch answer. (Session windows reject update mode;
    in production append mode + watermark emits sessions as they close.)"""
    from pyspark.sql import functions as F

    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sessions

    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.csv",
           "user_id,ts\nu1,2024-01-01T10:00:00\nu1,2024-01-01T10:10:00\n", 1000)
    _write(str(src), "b.csv", "user_id,ts\nu1,2024-01-01T20:00:00\n", 2000)

    stream = (spark.readStream.schema("user_id string, ts timestamp")
              .option("header", True).option("maxFilesPerTrigger", 1)
              .option("latestFirst", False).csv(str(src)))
    agg = sessions.session_window_stats(
        stream.withWatermark("ts", "0 seconds"), gap_seconds=3600)
    q = (agg.writeStream.format("memory").queryName("sess_updates")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    latest = {(r["user_id"], str(r["window_start"])): r["n_events"]
              for r in spark.sql("SELECT * FROM sess_updates").collect()}
    batch = sessions.session_window_stats(
        spark.createDataFrame(
            [("u1", "2024-01-01T10:00:00"), ("u1", "2024-01-01T10:10:00"),
             ("u1", "2024-01-01T20:00:00")], "user_id string, ts string")
        .withColumn("ts", F.to_timestamp("ts")), gap_seconds=3600)
    expect = {(r["user_id"], str(r["window_start"])): r["n_events"]
              for r in batch.collect()}
    assert latest == expect and len(expect) == 2


def test_stateful_closed_sessions_across_batches(spark, tmp_path):
    """applyInPandasWithState: session state must survive micro-batch
    boundaries; a session is emitted exactly when a later event closes it."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import stateful

    src = tmp_path / "in"
    src.mkdir()
    # batch 1: an open session for u1 (2 events), one for u2
    _write(str(src), "a.csv",
           "user_id,ts\nu1,2024-01-01T10:00:00\nu1,2024-01-01T10:10:00\n"
           "u2,2024-01-01T09:00:00\n", 1000)
    # batch 2: u1 event past the gap -> closes u1 session 0; u2 stays open
    _write(str(src), "b.csv", "user_id,ts\nu1,2024-01-01T20:00:00\n", 2000)

    stream = (spark.readStream.schema("user_id string, ts timestamp")
              .option("header", True).option("maxFilesPerTrigger", 1)
              .option("latestFirst", False).csv(str(src)))
    q = (stateful.closed_sessions(stream, gap_seconds=3600)
         .writeStream.format("memory").queryName("closed_sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM closed_sessions").collect()
    assert len(rows) == 1  # only u1's first session is provably closed
    r = rows[0]
    assert (r["user_id"], r["session_idx"], r["n_events"],
            r["duration_secs"]) == ("u1", 0, 2, 600)
    assert str(r["session_start"]) == "2024-01-01 10:00:00"
    assert str(r["session_end"]) == "2024-01-01 10:10:00"


def test_stream_dedup_matches_batch(spark, tmp_path):
    """dedup_events: identical result set in batch (dropDuplicates) and
    stream (dropDuplicatesWithinWatermark) modes for in-horizon dupes."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import dedupe
    src = tmp_path / "dd_in"
    src.mkdir()
    rows = ("event_id,ts\n"
            "e1,2024-01-01T10:00:00\n"
            "e2,2024-01-01T10:00:05\n"
            "e1,2024-01-01T10:00:09\n")          # e1 re-delivered
    (src / "a.csv").write_text(rows)
    schema = "event_id string, ts timestamp"
    batch = spark.read.csv(str(src), header=True, schema=schema)
    got_batch = sorted(r["event_id"]
                       for r in dedupe.dedup_events(batch, ["event_id"]).collect())
    assert got_batch == ["e1", "e2"]

    stream = (spark.readStream.schema(schema)
              .option("header", True).csv(str(src)))
    q = (dedupe.dedup_events(stream, ["event_id"], watermark="10 minutes")
         .writeStream.format("memory").queryName("dd_out")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_stream = sorted(r["event_id"]
                        for r in spark.sql("select * from dd_out").collect())
    assert got_stream == got_batch


def test_stream_static_enrichment_left_join(spark, tmp_path):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import dedupe
    src = tmp_path / "en_in"
    src.mkdir()
    (src / "a.csv").write_text("k,v\nk1,10\nk3,30\n")
    dim = spark.createDataFrame([("k1", "one"), ("k2", "two")],
                                "k string, label string")
    stream = (spark.readStream.schema("k string, v int")
              .option("header", True).csv(str(src)))
    q = (dedupe.enrich_with_dim(stream, dim, "k")
         .writeStream.format("memory").queryName("en_out")
         .option("checkpointLocation", str(tmp_path / "en_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = {r["k"]: r["label"]
           for r in spark.sql("select * from en_out").collect()}
    # missing dim key survives with NULL (left join), never dropped
    assert out == {"k1": "one", "k3": None}


def test_continuous_processing_time_daemon(spark, tmp_path):
    """run_continuous (the reference's always-on 60 s sensor loop,
    REF/dags/music_etl_pipeline.py:83-90): two timed micro-batches through
    the SAME checkpoint-as-ledger path run_available_now uses — a file
    present at start and a file landing while the daemon polls are each
    processed exactly once; the caller stops the daemon."""
    import time

    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.csv",
           "user_id,track_id,listen_time\nu1,t1,2024-01-01T10:00:00\n", 1000)

    seen: list[tuple[int, str]] = []

    def process(df, epoch_id):
        for r in df.collect():
            seen.append((epoch_id, r["user_id"]))

    ckpt = str(tmp_path / "ckpt")
    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    q = filestream.run_continuous(stream, process, ckpt,
                                  processing_time="1 seconds")
    try:
        # per-PHASE deadlines, sized for a contended box: under a full
        # parallel pytest run the 1 s-trigger daemon's micro-batches can
        # starve for tens of seconds, and a shared 60 s budget flaked
        # (each phase passes in seconds on an idle box)
        deadline = time.time() + 180
        while not any(u == "u1" for _, u in seen) and time.time() < deadline:
            time.sleep(0.2)
        # second batch: a file lands while the daemon is polling
        _write(str(src), "b.csv",
               "user_id,track_id,listen_time\nu2,t2,2024-01-02T10:00:00\n",
               2000)
        deadline = time.time() + 180
        while not any(u == "u2" for _, u in seen) and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(60)
    users = [u for _, u in seen]
    assert sorted(users) == ["u1", "u2"]          # each exactly once
    assert len({e for e, _ in seen}) == 2         # two distinct micro-batches
    # the daemon's checkpoint IS the ledger: a drain restart over the same
    # source reprocesses nothing
    counts = []
    stream = filestream.csv_file_stream(spark, str(src), STREAMS)
    filestream.run_available_now(stream, lambda df, e: counts.append(df.count()),
                                 ckpt).awaitTermination(120)
    assert sum(counts) == 0


def test_stateful_closed_sessions_late_drop_is_observable(spark, tmp_path):
    """Round-5 ADVICE: an event arriving in a LATER batch with a timestamp
    strictly before the user's stored tail is dropped by contract — the
    drop must now be visible via the late_counter accumulator, and the
    in-order results must be unchanged by the disorder."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import stateful

    src = tmp_path / "in"
    src.mkdir()
    # batch 1: u1 session reaching 10:10
    _write(str(src), "a.csv",
           "user_id,ts\nu1,2024-01-01T10:00:00\nu1,2024-01-01T10:10:00\n",
           1000)
    # batch 2: one LATE event (09:00 < stored tail 10:10) that must be
    # dropped + counted, and one in-order event that closes session 0
    _write(str(src), "b.csv",
           "user_id,ts\nu1,2024-01-01T09:00:00\nu1,2024-01-01T20:00:00\n",
           2000)

    dropped = spark.sparkContext.accumulator(0)
    stream = (spark.readStream.schema("user_id string, ts timestamp")
              .option("header", True).option("maxFilesPerTrigger", 1)
              .option("latestFirst", False).csv(str(src)))
    q = (stateful.closed_sessions(stream, gap_seconds=3600,
                                  late_counter=dropped)
         .writeStream.format("memory").queryName("closed_late")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM closed_late").collect()
    # the disordered event neither rewound the tail nor merged sessions
    assert len(rows) == 1
    assert (rows[0]["user_id"], rows[0]["session_idx"],
            rows[0]["n_events"], rows[0]["duration_secs"]) == ("u1", 0, 2, 600)
    # ... and the drop is observable, not silent
    assert dropped.value == 1
