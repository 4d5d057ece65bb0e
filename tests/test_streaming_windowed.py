"""Watermarked windowed aggregation: batch ≡ streaming equivalence, and
the watermark genuinely dropping late data in append mode."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.streaming import windowed

SF = "/root/testdata/sf0.001"


def test_batch_equals_streaming_complete_mode(spark, tmp_path):
    ev = catalog.load_table(spark, SF, "events")
    batch = {tuple(r) for r in
             windowed.windowed_event_counts(ev).collect()}

    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).option("maxFilesPerTrigger", 1) \
        .parquet(src)
    out = windowed.windowed_event_counts(stream)
    q = (out.writeStream.format("memory").queryName("win_complete")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from win_complete").collect()}
    assert got == batch and len(batch) > 0


def _write_file(spark, path, rows, mtime):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    now = time.time()
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (now + mtime, now + mtime))


def test_watermark_drops_late_rows_append_mode(spark, tmp_path):
    """Guaranteed watermark contract (empirically pinned): the watermark
    used by batch N is computed from batch N-1's max event time, and a
    window's state is emitted+evicted in the first batch whose watermark
    passes its end; rows arriving for an ALREADY-EVICTED window are
    dropped (surfaced via numRowsDroppedByWatermark). A late row landing
    in the SAME batch as the eviction may still be merged — that's
    Spark's documented best-effort boundary, so the sequence below puts
    one watermark-advancing batch between the jump and the late row."""
    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    src = str(tmp_path / "src")
    # f1: window [00:00,06:00) rows; f2 jumps event time to 30:00 (so the
    # NEXT batch runs with watermark 18:00 and finalizes window1); f3
    # advances again (eviction batch); f4 delivers the late row.
    _write_file(spark, f"{src}/f1", [(1, ts(1), 1, "click", 1.0),
                                     (2, ts(2), 1, "click", 1.0)], 10)
    _write_file(spark, f"{src}/f2", [(3, ts(30), 1, "click", 1.0)], 20)
    _write_file(spark, f"{src}/f3", [(5, ts(31), 1, "click", 1.0)], 30)
    _write_file(spark, f"{src}/f4", [(4, ts(3), 1, "click", 9.0)], 40)

    stream = (spark.readStream
              .schema(spark.read.parquet(f"{src}/f1").schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", False)
              .parquet(f"{src}/*"))
    out = windowed.windowed_event_counts(stream)
    q = (out.writeStream.format("memory").queryName("win_append")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r["win_start"], r["n"], r["sum_cents"])
            for r in spark.sql("select * from win_append").collect()}
    # window1 emitted with ONLY the two on-time rows; the late 9.00 row
    # neither re-emits the window nor appears anywhere
    assert rows == {(ts(0), 2, 200)}
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 1


def test_dense_windows_zero_fill_gaps(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 1), 1, "click", 1.0),
            # 06-12 and 12-18 slots empty for click; purchase only in 12-18
            (2, dt.datetime(2024, 1, 1, 19), 1, "click", 2.0),
            (3, dt.datetime(2024, 1, 1, 13), 1, "purchase", 5.0)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    out = {(r["win_start"], r["event_type"]): (r["n"], r["sum_cents"])
           for r in windowed.dense_windowed_counts(ev).collect()}
    t0 = dt.datetime(2024, 1, 1, 0)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    # full grid: 4 slots x 2 types
    assert len(out) == 8
    assert out[(ts(0), "click")] == (1, 100)
    assert out[(ts(6), "click")] == (0, 0)          # zero-filled gap
    assert out[(ts(12), "click")] == (0, 0)
    assert out[(ts(18), "click")] == (1, 200)
    assert out[(ts(12), "purchase")] == (1, 500)
    assert out[(ts(0), "purchase")] == (0, 0)


def test_dense_grid_cell_guard(spark):
    ev = catalog.load_table(spark, SF, "events")
    assert windowed._interval_seconds("6 hours") == 21600
    assert windowed._interval_seconds("1 day 12 hours") == 129600
    assert windowed._interval_seconds("30 minutes") == 1800
    with pytest.raises(ValueError, match="max_cells"):
        windowed.dense_windowed_counts(ev, window="1 second", max_cells=10)
    # permissive cap passes through to a real grid
    out = windowed.dense_windowed_counts(ev, window="6 hours",
                                         max_cells=10_000_000)
    assert out.count() > 0


def test_grid_guard_unknown_and_subsecond_units(spark):
    assert windowed._interval_seconds("500 milliseconds") == 0.5
    assert windowed._interval_seconds("3 fortnights") is None
    assert windowed._interval_seconds("6hour") is None      # malformed
    assert windowed._interval_seconds("0 seconds") is None  # Spark's error
    ev = catalog.load_table(spark, SF, "events")
    # unknown unit → the GUARD must skip (no max_cells ValueError); the
    # failure that surfaces is Spark's own invalid-duration error at
    # window-build/exec time, not ours
    with pytest.raises(Exception) as ei:
        windowed.dense_windowed_counts(ev, window="3 fortnights",
                                       max_cells=10).count()
    assert "max_cells" not in str(ei.value)
    # sub-second KNOWN unit → guard sizes the grid and rejects correctly
    with pytest.raises(ValueError, match="max_cells"):
        windowed.dense_windowed_counts(ev, window="500 milliseconds",
                                       max_cells=10)


def test_session_window_batch_equals_stream_and_sessionizer(spark, tmp_path):
    """Three formulations, one answer: F.session_window in batch mode,
    F.session_window over a file stream (complete mode), and the window-
    function sessionizer from operators/sessions.py."""
    from pyspark.sql import functions as F
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sessions, stats

    ev = catalog.load_table(spark, SF, "events")
    batch_rows = windowed.session_windowed_stats(ev, gap="30 minutes").collect()
    batch = {tuple(r) for r in batch_rows}
    assert batch

    src = str(tmp_path / "sess_src")
    ev.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).option("maxFilesPerTrigger", 1) \
        .parquet(src)
    out = windowed.session_windowed_stats(stream, gap="30 minutes")
    q = (out.writeStream.format("memory").queryName("sess_complete")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r)
           for r in spark.sql("select * from sess_complete").collect()}
    assert got == batch

    # the batch sessionizer agrees on (user, start, n_events) — its
    # sessions end AT the last event; session_window ends gap later
    sess = sessions.sessionize(ev, gap_seconds=1800)
    ops = (sess.groupBy("user_id", "session_id")
           .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n"))
           .collect())
    want = {(r["user_id"], r["start"], r["n"]) for r in ops}
    have = {(r["user_id"], r["session_start"], r["n_events"])
            for r in batch_rows}
    assert have == want
