"""Structured Streaming file-source ingest (SURVEY.md §2.1 S6, §2.9).

The reference's "streaming" is file-granular micro-batching: an S3KeySensor
polls every 60 s (``REF/dags/music_etl_pipeline.py:83-90``), the oldest
unprocessed CSV is picked (:18-25), a DynamoDB ledger provides
exactly-once (:34-56), and processed files are archived (:58-63).

Spark-native equivalent — the file source subsumes all four mechanisms:

- discovery/poll  → ``readStream`` file source (``processingTime`` trigger);
  for drain-the-backlog batch runs, ``Trigger.AvailableNow``
- oldest-first, one file per run → ``maxFilesPerTrigger=1`` + ``latestFirst=false``
- ledger          → the checkpoint's file-source offset log (exactly-once
  across restarts without an external table)
- archive         → ``cleanSource=archive`` + ``sourceArchiveDir``

Each micro-batch is handed to a caller-provided ``process_batch(df, epoch)``
via ``foreachBatch`` — the batch operators (validate/transform/KV load) run
unchanged on streaming input.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def csv_file_stream(spark: SparkSession, src_dir: str, schema: T.StructType, *,
                    max_files_per_trigger: int = 1,
                    archive_dir: str | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", False)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir)
    return reader.csv(src_dir)


def run_available_now(stream_df: DataFrame,
                      process_batch: Callable[[DataFrame, int], None],
                      checkpoint_dir: str) -> StreamingQuery:
    """Drain everything currently in the source, micro-batch by micro-batch,
    then stop — the streaming analogue of the reference's sensor-driven DAG
    runs, with the checkpoint as the ledger."""
    return (
        stream_df.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_continuous(stream_df: DataFrame,
                   process_batch: Callable[[DataFrame, int], None],
                   checkpoint_dir: str, *,
                   processing_time: str = "60 seconds") -> StreamingQuery:
    """Run the pipeline as a DAEMON: poll the source on a fixed cadence
    forever, exactly the reference's always-on S3KeySensor loop
    (``REF/dags/music_etl_pipeline.py:83-90`` — 60 s ``poke_interval``,
    no terminal state). Same checkpoint-as-ledger exactly-once path as
    ``run_available_now``; the only difference is the trigger — the caller
    owns the query handle and decides when (if ever) to ``stop()``.

    ``processing_time`` takes Spark's duration syntax ("60 seconds",
    "5 minutes"); batches that find no new file are no-ops, matching the
    sensor's idle pokes."""
    return (
        stream_df.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_time)
        .start()
    )
