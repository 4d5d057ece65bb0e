"""The end-to-end batch pipeline driver (SURVEY.md §3.1).

One synchronous, in-process run of the reference's DAG
(``REF/dags/music_etl_pipeline.py:142-145``):

    discover oldest unprocessed stream file      (:18-25, S6/O3)
    → ledger gate (skip if seen)                 (:34-45)
    → validate: split good/quarantine, persist   (validate.py, F4/S7/S9)
    → transform: KPIs + top-k, partitioned write (transform.py:13-55)
    → KV load: three DynamoDB-shaped tables      (load_dynamo.py:157-173)
    → mark processed + archive                   (:47-63)

Deliberate divergences from the reference (SURVEY.md §7 risk 4):
- stages run synchronously — the reference's ``trigger_glue_job`` is
  fire-and-forget (never polls GetJobRun), so its downstream stages can race
  upstream ones (``music_etl_pipeline.py:27-32``);
- transform output is partitioned by ``listen_date`` as documented
  (README.md:193) — the reference writes unpartitioned parquet that its own
  loader cannot discover (SURVEY.md §1.4);
- the joined frame is persisted across its 3-way fan-out — the reference
  recomputes scan+join per output (``transform.py:53-55``);
- validation and KV load are distributed Spark jobs, not single-process
  pandas/driver loops.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import kpi, kv_projection, topk, validate
from ..schemas import REQUIRED_COLUMNS, SONGS, STREAMS
from ..sources import io
from .kvstore import KVStore, write_dataframe
from .ledger import Ledger

KPI_TABLE = "DailyGenreKPIs"
TOP_SONGS_TABLE = "TopSongsPerGenre"
TOP_GENRES_TABLE = "TopGenresPerDay"


@dataclass
class PipelineConfig:
    base_dir: str                      # root of the data lake layout
    kv_path: str | None = None         # sqlite KV store (default under base)
    top_songs_k: int = 3
    top_genres_k: int = 5
    raw_streams: str = field(init=False)
    raw_songs: str = field(init=False)
    validated_dir: str = field(init=False)
    processed_dir: str = field(init=False)
    archive_dir: str = field(init=False)

    def __post_init__(self) -> None:
        # Mirrors the reference's S3 layout (README.md:15-36).
        self.raw_streams = os.path.join(self.base_dir, "raw", "streams")
        self.raw_songs = os.path.join(self.base_dir, "raw", "songs")
        self.validated_dir = os.path.join(self.base_dir, "validated")
        self.processed_dir = os.path.join(self.base_dir, "processed")
        self.archive_dir = os.path.join(self.base_dir, "archive", "streams")
        if self.kv_path is None:
            self.kv_path = os.path.join(self.base_dir, "kv", "store.db")


class Pipeline:
    def __init__(self, spark: SparkSession, config: PipelineConfig):
        self.spark = spark
        self.cfg = config
        self.store = KVStore(config.kv_path)
        self.ledger = Ledger(self.store)
        for name, (hk, rk) in {
            KPI_TABLE: ("date", "genre"),
            TOP_SONGS_TABLE: ("date", "genre_track"),
            TOP_GENRES_TABLE: ("date", "genre"),
        }.items():
            self.store.ensure_table(name, hash_key=hk, range_key=rk)

    # -- S6/O3: file discovery --------------------------------------------
    def discover_new_files(self) -> list[str]:
        """Oldest-first unarchived stream CSVs (REF/dags/music_etl_pipeline.py:18-25
        sorts by LastModified and takes the first; we return the full queue)."""
        if not os.path.isdir(self.cfg.raw_streams):
            return []
        paths = [
            os.path.join(self.cfg.raw_streams, f)
            for f in os.listdir(self.cfg.raw_streams) if f.endswith(".csv")
        ]
        return sorted(paths, key=lambda p: (os.path.getmtime(p), p))

    # -- stage 1: validate --------------------------------------------------
    def validate_streams(self, path: str) -> DataFrame:
        raw = io.read_csv(self.spark, path, STREAMS)
        good, bad = validate.split_valid_invalid(raw, REQUIRED_COLUMNS["streams"])
        io.write_parquet(good.drop(io.CORRUPT_COL),
                         os.path.join(self.cfg.validated_dir, "streams"),
                         mode="append")
        io.write_quarantine(bad, self.cfg.base_dir, "streams")
        return good.drop(io.CORRUPT_COL)

    # -- stage 2: transform ---------------------------------------------------
    def transform(self, streams: DataFrame, songs: DataFrame) -> dict[str, DataFrame]:
        joined = kpi.join_streams_songs(kpi.with_listen_date(streams), songs)
        joined.persist()  # 3-way fan-out; the reference recomputes it 3×
        try:
            outputs = {
                "avg_metrics": kpi.daily_genre_kpis(joined),
                "top_songs": topk.top_songs_per_genre(joined, self.cfg.top_songs_k),
                "top_genres": topk.top_genres_per_day(joined, self.cfg.top_genres_k),
            }
            for name, df in outputs.items():
                io.write_parquet(df, os.path.join(self.cfg.processed_dir, name),
                                 partition_by=["listen_date"])
        finally:
            joined.unpersist()
        return outputs

    # -- stage 3: KV load ----------------------------------------------------
    def load_kv(self, outputs: dict[str, DataFrame]) -> None:
        write_dataframe(kv_projection.genre_kpi_items(outputs["avg_metrics"]),
                        self.cfg.kv_path, KPI_TABLE)
        write_dataframe(kv_projection.top_song_items(outputs["top_songs"]),
                        self.cfg.kv_path, TOP_SONGS_TABLE)
        write_dataframe(kv_projection.top_genre_items(outputs["top_genres"]),
                        self.cfg.kv_path, TOP_GENRES_TABLE)

    # -- full run -------------------------------------------------------------
    def run_once(self) -> str | None:
        """Process the single oldest unprocessed file (the reference's
        one-file-per-DAG-run granularity); None if nothing to do."""
        for path in self.discover_new_files():
            fname = os.path.basename(path)
            if not self.ledger.try_claim(fname):
                continue
            streams = self.validate_streams(path)
            songs = io.read_csv(self.spark, self.cfg.raw_songs, SONGS,
                                keep_corrupt=False).filter(
                F.col("track_id").isNotNull())
            outputs = self.transform(streams, songs)
            self.load_kv(outputs)
            self.ledger.mark_processed(fname)
            io.archive_files([path], self.cfg.archive_dir)
            return fname
        return None

    def run_all(self) -> list[str]:
        done = []
        while (f := self.run_once()) is not None:
            done.append(f)
        return done
