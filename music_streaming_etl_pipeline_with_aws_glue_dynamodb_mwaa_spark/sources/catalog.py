"""Testdata catalog: load the driver's synthetic tables and expose them under
their music-domain roles (FIXTURES.md §B role mapping).

- streams fact  ← lineitem  (l_suppkey→user_id, l_partkey→track_id,
                             l_shipdate→listen_time)
- songs dim     ← part      (p_partkey→track_id, p_name→track_name,
                             p_type→track_genre, p_retailprice→duration_ms
                             stand-in)
- users dim     ← customer
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark has no type for:
        # a plain session fails the scan with PARQUET_TYPE_ILLEGAL. Read it as
        # raw long ns (runtime-settable conf, so this works even under a
        # session not built by our factory) and truncate to µs timestamps.
        # Integer `div` — double division loses precision at ~1.7e18 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def streams_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """Project lineitem into the reference's streams shape (user_id,
    track_id, listen_time) — the fact side of the flagship join."""
    return lineitem.select(
        F.col("l_suppkey").alias("user_id"),
        F.col("l_partkey").alias("track_id"),
        F.col("l_shipdate").alias("listen_time"),
    )


def songs_from_part(part: DataFrame) -> DataFrame:
    """Project part into the reference's songs shape — the small dim side
    (REF/glue_jobs/transform.py:20 keeps exactly these four columns).

    ``duration_ms`` is a LONG in the music domain (SURVEY.md §1.2); the
    p_retailprice stand-in is converted to exact integer cents so aggregate
    sums are associative-exact (parallel partial aggregation order can't
    perturb them) and derived ratios are a single IEEE division —
    reproducible bit-for-bit against any engine.
    """
    return part.select(
        F.col("p_partkey").alias("track_id"),
        F.col("p_name").alias("track_name"),
        F.col("p_type").alias("track_genre"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("duration_ms"),
    )
