"""SparkSession factory.

The reference delegates all execution tuning to AWS Glue defaults (see
``REF/glue_jobs/transform.py:8-10`` — bare GlueContext init, no conf). This
engine owns its session config instead: AQE for runtime re-planning and skew
handling, UTC session timezone (so results compare bit-for-bit against the
DuckDB oracle), dynamic partition overwrite (so a late file for one
``listen_date`` rewrites one partition, not the whole output dir — fixing the
whole-dir overwrite at ``REF/glue_jobs/transform.py:53-55``), and Arrow for
any pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "music-streaming-engine", *, cpus: int | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    Local mode here; on a real cluster the same conf applies except master.
    Shuffle partitions default to the core count — at 100 TB on a 1000-executor
    cluster this knob is instead sized so post-shuffle partitions land in the
    100-200 MB range (AQE coalescing makes the initial value forgiving).
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    # TIMESTAMP(NANOS) parquet columns: PySpark 4.x reads them natively as
    # timestamp_ntz; on 3.x the legacy conf reads raw long ns which the
    # catalog converts (dtype-guarded, sources/catalog.py::load_table).
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def enable_runtime_bloom_filters(spark, *,
                                 application_side_min_scan: str = "10GB",
                                 creation_side_max: str = "10MB") -> None:
    """Turn on Spark's runtime bloom-filter join pruning: for a shuffle
    join with a selective filter on one side, the optimizer injects
    ``bloom_filter_agg`` over that side's join keys and pushes
    ``might_contain`` into the OTHER side's scan — rows that cannot match
    are dropped before the shuffle (semi-join reduction without writing
    one).

    Thresholds gate when it pays: the application side must be big enough
    to be worth pre-filtering (``application_side_min_scan``) and the
    creation side small enough that building the filter is cheap
    (``creation_side_max``). Defaults here are production-shaped; tests
    lower the scan threshold to force injection at toy scale
    (tests/test_tpch_suite.py pins the mechanism works on this Spark).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
                   "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", application_side_min_scan)
