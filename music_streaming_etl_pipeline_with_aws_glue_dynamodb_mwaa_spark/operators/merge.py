"""Keyed merge / upsert (MERGE INTO semantics, SCD-1 latest-wins) — the
batch-incremental ingestion primitive the reference approximates with
DynamoDB ``put_item`` overwrites (``REF/glue_jobs/load_dynamo.py:83-117``)
and the KV sink already implements row-at-a-time
(``plans/kv_datasource.py``). This operator is the LAKE-side equivalent: a
declarative union+window plan that produces the post-merge table, for sinks
that are plain parquet rather than a KV store.

Spark-first shape: tag each side with a source priority, ``unionByName``
(zero shuffle — union is a plan concatenation), then ONE hash exchange on
the merge keys with a rank-1 window (WindowGroupLimit pushes the rank
filter below the sort buffer). No join: a join-based merge shuffles both
sides AND rebuilds rows; the union+window shape shuffles each row once and
keeps whole rows intact.

Scale posture (100 TB): cost is one shuffle of base+updates. When the base
is partitioned by a date-like column, prune it first (join the updates'
distinct partition values, as ``plans/pipeline.py``'s cumulative mode does)
so the exchange carries only affected partitions, not the whole lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str], *,
                 order_col: str | None = None) -> DataFrame:
    """Post-merge table: every key from either side exactly once, with the
    UPDATES row winning on key collision (insert-or-replace).

    ``order_col`` resolves duplicates WITHIN the updates side (highest
    wins — e.g. an event-time column for out-of-order upsert batches);
    without it each side is assumed key-unique, matching MERGE INTO's
    "source must not match multiple targets" contract.
    """
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    ordering = [F.col("_src").desc()]
    if order_col is not None:
        ordering.append(F.col(order_col).desc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (b.unionByName(u)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src"))


def merge_changelog(base: DataFrame, updates: DataFrame,
                    keys: list[str]) -> DataFrame:
    """Classify the merge outcome per key: ``insert`` (update-only key),
    ``update`` (both sides), ``keep`` (base-only) — the audit frame a
    pipeline writes next to the merged output. Same single-exchange
    union+window shape, aggregated to one row per key."""
    b = base.select(*keys).withColumn("_src", F.lit(0))
    u = updates.select(*keys).withColumn("_src", F.lit(1))
    return (b.unionByName(u)
            .groupBy(*keys)
            .agg(F.min("_src").alias("_mn"), F.max("_src").alias("_mx"))
            .select(*keys,
                    F.when(F.col("_mn") == 1, F.lit("insert"))
                     .when(F.col("_mx") == 0, F.lit("keep"))
                     .otherwise(F.lit("update")).alias("action"))
            .drop("_mn", "_mx"))
