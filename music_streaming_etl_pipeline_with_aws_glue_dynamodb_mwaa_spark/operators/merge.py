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


def table_diff(left: DataFrame, right: DataFrame, keys: list[str], *,
               compare_cols: list[str] | None = None) -> DataFrame:
    """Keyed two-table diff: one row per key present in either side, with
    ``action`` ∈ {``only_left``, ``only_right``, ``changed``,
    ``unchanged``} — the regression-test primitive for pipeline outputs
    (yesterday's table vs today's) and the value-aware complement of
    :func:`merge_changelog`.

    Each side reduces to (keys, md5-of-values) BEFORE the full-outer join,
    so the exchange carries a 32-char digest instead of full rows. Value
    columns are stringified with an explicit NULL sentinel and a unit
    separator so (NULL, "x") never collides with ("x", NULL) and "a","bc"
    never collides with "ab","c".

    Portability note: stringification of DOUBLE columns is engine-specific
    (scientific-notation thresholds differ) — pass integer/string/date
    columns in ``compare_cols`` when the diff must be oracle-reproducible
    (convert money to exact cents first, as the registered query does).
    """
    cols = compare_cols or [c for c in left.columns if c not in keys]

    def digest(df: DataFrame, name: str) -> DataFrame:
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                 for c in cols]
        return df.select(*keys, F.md5(F.concat_ws("\x1f", *parts)).alias(name))

    l = digest(left, "_hl")
    r = digest(right, "_hr")
    joined = l.join(r, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_hr").isNull(), F.lit("only_left"))
         .when(F.col("_hl").isNull(), F.lit("only_right"))
         .when(F.col("_hl") == F.col("_hr"), F.lit("unchanged"))
         .otherwise(F.lit("changed")).alias("action"))


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def merge_aggregates(parts: list[DataFrame], keys: list[str],
                     merge_spec: dict[str, str]) -> DataFrame:
    """Incremental-aggregation maintenance: combine already-aggregated
    partials (yesterday's agg table + today's delta agg — any number of
    parts) into the aggregate of the union, WITHOUT rescanning the raw
    fact. ``merge_spec`` maps aggregate column → merge fn (``sum`` for
    counts and sums, ``min``/``max`` for extrema). Averages/ratios are NOT
    re-aggregable — store (count, sum) partials and derive the ratio after
    the merge (the same re-aggregability algebra as skew.salted_agg).

    One union (no shuffle) + one hash agg over rows whose count is the sum
    of the PARTS' group counts — per-refresh cost is bounded by touched
    groups, never fact size; this is the 100 TB daily-refresh shape
    (plans/pipeline.py's ``cumulative`` mode re-reads affected partitions
    instead; this operator is the pure-partial variant for when the raw
    rows are gone or cold).
    """
    unknown = set(merge_spec.values()) - set(_MERGE_FNS)
    if unknown:
        raise ValueError(f"not re-aggregable: {sorted(unknown)}")
    if not parts:
        raise ValueError("merge_aggregates needs at least one part")
    cols = keys + sorted(merge_spec)
    out = parts[0].select(*cols)
    for p in parts[1:]:
        out = out.unionByName(p.select(*cols))
    return out.groupBy(*keys).agg(
        *[_MERGE_FNS[fn](c).alias(c) for c, fn in sorted(merge_spec.items())])


def incremental_join_refresh(materialized: DataFrame, delta_left: DataFrame,
                             right: DataFrame, on: str | list[str], *,
                             how: str = "inner") -> DataFrame:
    """Incremental maintenance of a stored JOIN view under an insert-only
    left delta: ``(A ∪ ΔA) ⋈ B  =  M ∪ (ΔA ⋈ B)`` — only the delta joins,
    the materialized result streams through untouched (delta-join IVM, the
    insert-only case of classic view-maintenance algebra; updates/deletes
    compose this with ``apply_changelog``'s rank-1 upsert on the view key).

    Column contract: ``materialized`` must carry exactly the join's output
    columns (it IS a prior output of this join). Refresh cost is
    |ΔA| ⋈ B + |M| pass-through — never a rescan of A; with B broadcast
    (dims) or bucketed (facts), the refresh plan has ZERO shuffles over
    historical data.
    """
    fresh = delta_left.join(right, on, how)
    return materialized.unionByName(fresh.select(*materialized.columns))
