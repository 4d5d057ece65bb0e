"""Global contiguous row numbering — example ids for training shards.

``row_number() OVER (ORDER BY …)`` with no partition key collapses the
whole dataset into ONE task — the classic scale killer. And
``monotonically_increasing_id`` is non-contiguous (partition id lives in
the high bits). A training pipeline wants dense 0..N−1 example ids, so
this implements the standard two-phase assignment:

1. range-repartition + in-partition sort on the order key (the same
   shuffle a global sort would do — but it stays parallel);
2. one cheap count-per-partition job (k rows to the driver), prefix-sum
   the offsets, broadcast them back;
3. each partition labels its rows ``offset[pid] + local_index`` via an
   ``mapInPandas`` iterator — O(rows/partition) memory, no second
   shuffle.

Output ids exactly match the single-task window's (oracle-checked), at
partition-parallel cost. Requires a total order (pass a unique
tie-breaker as the last order column — same rule the top-k operators
follow). The same two-phase trick generalizes to running totals
(:func:`global_cumsum` / :func:`global_cumsums`) and to ANSI
``ntile`` bucketing (:func:`global_ntile`) — every "global ordered
scan" the analytics operators need, without a single-task window.

Descending orders: the helpers range-partition on the given columns
ASCENDING (``repartitionByRange`` string API). Callers that need a
DESC component negate the numeric column first (``-weight``) — exact
for the BIGINT measures every caller uses, and it keeps the helper
signature free of SortOrder plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _range_sorted(df: DataFrame, order_cols: list[str],
                  num_partitions: int | None):
    """Range-partition + in-partition sort ONCE, tagged with the physical
    partition id, plus the per-partition row counts and total.

    The counts job and the downstream labeling job MUST see the same
    partitioning; ``repartitionByRange`` samples its boundaries per
    execution, so two separate actions would range-partition differently
    and corrupt the offsets — ``localCheckpoint`` materializes the
    partitioned+sorted frame exactly once. Returns
    ``(d, counts, total)`` where ``d`` carries a ``_pid`` column and
    ``counts`` maps pid → row count (k entries to the driver — bounded
    by the partition count, never by the data).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
           .sortWithinPartitions(*order_cols)
           .withColumn("_pid", F.spark_partition_id())
           .localCheckpoint())
    counts = {r["_pid"]: r["cnt"] for r in
              d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    return d, counts, sum(counts.values())


def global_row_numbers(df: DataFrame, order_cols: list[str], *,
                       out_col: str = "row_num",
                       start: int = 0,
                       num_partitions: int | None = None) -> DataFrame:
    """Append ``out_col``: dense ``start..start+N-1`` following the total
    order of ``order_cols`` (ascending)."""
    d, counts, _ = _range_sorted(df, order_cols, num_partitions)
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = d.drop("_pid").schema.add(out_col, "long", False)

    def label(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iat[0])]
            out = pdf.drop(columns=["_pid"])
            out[out_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield out

    return d.mapInPandas(label, schema)


def global_ntile(df: DataFrame, order_cols: list[str], n_bins: int, *,
                 out_col: str = "bucket",
                 num_partitions: int | None = None) -> DataFrame:
    """Append ``out_col``: the ANSI ``ntile(n_bins) OVER (ORDER BY …)``
    bucket (1-based BIGINT) following the total order of ``order_cols``
    — WITHOUT the single-task global window.

    ANSI ntile semantics, reproduced exactly (Spark and DuckDB agree):
    with N rows and B buckets, q = N//B and r = N%B; the first r
    buckets take q+1 rows, the rest take q — so 0-based row i maps to
    ``i // (q+1) + 1`` while ``i < r·(q+1)`` else
    ``r + (i − r·(q+1)) // q + 1`` (when N < B each of the first N
    buckets gets one row — the same formula with q = 0, r = N).

    Plan: the :func:`_range_sorted` two-phase shuffle (parallel range
    sort + k counts to the driver), then each partition labels its rows
    from its broadcast offset — integer arithmetic only, deterministic
    given a total order (pass a unique tie-breaker), hash-exact against
    the window form's oracle.
    """
    d, counts, n = _range_sorted(df, order_cols, num_partitions)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    q, r = divmod(n, n_bins)
    cut = r * (q + 1)  # first row index of the q-sized buckets

    schema = d.drop("_pid").schema.add(out_col, "long", False)

    def label(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iat[0])]
            out = pdf.drop(columns=["_pid"])
            i = np.arange(base + local, base + local + len(pdf),
                          dtype="int64")
            if q == 0:
                out[out_col] = i + 1
            else:
                out[out_col] = np.where(i < cut, i // (q + 1) + 1,
                                        r + (i - cut) // q + 1)
            local += len(pdf)
            yield out

    return d.mapInPandas(label, schema)


def global_cumsums(df: DataFrame, order_cols: list[str],
                   value_cols: list[str], out_cols: list[str], *,
                   num_partitions: int | None = None) -> DataFrame:
    """Append one INCLUSIVE running total per ``value_cols[i]`` (named
    ``out_cols[i]``), all following the SAME total order of
    ``order_cols`` — the multi-measure form of :func:`global_cumsum`,
    sharing one range shuffle instead of one per measure (a two-sample
    CDF scan needs both cohorts' cumulatives over the merged value
    order; two separate calls would shuffle twice).

    Same contract: total order required, integer value columns (the
    driver-side prefix and the partition-local fold must both be exact —
    doubles would make the result depend on the partition count).
    """
    assert len(value_cols) == len(out_cols)
    d, counts, _ = _range_sorted(df, order_cols, num_partitions)
    sums = {r["_pid"]: [r[f"_s{i}"] for i in range(len(value_cols))]
            for r in d.groupBy("_pid").agg(
                *[F.sum(v).alias(f"_s{i}")
                  for i, v in enumerate(value_cols)]).collect()}
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(value_cols)
    for pid in sorted(sums):
        offsets[pid] = list(acc)
        acc = [a + (s or 0) for a, s in zip(acc, sums[pid])]

    schema = d.drop("_pid").schema
    for c in out_cols:
        schema = schema.add(c, "long", False)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = [0] * len(value_cols)
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iat[0])]
            out = pdf.drop(columns=["_pid"])
            for i, (v, o) in enumerate(zip(value_cols, out_cols)):
                local = pdf[v].astype("int64").cumsum()
                out[o] = base[i] + running[i] + local
                running[i] += int(pdf[v].astype("int64").sum())
            yield out

    return d.mapInPandas(fold, schema)


def global_cumsum(df: DataFrame, order_cols: list[str], value_col: str, *,
                  out_col: str = "cumsum",
                  num_partitions: int | None = None) -> DataFrame:
    """Append ``out_col``: the INCLUSIVE running total of ``value_col``
    following the total order of ``order_cols`` — the same two-phase
    trick as :func:`global_row_numbers` (``sum() OVER (ORDER BY …)``
    with no partition key would collapse to one task): range-partition +
    sort once, sum each partition (k numbers to the driver), prefix-sum
    those into per-partition offsets, then each partition folds its own
    rows locally. Single-measure wrapper over :func:`global_cumsums`.
    """
    return global_cumsums(df, order_cols, [value_col], [out_col],
                          num_partitions=num_partitions)
