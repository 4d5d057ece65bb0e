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
follow).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_numbers(df: DataFrame, order_cols: list[str], *,
                       out_col: str = "row_num",
                       start: int = 0,
                       num_partitions: int | None = None) -> DataFrame:
    """Append ``out_col``: dense ``start..start+N-1`` following the total
    order of ``order_cols`` (ascending)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The counts job and the labeling job MUST see the same partitioning;
    # repartitionByRange samples its boundaries per execution, so two
    # separate actions would range-partition differently and corrupt the
    # offsets — materialize the partitioned+sorted frame exactly once.
    d = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
           .sortWithinPartitions(*order_cols)
           .withColumn("_pid", F.spark_partition_id())
           .localCheckpoint())

    counts = {r["_pid"]: r["cnt"] for r in
              d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
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


def global_cumsum(df: DataFrame, order_cols: list[str], value_col: str, *,
                  out_col: str = "cumsum",
                  num_partitions: int | None = None) -> DataFrame:
    """Append ``out_col``: the INCLUSIVE running total of ``value_col``
    following the total order of ``order_cols`` — the same two-phase trick
    as :func:`global_row_numbers` (``sum() OVER (ORDER BY …)`` with no
    partition key would collapse to one task):

    range-partition + sort once, sum each partition (k numbers to the
    driver), prefix-sum those into per-partition offsets, then each
    partition folds its own rows locally. Requires a total order and an
    integer value column (the driver-side prefix and the partition-local
    fold must both be exact — doubles would make the result depend on the
    partition count).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
           .sortWithinPartitions(*order_cols)
           .withColumn("_pid", F.spark_partition_id())
           .localCheckpoint())

    sums = {r["_pid"]: r["s"] for r in
            d.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0

    schema = d.drop("_pid").schema.add(out_col, "long", False)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iat[0])]
            out = pdf.drop(columns=["_pid"])
            local = pdf[value_col].astype("int64").cumsum()
            out[out_col] = base + running + local
            running += int(pdf[value_col].astype("int64").sum())
            yield out

    return d.mapInPandas(fold, schema)
