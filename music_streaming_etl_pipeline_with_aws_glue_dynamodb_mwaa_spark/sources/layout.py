"""Physical data layout for scan pruning: z-order clustering and
small-file compaction.

Parquet scans prune at two granularities — partition directories, and
row-group/file min-max statistics. A write that's RANDOM in the filter
columns makes every file's [min, max] span the whole domain, so nothing
skips; clustering the write by a space-filling curve makes each file cover
a small hyper-rectangle, so point/range predicates on ANY prefix-free
combination of the curve dimensions touch few files (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea, done with plain DataFrame ops).

Spark-first: the z-value is a pure JVM expression (two scalar aggs for the
per-column domains, then bit interleaving — no UDF, no sort-by-rank
shuffle); the layout itself is one ``repartitionByRange`` (sampled range
boundaries, balanced output files) + in-partition sort, which is exactly
the shuffle a plain sorted write would cost.

Two scalings, pick by distribution: ``zorder_by`` (linear min-max —
cheapest, right for roughly uniform domains) and ``zorder_by_quantile``
(rank-space via approxQuantile boundaries — skew-robust: a heavy-tailed
column no longer wastes z-bits on empty range; each bin holds ~equal row
mass). At 100 TB compute the quantile boundaries once and reuse them
across writes.
"""

from __future__ import annotations

import functools
import math

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column,
                   bits: int) -> Column:
    """Linear map of col into [0, 2^bits) as a long; degenerate domains
    (min == max) map to 0. NULLs map to 0 (sort first — their files are
    prunable by IS NULL anyway)."""
    span = (cmax - cmin).cast("double")
    maxv = F.lit((1 << bits) - 1)
    # the NULL guard must come BEFORE least(): least() SKIPS nulls (both
    # Spark and ANSI SQL), so least(maxv, NULL) is maxv — a NULL value
    # would silently land in the TOP bin instead of bin 0 (round-4 fix)
    scaled = F.when(col.isNotNull() & (span > 0),
                    F.least(maxv, F.floor(
                        (col.cast("double") - cmin.cast("double")) / span
                        * (1 << bits)).cast("long"))
                    ).otherwise(F.lit(0))
    return F.coalesce(scaled, F.lit(0))


def zvalue(scaled: list[Column], bits: int) -> Column:
    """Interleave the bit patterns of pre-scaled [0, 2^bits) longs into one
    Morton (z-curve) key — bit i of dim j lands at position i*k + j. Pure
    shift/mask expression tree: k·bits ops, all inside codegen."""
    k = len(scaled)
    parts = []
    for j, c in enumerate(scaled):
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1)),
                            i * k + j))
    # Column.__or__ is LOGICAL or — bit positions are disjoint, so fold
    # with bitwiseOR explicitly.
    return functools.reduce(lambda a, b: a.bitwiseOR(b), parts).alias("_z")


def zorder_by(df: DataFrame, cols: list[str], *, num_partitions: int,
              bits: int = 12) -> DataFrame:
    """Return ``df`` re-laid-out along the z-curve of ``cols`` (numeric /
    date / timestamp): range-partitioned AND sorted by the interleaved
    key, so a subsequent parquet write yields files whose min-max
    envelopes tile the space. The helper column is dropped — output
    schema == input schema.

    Two scalar aggregates (min/max per column, one job) feed the scaling;
    everything else is the one repartitionByRange shuffle any clustered
    write pays.
    """
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    bounds = df.agg(*[f(c).alias(f"{tag}_{c}") for c in cols
                      for tag, f in (("min", F.min), ("max", F.max))]) \
               .first()
    scaled = [_scale_to_bits(F.col(c),
                             F.lit(bounds[f"min_{c}"]),
                             F.lit(bounds[f"max_{c}"]), bits)
              for c in cols]
    with_z = df.withColumn("_z", zvalue(scaled, bits))
    return (with_z.repartitionByRange(num_partitions, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z"))


def zorder_by_quantile(df: DataFrame, cols: list[str], *,
                       num_partitions: int, bits: int = 8,
                       relative_error: float = 0.01) -> DataFrame:
    """Skew-robust z-order: each column is mapped to its RANK-SPACE bin
    (index into ``2^bits`` approxQuantile boundaries) before interleaving,
    so a heavy-tailed column spreads over all z-bits instead of collapsing
    into the first few. Bin lookup is a broadcast literal-array binary
    search — no UDF, no join; boundaries are one approxQuantile pass
    (GK sketch, mergeable, driver gets 2^bits doubles per column).

    ``pyspark.ml.feature.Bucketizer`` does the lookup — a JVM binary
    search over the broadcast split array, no UDF, no join. NULLs bin to 0
    (sort first, prunable by IS NULL).
    """
    from pyspark.ml.feature import Bucketizer

    if not cols:
        raise ValueError("zorder_by_quantile needs at least one column")
    nbins = 1 << bits
    probs = [i / nbins for i in range(1, nbins)]
    dbl_cols = [f"_q_{c}" for c in cols]
    staged = df.select(
        "*", *[F.col(c).cast("double").alias(d)
               for c, d in zip(cols, dbl_cols)])
    bounds = staged.approxQuantile(dbl_cols, probs, relative_error)
    splits = []
    for bs in bounds:
        # strictly increasing splits (approxQuantile repeats values on
        # discrete data — collapse; fewer bins just means fewer occupied
        # codes, the interleave is indifferent)
        splits.append([float("-inf")] + sorted(set(bs)) + [float("inf")])
    bin_cols = [f"_b_{c}" for c in cols]
    bucketizer = Bucketizer(inputCols=dbl_cols, outputCols=bin_cols,
                            splitsArray=splits, handleInvalid="keep")
    binned = bucketizer.transform(staged.fillna(
        {d: float("-inf") for d in dbl_cols}))
    scaled = [F.least(F.col(b).cast("long"), F.lit(nbins - 1))
              for b in bin_cols]
    with_z = binned.withColumn("_z", zvalue(scaled, bits))
    return (with_z.repartitionByRange(num_partitions, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z", *dbl_cols, *bin_cols))


def write_zordered(df: DataFrame, path: str, cols: list[str], *,
                   num_files: int = 16, bits: int = 12,
                   mode: str = "overwrite") -> None:
    """Z-order ``df`` by ``cols`` and write parquet — one file per range
    partition, each covering a compact hyper-rectangle of the curve
    dimensions (verify with ``clustering_report``)."""
    zorder_by(df, cols, num_partitions=num_files, bits=bits) \
        .write.mode(mode).parquet(path)


def clustering_report(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min-max envelope of ``cols`` for a parquet dir — the stats
    a scan's file/row-group skipping consults. Returns one row per file
    with min_/max_ per column; the fraction of files a point predicate
    must touch ≈ how well the layout clusters. Distributed: reads only
    footers via the input_file_name roll-up."""
    df = spark.read.parquet(path)
    aggs = [f(c).alias(f"{tag}_{c}") for c in cols
            for tag, f in (("min", F.min), ("max", F.max))]
    return (df.withColumn("_file", F.input_file_name())
            .groupBy("_file").agg(*aggs))


def compact_small_files(spark, src: str, dst: str, *,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_within_by: list[str] | None = None) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files (the
    small-file compaction every file-arrival pipeline needs — thousands of
    per-trigger micro-files kill scan planning long before they kill IO).
    Returns the output file count. Sizing uses the SOURCE's on-disk bytes
    (compression-representative); ``sort_within_by`` optionally restores
    clustering while rewriting."""
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(src)
                for f in fs if f.endswith(".parquet"))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    out = df.repartition(n)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst)
    return n
