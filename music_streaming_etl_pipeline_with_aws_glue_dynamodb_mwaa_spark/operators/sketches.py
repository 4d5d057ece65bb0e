"""Mergeable sketch columns (DataSketches HLL, built into Spark ≥3.5) —
the pre-aggregation pattern that makes 100 TB distinct-count rollups
cheap: store a BINARY sketch per (fine-grained group), merge sketches to
any coarser grain later WITHOUT touching raw rows again.

Exact distinct counts don't re-aggregate (distinct-of-union ≠ sum of
distincts), so a lake of daily exact counts can never answer "monthly
uniques". A lake of daily SKETCHES can: ``hll_union_agg`` is associative
and preserves the error envelope (merging never degrades the bound below
the target lgK), so the monthly roll-up costs |days×groups| sketch merges —
no fact scan, no giant shuffle. Estimate error is the standard HLL ±~1.6%
at lgK=12 (tunable), self-tested in tests/test_sketches.py against exact
distinct counts. Note the merged estimate is not guaranteed BIT-identical
to a direct sketch of the union — the union gadget can take a different
sparse→dense representation path — but both sit inside the same bound.

All JVM expressions (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`); engine-deterministic for fixed input (the sketch
is hash-based, no randomness) but not oracle-portable (DuckDB's HLL is a
different implementation), so queries register rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(df: DataFrame, keys: list[str], value_col: str, *,
                      lg_k: int = 12,
                      sketch_col: str = "sketch") -> DataFrame:
    """One HLL sketch per key group over ``value_col`` — the storable,
    mergeable form of count-distinct. One hash agg (map-side partials
    merge sketches, not rows)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col))


def merge_sketches(df: DataFrame, keys: list[str], *,
                   sketch_col: str = "sketch",
                   estimate_col: str | None = None) -> DataFrame:
    """Roll sketches up to a coarser grain (drop some key columns, merge
    the rest). ``estimate_col`` additionally materializes the distinct
    estimate as a long."""
    out = df.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col))
    if estimate_col:
        out = out.withColumn(estimate_col,
                             F.hll_sketch_estimate(F.col(sketch_col)))
    return out


def estimate(df: DataFrame, *, sketch_col: str = "sketch",
             estimate_col: str = "n_distinct_est") -> DataFrame:
    """Attach the HLL cardinality estimate for each sketch row."""
    return df.withColumn(estimate_col,
                         F.hll_sketch_estimate(F.col(sketch_col)))


# --------------------------------------------------------------------------
# Count-min sketch AS A TABLE — (depth, width) bucket counts built with the
# engine-portable md5 bucket hash (operators/sampling.py idiom), so unlike
# the binary HLL blobs these ARE oracle-comparable integers. Mergeable by
# construction: CMS(A ∪ B) = cellwise CMS(A) + CMS(B) (one groupBy-sum),
# the same no-rescan rollup property as the HLL columns above. Point
# estimate = min over the d probed cells — the classic ≥-truth bound.
# --------------------------------------------------------------------------

def _cms_bucket(key, row: int, width: int):
    """Portable bucket: first 8 md5 hex digits of 'key:row' mod width —
    DuckDB mirror: ``('0x' || substr(md5(k || ':' || row), 1, 8))::BIGINT
    % width``."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(k.cast("string"), F.lit(f":{row}")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(width))


def cms_table(df: DataFrame, key_col: str, *, depth: int = 4,
              width: int = 256, weight_col: str | None = None) -> DataFrame:
    """Build the count-min sketch of ``key_col`` (optionally weighted) as
    a (row, bucket, n) table — depth×width rows, exact longs.

    One pass: each input row contributes to ``depth`` cells via a
    per-row-seeded md5 bucket (the stacked projection is a map-side
    explode of d structs); the groupBy collapses map-side, so the
    exchange carries ≤ depth·width partials per task regardless of input
    size — the whole point of a CMS at 100 TB.
    """
    w = F.lit(1).cast("long") if weight_col is None \
        else F.col(weight_col).cast("long")
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cms_bucket(key_col, r, width).alias("bucket"))
        for r in range(depth)])
    return (df.select(F.explode(cells).alias("_c"), w.alias("_w"))
            .groupBy(F.col("_c.row").alias("row"),
                     F.col("_c.bucket").alias("bucket"))
            .agg(F.sum("_w").alias("n")))


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge CMS tables built with the SAME (depth, width): cellwise sum."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionAll(t)
    return out.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(cms: DataFrame, probes: DataFrame, key_col: str, *,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: probe the d
    cells, take the min — estimate ≥ true count always, ≤ true + εN with
    the usual (depth, width) guarantees. The CMS is depth·width rows →
    broadcast to the probe side; one join, no shuffle of the probes."""
    probed = probes.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_bucket(key_col, r, width).alias("bucket"))
            for r in range(depth)])).alias("_c"))
    joined = (probed
              .join(F.broadcast(cms),
                    (F.col("_c.row") == cms["row"])
                    & (F.col("_c.bucket") == cms["bucket"]), "left")
              .select(key_col, F.coalesce(F.col("n"), F.lit(0)).alias("_n")))
    return joined.groupBy(key_col).agg(F.min("_n").alias("est_count"))


# --------------------------------------------------------------------------
# Bloom filter AS A TABLE — (word_idx, bits) rows of 63-bit words built
# with the same portable md5 bucket hash as the CMS, so the filter AND its
# membership verdicts are oracle-exact integers (63-bit words because
# DuckDB range-checks 1<<63; Spark's shiftleft would wrap silently — the
# 0..62 shift range is portable). This is the classic 100 TB pre-join
# prune: ship a KB-scale filter to the probe side and drop the bulk of a
# fact scan BEFORE the shuffle a semi-join would need; false positives
# (never negatives) are re-checked by the exact join that follows.
# Mergeable by construction: bloom(A ∪ B) = wordwise OR.
# --------------------------------------------------------------------------

_BLOOM_WORD = 63


def _bloom_pos(key, i: int, m_bits: int):
    """Portable bit position for hash function ``i``: first 8 md5 hex
    digits of 'i:key' mod m_bits — DuckDB mirror:
    ``('0x' || substr(md5(i || ':' || k), 1, 8))::BIGINT % m_bits``."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{i}:"), k.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(m_bits))


def bloom_build(df: DataFrame, key_col: str, *, m_bits: int = 1008,
                k: int = 4) -> DataFrame:
    """(word_idx, bits): the m_bits-wide Bloom filter over ``key_col`` as
    ≤ m_bits/63 rows of OR-folded 63-bit words. One explode (k rows per
    key) + one m/63-row hash agg — map-side combined, the exchange
    carries at most m/63 rows per task regardless of input size."""
    if m_bits % _BLOOM_WORD:
        raise ValueError(f"m_bits must be a multiple of {_BLOOM_WORD}")
    pos = F.explode(F.array(*[
        _bloom_pos(key_col, i, m_bits) for i in range(k)])).alias("_pos")
    return (df.select(pos)
            .select(F.expr(f"_pos div {_BLOOM_WORD}")
                    .alias("word_idx"),
                    F.expr(f"shiftleft(1L, CAST(_pos % {_BLOOM_WORD} "
                           f"AS INT))").alias("_m"))
            .groupBy("word_idx")
            .agg(F.bit_or("_m").alias("bits")))


def bloom_probe(candidates: DataFrame, bloom: DataFrame, key_col: str, *,
                m_bits: int = 1008, k: int = 4) -> DataFrame:
    """``candidates`` + ``in_bloom`` (true ⇒ maybe present — no false
    negatives by construction). The filter is ≤ m_bits/63 rows →
    broadcast; each candidate explodes to its k (word, mask) probes, one
    broadcast join, all-bits-set roll-up. The candidate side never
    shuffles — the exact shape that lets a 100 TB fact scan drop
    non-matching rows before any exchange."""
    probes = candidates.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.array(*[
            _bloom_pos(key_col, i, m_bits) for i in range(k)]))
        .alias("_pos"))
    probes = probes.select(
        key_col,
        F.expr(f"_pos div {_BLOOM_WORD}").alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST(_pos % {_BLOOM_WORD} AS INT))")
        .alias("_m"))
    joined = (probes.join(F.broadcast(bloom), "word_idx", "left")
              .select(key_col,
                      ((F.coalesce(F.col("bits"), F.lit(0))
                        .bitwiseAND(F.col("_m"))) != 0).alias("_hit")))
    return (joined.groupBy(key_col)
            .agg(F.min("_hit").alias("in_bloom")))
