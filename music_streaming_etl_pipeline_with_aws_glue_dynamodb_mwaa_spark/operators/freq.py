"""Exact distributed heavy hitters via Misra–Gries candidate generation.

"Which values occupy more than 1/k of the table?" at 100 TB cannot be a
plain groupBy when the column is high-cardinality (the agg materializes
every distinct value). The two-phase classic:

1. **Candidates** — each partition runs a Misra–Gries(k) summary in O(k)
   memory (``mapInPandas``, bounded state regardless of partition size or
   cardinality). Pigeonhole/averaging guarantee: if a value's GLOBAL count
   satisfies ``count·k > n`` then in at least one partition its local count
   exceeds ``n_p/k``, and MG(k) never evicts such a value — so the union of
   partition summaries contains every true heavy hitter. (MG's decrement
   step can only subtract ``n_p/k`` total from any one value.)
2. **Exact recount** — the (tiny: ≤ k·partitions) candidate set is
   re-counted exactly with one semi-join + hash agg, and the strict global
   threshold filter keeps exactly ``{v : count(v)·k > n}``.

The output is therefore EXACT and partitioning-independent — phase 1's
candidate set varies with the split, but it always covers the true heavy
hitters, and phase 2's exact counts discard the false positives the same
way every time. That makes the operator oracle-checkable (plain
``HAVING count(*)·k > total`` SQL), unlike estimate-only sketches.

Cost: one scan (phase 1) + one scan with a broadcast-able semi-join
(phase 2) + a candidate-sized agg. No full-cardinality shuffle ever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                if v in counters:
                    counters[v] += int(c)
                elif len(counters) < k:
                    counters[v] = int(c)
                else:
                    # decrement-all by the capped mass; evict zeros.
                    # (batch-MG: subtracting d from every counter where d
                    # makes room preserves the n_p/k error bound exactly
                    # as the one-at-a-time formulation.)
                    d = int(c)
                    m = min(counters.values())
                    step = min(d, m)
                    counters = {u: cc - step for u, cc in counters.items()
                                if cc - step > 0}
                    if d > step and len(counters) < k:
                        counters[v] = d - step
        yield pd.DataFrame({col: list(counters.keys())})
    return run


def heavy_hitters(df: DataFrame, col: str, *, k: int = 100) -> DataFrame:
    """All values of ``col`` with ``count·k > n`` (strictly more than a
    1/k fraction of non-null rows), with their EXACT counts —
    ``(col, count, n_total)`` ordered nowhere (caller sorts).

    ``k`` bounds phase-1 memory (k counters per task) AND sets the
    threshold. NULLs are excluded (a NULL "value" is a data-quality
    question, not a frequency one).
    """
    src = df.select(col).filter(F.col(col).isNotNull())
    field = src.schema[col]
    candidates = (src.mapInPandas(
        _mg_partition(k, col), schema=f"`{col}` {field.dataType.simpleString()}")
        .distinct())
    counted = (src.join(F.broadcast(candidates), col, "left_semi")
               .groupBy(col).agg(F.count(F.lit(1)).alias("count")))
    total = src.agg(F.count(F.lit(1)).alias("n_total"))
    return (counted.crossJoin(F.broadcast(total))
            .filter(F.col("count") * k > F.col("n_total")))


def mode_per_group(df: DataFrame, keys: list[str], val_col: str) -> DataFrame:
    """Exact per-key mode: (keys, ``val_col``'s most frequent value, n) —
    ties broken to the SMALLEST value, so the answer is deterministic
    and oracle-comparable.

    One hash aggregation on (keys, value) then a rank-1 window on the
    same key prefix (the window's partition keys are a subset of the
    agg's grouping keys, so it rides the agg's exchange) — Catalyst
    rewrites the filter to WindowGroupLimit: per-key single-value state,
    never a per-key value list.
    """
    from pyspark.sql import Window
    counts = (df.groupBy(*keys, val_col)
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(*keys).orderBy(F.col("n").desc(),
                                          F.col(val_col).asc())
    return (counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk"))
