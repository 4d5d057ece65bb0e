"""Skew-mitigation operators (SURVEY.md §7 Phase 4; the 'salting for skew'
knob from the 100 TB design brief).

AQE's skew-join splitting (on in the session factory) covers joins; these
cover skewed AGGREGATION keys, where one hot group (one genre, one date)
lands on one reducer:

- ``salted_agg``      two-phase re-aggregable aggregation: partial agg on
                      (keys, salt) spreads a hot key over ``buckets``
                      reducers, final agg merges partials. Exact for
                      count/sum/min/max (commutative monoids) by algebra —
                      salt values never affect the result, only placement.
- ``two_phase_count_distinct``  exact distinct-count without the
                      distinct-expand double shuffle on hot keys: shuffle on
                      (keys, value) — cardinality spreads hot groups
                      naturally — then count per key.

The reference has no skew handling (its one Spark job inherits Glue
defaults, ``REF/glue_jobs/transform.py:8-10``); these are the operators its
group-bys (transform.py:26-48) need at fact scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"count": lambda c: F.count(c), "sum": lambda c: F.sum(c),
            "min": lambda c: F.min(c), "max": lambda c: F.max(c)}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str | Column]], *,
               buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (fn, column) with fn ∈ {count, sum, min,
    max}. ``count`` counts non-null values of the column (use a literal for
    count(*) semantics: ``("count", F.lit(1))``).

    Phase 1 groups by (keys, random salt ∈ [0, buckets)) — the hot key's
    rows split across ``buckets`` reducers; phase 2 merges partials grouped
    by keys alone, touching ``buckets`` rows per key instead of the raw
    group. Both shuffles are hash exchanges; no row ever routes through a
    single reducer because of key heat.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGE)
    if unknown:
        raise ValueError(f"not re-aggregable under salting: {sorted(unknown)}")
    salt = F.floor(F.rand(seed=42) * buckets).cast("int")
    partials = [
        _PARTIAL[fn](c if isinstance(c, Column) else F.col(c)).alias(f"_p_{out}")
        for out, (fn, c) in aggs.items()
    ]
    finals = [
        _MERGE[fn](F.col(f"_p_{out}")).alias(out)
        for out, (fn, _) in aggs.items()
    ]
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt").agg(*partials)
        .groupBy(*keys).agg(*finals)
    )


def two_phase_count_distinct(df: DataFrame, keys: list[str], value_col: str,
                             *, out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key distinct count, skew-robust.

    ``countDistinct`` plans an expand + two shuffles keyed by the group —
    a hot group serializes on one reducer. Shuffling on (keys, value)
    instead spreads a hot KEY across as many reducers as it has distinct
    VALUES; the second shuffle only carries deduplicated rows.

    Exact ``count(DISTINCT value_col)`` semantics for nullable values: the
    second phase counts the VALUE column (``count(col)`` skips NULLs), not
    ``count(*)`` — so a NULL never counts as a distinct value, while groups
    whose values are all NULL still surface with a 0 (filtering NULL rows
    out up front would drop those groups entirely).
    """
    return (
        df.select(*keys, value_col).distinct()
        .groupBy(*keys).agg(F.count(F.col(value_col)).alias(out_col))
    )


def salted_join(left: DataFrame, right: DataFrame, on: list[str], *,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Exact equi-join with hot LEFT-side keys spread over ``buckets``
    reducers — for large⋈medium joins where the medium side is too big to
    broadcast and one join key is hot enough to serialize a reducer.

    Left rows get a salt in [0, buckets) (``rand`` — placement-only, the
    result is salt-independent by construction); the right side is
    replicated once per salt value, so every (left row, right row) key
    match meets in exactly one salted partition: multiplicities — and
    therefore the join result — are identical to the unsalted join, while
    a hot key's rows now land on ``buckets`` reducers instead of one.

    Cost: right shuffle volume × ``buckets`` — worth it only when the left
    side dwarfs the right and AQE's skew splitting (which handles the
    SORT-side skew of a sort-merge join automatically) isn't available,
    e.g. when the skew is in the build of a shuffled hash join. ``how``
    supports the left-preserving family (inner/left/left_semi/left_anti);
    right/full-outer would need the DUAL salting (right rows salted, left
    replicated) — compose the mirror by swapping arguments.
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(f"salted_join supports left-preserving joins, not {how}")
    salt = F.floor(F.rand(seed=42) * buckets).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = l.join(r, on + ["_salt"], how)
    return out.drop("_salt")
