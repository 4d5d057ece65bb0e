"""Slowly-changing-dimension Type 2: changelog → versioned history, and
the point-in-time (temporal) lookup that consumes it.

The lakehouse pattern the reference's KV upserts approximate destructively:
``REF/glue_jobs/load_dynamo.py`` overwrites each key's item per run, so
yesterday's dimension state is gone. SCD2 keeps every version as a
``[valid_from, valid_to)`` interval instead — feature-snapshot joins
("which state was active when this fact happened") then become exact and
reproducible, which is what a training pipeline needs to avoid label
leakage from future dimension states.

Spark-first shape:

- ``scd2_build``: ONE hash exchange on the key; change-compression and
  interval derivation are two window passes over that same exchange
  (Catalyst plans a single Exchange — asserted in tests/test_plans.py).
- ``scd2_lookup``: an equi-join on the key carries the shuffle; the
  interval predicate rides along as a join residual, so there is never a
  range-only (broadcast-nested-loop) join. Per-key version chains are
  short by construction (one row per CHANGE, not per event), so the
  residual filter touches few rows per key.

At 100 TB: both operators shuffle once on the dimension key. A hot key is
a hot key — the usual toolbox (AQE skew split, operators/skew.py salting
for the build's window) applies unchanged.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = None   # valid_to of the current version


def scd2_build(changelog: DataFrame, keys: list[str], ts_col: str,
               attr_cols: list[str], *, tie_break: list[str] | None = None,
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               current_col: str = "is_current") -> DataFrame:
    """Compress a changelog (one row per observed state, possibly repeating
    the same state) into SCD2 version intervals.

    Output: one row per (key, state RUN): the tracked ``attr_cols`` plus
    ``valid_from`` (first ts the state was observed), ``valid_to`` (ts of
    the NEXT state's first observation — half-open ``[from, to)``), and
    ``is_current`` (open interval). Consecutive rows with null-safe-equal
    attrs collapse into one version; a later RETURN to an earlier state
    opens a fresh version (run-length, not distinct-state, semantics —
    the standard SCD2 reading of a changelog).

    ``tie_break`` orders rows within equal (key, ts) deterministically
    (default: the attrs themselves) — feed a unique event id when you have
    one. NULL attrs are legal states; the null-safe comparison keeps
    NULL→NULL from opening a spurious version.
    """
    order = [F.col(ts_col).asc()] + \
        [F.col(c).asc_nulls_first() for c in (tie_break or attr_cols)]
    w = Window.partitionBy(*keys).orderBy(*order)
    same_as_prev = functools.reduce(
        operator.and_,
        [F.lag(F.col(c)).over(w).eqNullSafe(F.col(c)) for c in attr_cols])
    changes = (changelog
               .withColumn("_rn", F.row_number().over(w))
               .withColumn("_same", same_as_prev)
               .filter((F.col("_rn") == 1) | ~F.col("_same"))
               .drop("_rn", "_same"))
    # same partitioning ⇒ no second Exchange; only a re-sort of the
    # (now much smaller) change rows.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (changes
            .select(*keys, *attr_cols,
                    F.col(ts_col).alias(valid_from),
                    F.lead(F.col(ts_col)).over(w2).alias(valid_to))
            .withColumn(current_col, F.col(valid_to).isNull()))


def scd2_lookup(facts: DataFrame, history: DataFrame, keys: list[str],
                fact_ts: str, *, valid_from: str = "valid_from",
                valid_to: str = "valid_to",
                attr_cols: list[str] | None = None,
                prefix: str = "dim_", how: str = "left") -> DataFrame:
    """Join each fact to the dimension version active at its timestamp:
    the history row with ``valid_from <= fact_ts < valid_to`` (open
    ``valid_to`` matches everything from ``valid_from`` on). Facts before
    a key's first version (or with no key match) survive with NULLs under
    ``how="left"``.

    The half-open intervals partition the timeline per key, so at most ONE
    history row matches any fact — the join cannot fan out. Attr columns
    arrive prefixed (``prefix``) to keep fact columns collision-free.
    """
    if attr_cols is None:
        attr_cols = [c for c in history.columns
                     if c not in set(keys) | {valid_from, valid_to}]
    h = history.select(
        *[F.col(k).alias(f"_hk_{k}") for k in keys],
        F.col(valid_from).alias("_vf"),
        F.col(valid_to).alias("_vt"),
        *[F.col(c).alias(f"{prefix}{c}") for c in attr_cols])
    key_eq = [facts[k] == h[f"_hk_{k}"] for k in keys]
    in_range = (h["_vf"] <= facts[fact_ts]) & \
               (h["_vt"].isNull() | (facts[fact_ts] < h["_vt"]))
    cond: Column = functools.reduce(operator.and_, key_eq, in_range)
    return (facts.join(h, cond, how)
            .drop(*[f"_hk_{k}" for k in keys], "_vf", "_vt"))
