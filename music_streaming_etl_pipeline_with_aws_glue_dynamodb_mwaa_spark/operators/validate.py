"""Validation / quarantine operator (SURVEY.md §2.2 F4/F5, §2.1 S9).

The reference validates each raw CSV in a single pandas process
(``REF/glue_jobs/validate.py``): assert required columns exist (:35-38), then
split rows — any null among required columns → quarantine, else → validated
(:40-41 ``isnull().any(axis=1)`` / ``dropna(subset=required)``, writes at
:26-31, 43-45).

Spark-native re-expression: the split is ONE scan with two complementary
filters over a conjunctive null predicate — fully distributed, no driver
materialization (the reference's whole-CSV-in-pandas read is its validation
memory ceiling, SURVEY.md §6). Rows whose raw line failed CSV type coercion
(PERMISSIVE ``_corrupt_record``, see sources.io.read_csv) are also routed to
quarantine — a strictly-better contract at scale where one bad row must not
kill a 100 TB job.

Invariants (tested): good ∪ bad == input, good ∩ bad == ∅.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.io import CORRUPT_COL


class MissingRequiredColumns(ValueError):
    """F5: required column absent from the frame — hard fail before any job
    (REF/glue_jobs/validate.py:35-38; 'Column names are case-sensitive' —
    README.md:194)."""


def required_columns_present(df: DataFrame, required: list[str]) -> None:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise MissingRequiredColumns(f"missing required columns: {missing}")


def valid_predicate(df: DataFrame, required: list[str]) -> Column:
    """AND of non-null over required columns; corrupt CSV rows are invalid."""
    pred = F.lit(True)
    for c in required:
        pred = pred & F.col(c).isNotNull()
    if CORRUPT_COL in df.columns:
        pred = pred & F.col(CORRUPT_COL).isNull()
    return pred


def split_valid_invalid(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """F4: (good, bad) as two complementary filters over one logical scan.

    Deliberately NOT an ``except``/anti-join — two filters keep it a single
    pass with no shuffle; at 100 TB the split is map-side only.

    Null-safe complement: ``~pred`` alone would drop rows where the predicate
    evaluates to NULL (can't happen with isNotNull conjunctions, but kept
    explicit so custom predicates stay partition-complete).
    """
    required_columns_present(df, required)
    pred = valid_predicate(df, required)
    good = df.filter(pred)
    bad = df.filter(~F.coalesce(pred, F.lit(False)))
    return good, bad
