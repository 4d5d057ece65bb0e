"""Reusable scalar column expressions (SURVEY.md §2.8).

Everything the reference does per-row in Python — ``f"{genre}#{name}"`` keys
(``REF/glue_jobs/load_dynamo.py:138``), ``int(x or 0)`` / ``float(x or 0)``
defaults (``:126-152``), division (``REF/glue_jobs/transform.py:35``) — as
native Spark Column expressions, so the hot path stays inside whole-stage
codegen with zero Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """SQL-semantics division: null when the denominator is 0/null (the
    reference's Python ``total/unique`` would raise ZeroDivisionError —
    REF/glue_jobs/transform.py:35; we keep SQL semantics, documented
    divergence per SURVEY.md §2.8)."""
    return num / F.nullif(den, F.lit(0))


def composite_key(*cols: Column | str, sep: str = "#") -> Column:
    """``genre#track``-style composite key (REF/glue_jobs/load_dynamo.py:138)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def coerce_long(col: Column | str, default: int = 0) -> Column:
    """``int(x or 0)`` (REF/glue_jobs/load_dynamo.py:127-128,141-142,151-152)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("long"), F.lit(default).cast("long"))


def coerce_double(col: Column | str, default: float = 0.0) -> Column:
    """``float(x or 0)`` (REF/glue_jobs/load_dynamo.py:129-130)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("double"), F.lit(default).cast("double"))


def iso_now() -> Column:
    """ISO-8601 driver timestamp for ledger rows
    (``datetime.utcnow().isoformat()`` at REF/dags/music_etl_pipeline.py:44)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")
