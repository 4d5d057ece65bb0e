"""Declarative data-quality expectations (Deequ/Great-Expectations shape,
Spark-first): compile a check suite into as few distributed jobs as the
checks allow and emit ONE small summary frame —
``(check, kind, n_violations, passed)``.

The reference hand-rolls exactly three of these checks in driver-side
pandas (required columns + null split, ``REF/glue_jobs/validate.py:34-47``)
and re-reads the data once per table per run. Here:

- every ROW-LEVEL check (not_null, accepted_values, in_range, matches) and
  every UNIQUENESS check compiles into one aggregate expression, and all of
  them run in a SINGLE ``agg`` pass over the table — one scan total,
  map-side partials, a 1-row result regardless of table size;
- referential (foreign-key) checks each need their own anti-join against
  the dimension — unavoidable second input — but the dim side is
  key-projected first and the probe is the same single scan shape;
- the wide 1-row aggregate is then unpivoted driver-free (``stack``) into
  the tidy per-check report.

Everything stays declarative: no collect, no Python row loops, and the
whole suite is one job (plus one per FK check), so gating a 100 TB table
costs one pass, not one pass per expectation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _FkCheck:
    name: str
    fact_col: str
    dim: DataFrame
    dim_col: str


@dataclass
class Expectations:
    """Builder for a check suite over one table. Each ``expect_*`` returns
    ``self`` for chaining; ``report`` / ``validate`` run the suite."""

    _row_checks: list[tuple[str, str, Column]] = field(default_factory=list)
    _fk_checks: list[_FkCheck] = field(default_factory=list)

    # -- row-level -----------------------------------------------------------
    def expect_not_null(self, col: str) -> "Expectations":
        self._row_checks.append(
            (f"not_null({col})", "not_null", F.col(col).isNull()))
        return self

    def expect_accepted_values(self, col: str, values: list) -> "Expectations":
        self._row_checks.append((
            f"accepted_values({col})", "accepted_values",
            ~F.col(col).isin(values) | F.col(col).isNull()))
        return self

    def expect_in_range(self, col: str, lo=None, hi=None) -> "Expectations":
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < lo)
        if hi is not None:
            cond = cond | (F.col(col) > hi)
        self._row_checks.append((
            f"in_range({col})", "in_range", cond | F.col(col).isNull()))
        return self

    def expect_matches(self, col: str, pattern: str) -> "Expectations":
        self._row_checks.append((
            f"matches({col})", "matches",
            ~F.col(col).rlike(pattern) | F.col(col).isNull()))
        return self

    # -- table-level ---------------------------------------------------------
    def expect_unique(self, cols: list[str]) -> "Expectations":
        # violations = rows beyond the first of each duplicated key group
        # = count(*) - n_distinct(keys); NULL keys group via the sentinel
        # struct (count_distinct skips all-NULL tuples, so wrap in a struct
        # which is never NULL).
        key = F.struct(*[F.col(c) for c in cols])
        self._row_checks.append((
            f"unique({','.join(cols)})", "unique", key))
        return self

    # -- referential ---------------------------------------------------------
    def expect_fk(self, fact_col: str, dim: DataFrame,
                  dim_col: str) -> "Expectations":
        self._fk_checks.append(
            _FkCheck(f"fk({fact_col})", fact_col, dim, dim_col))
        return self

    # -- run -----------------------------------------------------------------
    def report(self, df: DataFrame) -> DataFrame:
        """One row per expectation: (check, kind, n_violations, passed),
        ordered by check name (deterministic)."""
        aggs, names = [], []
        for name, kind, col in self._row_checks:
            safe = name.replace("'", "")
            if kind == "unique":
                aggs.append((F.count(F.lit(1)) - F.count_distinct(col))
                            .alias(safe))
            else:
                # coalesce: an EMPTY table has zero violations, not NULL
                aggs.append(F.coalesce(F.sum(F.when(col, 1).otherwise(0)),
                                       F.lit(0)).cast("long").alias(safe))
            names.append((safe, kind))
        reports = []
        if aggs:
            wide = df.agg(*aggs)
            stack = F.expr("stack({}, {})".format(
                len(names),
                ", ".join(f"'{n}', '{k}', `{n}`" for n, k in names)))
            reports.append(wide.select(
                stack.alias("check", "kind", "n_violations")))
        for fk in self._fk_checks:
            dim_keys = fk.dim.select(
                F.col(fk.dim_col).alias(fk.fact_col)).distinct()
            orphans = (df.filter(F.col(fk.fact_col).isNotNull())
                       .join(dim_keys, fk.fact_col, "left_anti")
                       .agg(F.count(F.lit(1)).cast("long")
                            .alias("n_violations"))
                       .select(F.lit(fk.name).alias("check"),
                               F.lit("fk").alias("kind"), "n_violations"))
            reports.append(orphans)
        if not reports:
            raise ValueError("empty expectation suite")
        out = reports[0]
        for r in reports[1:]:
            out = out.unionByName(r)
        return (out.withColumn("passed", F.col("n_violations") == 0)
                .orderBy("check"))

    def validate(self, df: DataFrame) -> bool:
        """True iff every expectation holds (the gate form — e.g. the
        pipeline's validation-routing hook)."""
        return all(r["passed"] for r in self.report(df).collect())
