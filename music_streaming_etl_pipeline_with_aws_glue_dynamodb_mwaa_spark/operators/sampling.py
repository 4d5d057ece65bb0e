"""Deterministic sampling & split operators (training-data extension).

Train/val/test assignment and stratified downsampling for corpus
construction. Everything keys on a CONTENT hash, never ``rand()``:

- reproducible across runs, engines, partitionings, and cluster sizes
  (``df.sample``/``sampleBy`` are none of these — seeds bind to partition
  layout);
- stable under re-sharding: a document keeps its split forever, so
  incremental corpus rebuilds never leak val docs into train;
- oracle-checkable (md5 is engine-portable; the bucket is the first 8 hex
  digits as an integer — DuckDB: ``('0x' || substr(md5(k),1,8))::BIGINT``).

All pure JVM expressions: the split/sample is a map-side filter — no
shuffle, no driver participation, scales to any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, *, buckets: int = 100,
                salt: str = "") -> Column:
    """Uniform bucket in [0, buckets) from md5 of the key (+ optional salt —
    change it to draw an independent assignment)."""
    c = F.col(key) if isinstance(key, str) else key
    if salt:
        c = F.concat(c.cast("string"), F.lit(salt))
    return F.pmod(F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
                  .cast("long"), F.lit(buckets))


def split_label(key: Column | str, *, train_pct: int = 90,
                val_pct: int = 5, salt: str = "") -> Column:
    """The train/val/test label of ``hash_split`` as a bare Column —
    apply it directly to a key column when the frame already carries the
    key, instead of joining a labeled id frame back on just to attach
    the label (round 12, guide §2.4)."""
    if not 0 < train_pct + val_pct <= 100:
        raise ValueError("train_pct + val_pct must be in (0, 100]")
    b = hash_bucket(key, buckets=100, salt=salt)
    return (F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test")))


def hash_split(df: DataFrame, key_col: str, *, train_pct: int = 90,
               val_pct: int = 5, salt: str = "") -> DataFrame:
    """Deterministic train/val/test assignment: bucket(key) ∈ [0,100) →
    ``train`` below ``train_pct``, ``val`` in the next ``val_pct``, ``test``
    above. Appends a ``split`` column; filter or partition-write by it."""
    return df.withColumn("split", split_label(key_col, train_pct=train_pct,
                                              val_pct=val_pct, salt=salt))


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           fractions: dict[str, float], *,
                           default_fraction: float = 0.0,
                           buckets: int = 10_000,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic downsampling — ``sampleBy`` semantics with
    content-hash reproducibility. ``fractions`` maps stratum value → keep
    fraction; unlisted strata keep ``default_fraction``. The per-stratum
    threshold is folded into ONE case expression (strata maps are small by
    definition), so the whole operator is a map-side filter."""
    b = hash_bucket(key_col, buckets=buckets, salt=salt)
    thresh = F.lit(int(default_fraction * buckets))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(frac * buckets))).otherwise(thresh)
    return df.filter(b < thresh)


def weighted_hash_sample(df: DataFrame, key_col: str, weight: Column, *,
                         resolution: int = 1_000_000,
                         salt: str = "") -> DataFrame:
    """Per-row weighted Bernoulli keep WITHOUT rand(): row survives iff
    ``hash_bucket(key) < floor(weight · resolution)``. Deterministic and
    re-runnable (a row's fate depends only on its key + the weight
    expression), importance-sampling semantics (keep probability ∝ weight,
    clipped to [0, 1]), map-side only — and oracle-checkable, because both
    the bucket and the threshold are exact integers as long as the oracle
    writes the same weight expression tree."""
    b = hash_bucket(key_col, buckets=resolution, salt=salt)
    return df.filter(b < F.floor(weight * F.lit(float(resolution))))


def sample_n_per_group(df: DataFrame, group_cols: list[str], key_col: str,
                       n: int, *, salt: str = "") -> DataFrame:
    """Deterministic fixed-size sample: up to ``n`` rows per group, chosen
    by md5(key + salt) order (tie-broken by the key itself) — reservoir-
    sampling semantics without randomness, so the sample is stable across
    runs/engines/partitionings and refreshes predictably when rows churn.

    One hash exchange on the group; Spark ≥3.5 plans the rank-1..n filter
    as WindowGroupLimit (per-partition partial top-n before the shuffle),
    so the exchange carries ~n rows per group per map task, not the group.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))).asc(),
        F.col(key_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def leakage_safe_split(df: DataFrame, assignments: DataFrame,
                       key_col: str, *, cluster_col: str = "component",
                       train_pct: int = 90, val_pct: int = 5,
                       salt: str = "") -> DataFrame:
    """Train/val/test split keyed on the duplicate-CLUSTER id instead of
    the row id — near-duplicate documents (one connected component of the
    near-dup graph, ``cluster.cluster_assignments``) land in the SAME
    split by construction, closing the classic eval-contamination hole
    where a test document's near-copy sits in train.

    One equi-join of the corpus against the (id, component) frame, then
    the same md5 bucketing as ``hash_split`` applied to the component id.
    Appends (component, split)."""
    joined = df.join(
        assignments.select(F.col(key_col), F.col(cluster_col)), key_col)
    return hash_split(joined, cluster_col, train_pct=train_pct,
                      val_pct=val_pct, salt=salt)


def contrastive_negatives(df: DataFrame, id_col: str, group_col: str, *,
                          buckets: int = 16, k: int = 4,
                          salt: str = "neg") -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive/embedding
    training: each anchor draws its k pseudo-random negatives from the
    OTHER rows of its hash bucket, excluding its own ``group_col`` (source)
    so trivial positives never become negatives.

    Candidate order is md5(anchor ‖ candidate) ascending — a fixed total
    order per anchor, so the draw is reproducible across runs, engines,
    and partitionings (the property ``df.sample`` lacks), and the whole
    table is oracle-exact.

    Scale: the only join is the bucket self-equi-join. With bucket size
    b ≈ N/buckets, total candidate pairs are N·b — LINEAR in N when
    ``buckets`` grows with the corpus (hold b constant, e.g. b≈64); the
    per-anchor rank is a WindowGroupLimit-able top-k, never a global sort.
    An anchor whose bucket holds no foreign-group row yields no negatives
    (deterministic; callers re-salt to redraw)."""
    keyed = df.select(
        F.col(id_col), F.col(group_col),
        hash_bucket(F.col(id_col), buckets=buckets, salt=salt).alias("_b"))
    a = keyed.select(F.col(id_col).alias("anchor_id"),
                     F.col(group_col).alias("_ga"), "_b")
    c = keyed.select(F.col(id_col).alias("neg_id"),
                     F.col(group_col).alias("_gc"), "_b")
    pair_h = F.md5(F.concat_ws("#", F.col("anchor_id").cast("string"),
                               F.col("neg_id").cast("string")))
    w = Window.partitionBy("anchor_id").orderBy(pair_h)
    return (a.join(c, "_b")
            .where(F.col("_ga") != F.col("_gc"))
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= k)
            .select("anchor_id", "neg_id", "rk"))


def kfold_assign(df: DataFrame, key_col: str, *, k: int = 5,
                 salt: str = "") -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold(row) =
    md5-bucket(key) mod k. Same contract as ``hash_split`` — content-keyed
    (stable under re-sharding and incremental rebuilds, never ``rand()``),
    map-side only, engine-portable. Appends a ``fold`` column in [0, k)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn("fold", hash_bucket(key_col, buckets=k, salt=salt))


def temporal_embargo_split(df: DataFrame, ts_col: str, *,
                           test_days: int = 7,
                           embargo_days: int = 2) -> DataFrame:
    """Time-based train/test split with an embargo gap (the standard
    leakage control for forecasting / time-series eval, e.g. de Prado's
    purged splits): the last ``test_days`` before the corpus max timestamp
    are ``test``, the ``embargo_days`` immediately before them are
    ``embargo`` (excluded from both sides so lagged/rolling features built
    on train rows cannot peek across the boundary), everything earlier is
    ``train``. Appends a ``split`` column.

    The only non-map step is the 1-row global max(ts), broadcast back as a
    scalar; day arithmetic is exact 86400-second intervals on the
    microsecond line, so the labeling is oracle-exact. At 100 TB the max
    is a partial-agg reduction; everything else stays a map-side CASE."""
    if test_days <= 0 or embargo_days < 0:
        raise ValueError("test_days must be > 0 and embargo_days >= 0")
    bounds = df.agg(F.max(ts_col).alias("_max_ts"))
    test_lo = F.col("_max_ts") - F.expr(f"INTERVAL {test_days} DAYS")
    emb_lo = F.col("_max_ts") - F.expr(
        f"INTERVAL {test_days + embargo_days} DAYS")
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn("split",
                        F.when(F.col(ts_col) > test_lo, F.lit("test"))
                         .when(F.col(ts_col) > emb_lo, F.lit("embargo"))
                         .otherwise(F.lit("train")))
            .drop("_max_ts"))
