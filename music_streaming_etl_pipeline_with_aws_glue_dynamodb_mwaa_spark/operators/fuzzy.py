"""Fuzzy string matching — blocked edit-distance similarity join (entity
resolution extension, SURVEY.md §7 E-class).

Near-identical SHORT strings (product names, artist/song titles, user
handles) are the record-linkage counterpart of the document near-dup family
in ``operators/dedup.py``: token-set similarity is meaningless at 2-3
tokens, but edit distance is sharp. The reference pipeline keys everything
on exact ids and would silently treat "blue bolt"/"blu bolt" as distinct
entities; this operator surfaces them.

Spark-first shape: NEVER the naive n² cross join. Candidate pairs come from
a token-blocking equi-join — two names can be within edit distance d only
if they share a token, unless one of their tokens was itself mutilated
beyond recognition; sharing ANY token is the standard blocking key for
short multi-token names (record-linkage practice: candidates = names
colliding on ≥1 blocking key). Verification is JVM ``levenshtein`` on the
collided pairs only. Both stages are shuffles on small keys; the quadratic
blow-up is bounded per token-bucket, and a ``max_token_freq`` stop-token
cut caps pathological buckets ("the", a ubiquitous brand word) exactly the
way ``dedup.shared_ngram_pairs`` caps boilerplate grams.

Scale posture (100 TB of names): explode ×tokens, two hash exchanges, and a
per-bucket self-join — identical skeleton to the n-gram Jaccard join that
already survives the scale argument; the verify is a codegen'd JVM function
with no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens


def fuzzy_name_pairs(df: DataFrame, id_col: str, name_col: str, *,
                     max_distance: int = 2,
                     max_token_freq: int | None = None) -> DataFrame:
    """(id_a, id_b, name_a, name_b, distance): every pair of rows whose
    names share ≥1 token and sit within ``max_distance`` Levenshtein edits
    (DIFFERENT names only — exact duplicates are ``dedup_exact``'s job).

    Blocking, candidate generation, and edit-distance verification all run
    on the DISTINCT-NAME frame, not on rows: real catalogs repeat names
    massively (TPC-H part: 20k rows, 64 distinct names), and row-level
    blocking squares that multiplicity inside every token bucket before a
    single byte of verification happens. Name-level work is
    |distinct names|-sized; verified name pairs then fan back out to id
    pairs through two equi-joins — the row-pair explosion happens only in
    the OUTPUT, where it is the answer itself, never in an intermediate.

    ``max_token_freq`` drops blocking tokens shared by more than that many
    DISTINCT NAMES (stop-token cut) — recall-lossy by design, the knob
    that keeps a ubiquitous token from quadratic candidate blow-up.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"))
    names = base.select("_nm").distinct()
    blocked = names.select("_nm", F.explode(
        F.array_distinct(tokens("_nm"))).alias("_tok"))
    if max_token_freq is not None:
        ok = (blocked.groupBy("_tok")
              .agg(F.count(F.lit(1)).alias("_f"))
              .filter(F.col("_f") <= max_token_freq)
              .select("_tok"))
        blocked = blocked.join(ok, "_tok")
    a = blocked.select(F.col("_nm").alias("_na"), "_tok")
    b = blocked.select(F.col("_nm").alias("_nb"), "_tok")
    cand = (a.join(b, "_tok")
            .filter(F.col("_na") < F.col("_nb"))
            .select("_na", "_nb")
            .distinct())
    # cheap length prefilter before the O(len²) edit-distance verify
    npairs = (cand
              .filter(F.abs(F.length("_na") - F.length("_nb"))
                      <= max_distance)
              .withColumn("_d", F.levenshtein("_na", "_nb"))
              .filter((F.col("_d") <= max_distance) & (F.col("_d") > 0)))
    # fan the (few) verified name pairs back out to id pairs; orient each
    # row pair by id order, names following their ids
    ga = base.select(F.col("_id").alias("_ia"), F.col("_nm").alias("_na"))
    gb = base.select(F.col("_id").alias("_ib"), F.col("_nm").alias("_nb"))
    lo = F.col("_ia") < F.col("_ib")
    return (npairs.join(ga, "_na").join(gb, "_nb")
            .select(F.least("_ia", "_ib").alias("id_a"),
                    F.greatest("_ia", "_ib").alias("id_b"),
                    F.when(lo, F.col("_na")).otherwise(F.col("_nb"))
                    .alias("name_a"),
                    F.when(lo, F.col("_nb")).otherwise(F.col("_na"))
                    .alias("name_b"),
                    F.col("_d").alias("distance")))


def fuzzy_canonicalize(df: DataFrame, id_col: str, name_col: str, *,
                       max_distance: int = 2,
                       max_token_freq: int | None = None) -> DataFrame:
    """Map every row to a canonical representative id: the MINIMUM id among
    its direct fuzzy matches (including itself) — the single-hop merge rule
    (one union + min-agg; for transitive chains feed the pairs to
    ``operators.cluster.connected_components`` instead)."""
    pairs = fuzzy_name_pairs(df, id_col, name_col,
                             max_distance=max_distance,
                             max_token_freq=max_token_freq)
    fwd = pairs.select(F.col("id_b").alias("_id"), F.col("id_a").alias("_c"))
    self_ = df.select(F.col(id_col).alias("_id"),
                      F.col(id_col).alias("_c"))
    return (self_.unionByName(fwd)
            .groupBy("_id").agg(F.min("_c").alias("canonical_id"))
            .withColumnRenamed("_id", id_col))
