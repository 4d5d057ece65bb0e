"""Intra-document repetition filters (training-data extension, SURVEY.md §7
E-class) — the Gopher/MassiveText quality-filter family: a document whose
mass concentrates in a few repeated n-grams is boilerplate/spam, not prose,
and gets pruned before training.

The reference has no text-quality surface at all; this extends the
``operators/text.py`` quality gate with the repetition signals from the
published Gopher rules (top n-gram fraction, duplicate n-gram fraction),
re-expressed over token n-grams (the corpus is a single-space token stream,
so token-level fractions are the natural analogue of the paper's
character-level ones).

Spark-first shape: ONE occurrence-preserving explode per n, a two-level
aggregation — (doc, gram) counts, then per-doc roll-up — and a join of the
per-n frames on doc_id. All exact integers plus per-column single IEEE
divisions, so every output column is oracle-hashable bit-for-bit.

Scale posture (100 TB): the explode fans out ~L grams per document but the
first groupBy collapses them map-side (partial aggregation on (doc, gram)
before the exchange); the per-doc frames that meet in the join are one row
per document. No window, no skew risk beyond pathological single documents
(a 1 GB doc is a data bug, not a plan bug).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens
from .ranking import _ngrams


def repetition_stats(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Per-document repetition profile for each n in ``ns``:

    - ``total_{n}g``    — n-gram occurrences (exact int)
    - ``distinct_{n}g`` — distinct n-grams (exact int)
    - ``top_{n}g``      — occurrences of the most frequent n-gram
    - ``dup_{n}g``      — occurrences belonging to grams seen more than
      once (the Gopher "duplicate n-gram" numerator)
    - ``top_{n}g_frac`` / ``dup_{n}g_frac`` — each ONE IEEE division of
      the exact integers above (bit-portable across engines).

    Documents shorter than n tokens surface with zero counts and NULL
    fractions rather than dropping out.
    """
    # ONE tagged explode for all n (struct(n, gram)), then
    # (doc, n, gram) → (doc, n) → pivot-by-conditional-aggregation to one
    # row per doc. Every aggregation is keyed by a superset of {doc}, so
    # repartition the RAW documents by id FIRST (a doc-sized shuffle) and
    # the entire exploded gram stream stays partition-local: hash
    # partitioning on a subset of the group keys satisfies the clustering
    # requirement, and Catalyst elides all three downstream exchanges —
    # the ~n·L-per-doc gram strings never cross the wire. (Previously the
    # first groupBy shuffled the gram stream itself: ~3L string rows per
    # document.) The n_tokens branch reads the same repartitioned frame,
    # so ReuseExchange shares the one shuffle.
    def _tag(n):
        # one-arg lambda on purpose: F.transform passes (element, index) to
        # a TWO-arg lambda, so an `n=n` default would receive the index
        return lambda g: F.struct(F.lit(n).alias("_n"), g.alias("_g"))

    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col)) \
            .repartition(F.col("_id"))
    tagged = F.concat(*[F.transform(_ngrams(text_col, n), _tag(n))
                        for n in ns])
    grams = d.select("_id", F.explode_outer(tagged).alias("_t")) \
             .select("_id", F.col("_t._n").alias("_n"),
                     F.col("_t._g").alias("_g"))
    per_gram = grams.groupBy("_id", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_cnt"))
    per_nd = per_gram.groupBy("_id", "_n").agg(
        F.sum("_cnt").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
        F.max("_cnt").alias("_top"),
        F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt"))
              .otherwise(F.lit(0))).alias("_dup"))
    aggs = []
    for n in ns:
        is_n = F.col("_n") == n
        aggs += [
            F.coalesce(F.sum(F.when(is_n, F.col("_total"))),
                       F.lit(0)).alias(f"total_{n}g"),
            F.coalesce(F.sum(F.when(is_n, F.col("_distinct"))),
                       F.lit(0)).alias(f"distinct_{n}g"),
            F.coalesce(F.sum(F.when(is_n, F.col("_top"))),
                       F.lit(0)).alias(f"top_{n}g"),
            F.coalesce(F.sum(F.when(is_n, F.col("_dup"))),
                       F.lit(0)).alias(f"dup_{n}g"),
        ]
    out = per_nd.groupBy("_id").agg(*aggs)
    frac_cols = []
    for n in ns:
        total = F.col(f"total_{n}g")
        frac_cols += [
            F.when(total > 0, F.col(f"top_{n}g").cast("double")
                   / total.cast("double")).alias(f"top_{n}g_frac"),
            F.when(total > 0, F.col(f"dup_{n}g").cast("double")
                   / total.cast("double")).alias(f"dup_{n}g_frac"),
        ]
    out = out.select(
        "_id",
        *[c for n in ns for c in (f"total_{n}g", f"distinct_{n}g",
                                  f"top_{n}g", f"dup_{n}g")],
        *frac_cols)
    base = d.select("_id",
                    F.size(tokens(text_col)).cast("long").alias("n_tokens"))
    return base.join(out, "_id").withColumnRenamed("_id", id_col)


def repetition_gate(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_top_2g_frac: float = 0.20,
                    max_dup_3g_frac: float = 0.20) -> DataFrame:
    """Doc-level keep/drop verdict on the Gopher-style thresholds: flag a
    document when its most frequent bigram covers more than
    ``max_top_2g_frac`` of all bigrams, or when more than
    ``max_dup_3g_frac`` of its trigram occurrences are duplicates.

    Returns (id, flags, keep) — the frame you ``left_anti`` against the
    corpus (or feed ``operators.corpus.build_corpus`` as an extra gate).
    Too-short docs (no bigrams) pass: repetition is unmeasurable, and
    length gating is ``text.quality_gate``'s job, not this one's.
    """
    stats = repetition_stats(docs, id_col=id_col, text_col=text_col, ns=(2, 3))
    top_bad = F.coalesce(F.col("top_2g_frac") > max_top_2g_frac, F.lit(False))
    dup_bad = F.coalesce(F.col("dup_3g_frac") > max_dup_3g_frac, F.lit(False))
    return stats.select(
        id_col, "n_tokens", "top_2g_frac", "dup_3g_frac",
        top_bad.alias("flag_top_bigram"),
        dup_bad.alias("flag_dup_trigram"),
        (~top_bad & ~dup_bad).alias("keep"),
    )
