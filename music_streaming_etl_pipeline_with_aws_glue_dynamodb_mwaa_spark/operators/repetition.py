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

Spark-first shape: ZERO shuffles. Every statistic the filters need —
total / distinct / most-frequent-count / duplicated-mass per n — is a
function of the multiset of one document's own n-grams, so it computes
IN-ROW: sort the gram array, then one ``F.aggregate`` run-length fold
extracts (distinct runs, longest run, duplicated mass) per document. All
exact integers plus per-column single IEEE divisions, so every output
column is oracle-hashable bit-for-bit.

(The previous formulation exploded ~3·L gram rows per document through a
two-level groupBy — partition-local after a doc-keyed repartition, but
still paying the explode fan-out, three hash aggregations, and a join;
the in-row fold replaced it at ~6× on the bench suite with identical
output. Per-document work is embarrassingly parallel — the 100 TB shape
is a pure map over the corpus scan.)

Scale posture: no exchange at any size; skew is bounded by the longest
single document (a 1 GB doc is a data bug, not a plan bug) — the sort is
O(L log L) per doc in a codegen'd expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    cols: list[Column] = [
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    ]
    stat_names = []
    for n in ns:
        s = _run_length_stats(F.sort_array(_ngrams(text_col, n)))
        cols.append(s.alias(f"_s{n}"))
        stat_names.append(n)
    counted = docs.select(*cols)
    out_cols: list[Column] = [F.col(id_col), "n_tokens"]
    for n in stat_names:
        s = F.col(f"_s{n}")
        out_cols += [s["total"].alias(f"total_{n}g"),
                     s["distinct"].alias(f"distinct_{n}g"),
                     s["top"].alias(f"top_{n}g"),
                     s["dup"].alias(f"dup_{n}g")]
    frac_cols = []
    for n in stat_names:
        total = F.col(f"_s{n}")["total"]
        frac_cols += [
            F.when(total > 0, F.col(f"_s{n}")["top"].cast("double")
                   / total.cast("double")).alias(f"top_{n}g_frac"),
            F.when(total > 0, F.col(f"_s{n}")["dup"].cast("double")
                   / total.cast("double")).alias(f"dup_{n}g_frac"),
        ]
    return counted.select(*out_cols, *frac_cols)


def _run_length_stats(sorted_grams: Column) -> Column:
    """(total, distinct, top, dup) of a SORTED array, as one run-length
    fold: equal elements are adjacent, so a single ``F.aggregate`` pass
    tracking (previous element, current run length) yields the distinct
    count (number of runs), the most-frequent count (longest run), and
    the duplicated mass (Σ run lengths > 1) — the finish lambda flushes
    the last open run. NULL-prev on the first element falls through the
    equality test into the new-run branch; an empty array returns all
    zeros. Exact longs throughout."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"), zero.alias("run"),
        zero.alias("distinct"), zero.alias("top"), zero.alias("dup"))

    def step(acc, x):
        closed = _close_run(acc)
        return F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"),
                     (acc["run"] + 1).alias("run"),
                     acc["distinct"].alias("distinct"),
                     acc["top"].alias("top"), acc["dup"].alias("dup"))
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("run"),
                     (acc["distinct"] + 1).alias("distinct"),
                     closed["top"].alias("top"), closed["dup"].alias("dup")))

    folded = F.aggregate(sorted_grams, acc0, step, _close_run)
    return F.struct(
        F.size(sorted_grams).cast("long").alias("total"),
        folded["distinct"].alias("distinct"),
        folded["top"].alias("top"), folded["dup"].alias("dup"))


def _close_run(acc: Column) -> Column:
    """Fold the accumulator's open run into top/dup."""
    return F.struct(
        acc["prev"].alias("prev"), acc["run"].alias("run"),
        acc["distinct"].alias("distinct"),
        F.greatest(acc["top"], acc["run"]).alias("top"),
        (acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(0))
        .alias("dup"))


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
