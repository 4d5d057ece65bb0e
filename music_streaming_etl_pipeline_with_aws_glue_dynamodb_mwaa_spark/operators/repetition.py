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

Spark-first shape: a PURE MAP. Every statistic the filters need —
total / distinct / most-frequent-count / duplicated-mass per n — is a
function of the multiset of one document's own n-grams, so it computes
IN-ROW: sort the gram array, find run boundaries by index, zip
consecutive boundaries into run lengths. All exact integers plus
per-column single IEEE divisions, so every output column is
oracle-hashable bit-for-bit.

(The previous formulation exploded ~3·L gram rows per document through a
two-level groupBy — partition-local after a doc-keyed repartition, but
still paying the explode fan-out and three hash aggregations; the in-row
form replaced it at ~1.6× measured under a noop full-evaluation sink,
identical output. Per-document work is embarrassingly parallel — the
100 TB shape is a map over the corpus scan, no key exchange ever.)

Scale posture: no key exchange at any size (only an adaptive round-robin
split when the scan has fewer partitions than cores); skew is bounded by
the longest single document (a 1 GB doc is a data bug, not a plan bug) —
the sort is O(L log L) per doc.
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

    Implementation notes (both measured at sf0.1, noop sink):

    - run detection is INDEX-based (filter a position sequence where the
      sorted array changes, then zip_with consecutive run-start positions
      into run lengths) rather than an ``F.aggregate`` run-length fold
      with a struct accumulator — higher-order lambdas are interpreted,
      and per-element struct allocation made the fold ~2.2× slower;
    - every intermediate (sorted array, run starts, run lengths) is
      STAGED as a named column before the next lambda touches it —
      subexpression elimination does not reach inside lambda bodies, so
      referencing ``sort_array(...)`` directly inside ``filter``'s
      lambda re-sorts PER ELEMENT (measured: the un-staged form was
      ~100× slower, O(L² log L) per doc);
    - the operator is a pure map, so when the scan yields fewer splits
      than cores (one fat parquet file — the local bench case) the input
      is round-robin repartitioned first; at lake scale the scan already
      has more splits than cores and no exchange is added.
    """
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    d = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        *[F.sort_array(_ngrams(text_col, n)).alias(f"_s{n}") for n in ns])
    starts_cols = []
    for n in ns:
        s = F.col(f"_s{n}")
        sz = F.size(s)
        seq = F.when(sz > 0, F.sequence(F.lit(1), sz)) \
               .otherwise(F.array().cast("array<int>"))
        starts = F.filter(seq, lambda i: (i == 1) | (
            F.element_at(s, i) != F.element_at(s, i - 1)))
        starts_cols.append(starts.alias(f"_st{n}"))
    d2 = d.select(id_col, "n_tokens",
                  *[F.col(f"_s{n}") for n in ns], *starts_cols)
    run_cols = []
    for n in ns:
        st = F.col(f"_st{n}")
        sz = F.size(F.col(f"_s{n}"))
        ends = F.concat(F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                        F.array((sz + 1).cast("int")))
        run_cols.append(F.zip_with(st, ends, lambda a, b: b - a)
                        .alias(f"_r{n}"))
    d3 = d2.select(id_col, "n_tokens",
                   *[F.size(f"_s{n}").cast("long").alias(f"_sz{n}")
                     for n in ns],
                   *[F.size(f"_st{n}").cast("long").alias(f"_d{n}")
                     for n in ns],
                   *run_cols)
    out_cols: list[Column] = [F.col(id_col), "n_tokens"]
    frac_cols: list[Column] = []
    for n in ns:
        total = F.col(f"_sz{n}")
        top = F.coalesce(F.array_max(f"_r{n}"), F.lit(0)).cast("long")
        dup = (total - F.size(F.filter(F.col(f"_r{n}"), lambda r: r == 1))
               ).cast("long")
        out_cols += [total.alias(f"total_{n}g"),
                     F.col(f"_d{n}").alias(f"distinct_{n}g"),
                     top.alias(f"top_{n}g"), dup.alias(f"dup_{n}g")]
        frac_cols += [
            F.when(total > 0, top.cast("double") / total.cast("double"))
             .alias(f"top_{n}g_frac"),
            F.when(total > 0, dup.cast("double") / total.cast("double"))
             .alias(f"dup_{n}g_frac"),
        ]
    return d3.select(*out_cols, *frac_cols)


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
