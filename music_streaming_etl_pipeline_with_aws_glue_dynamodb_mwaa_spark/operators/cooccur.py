"""Token co-occurrence tables and association scores — the word-vector /
collocation substrate (PMI-style statistics over a ±w token window).

Extension surface: the reference has no lexical statistics at all; this
complements ``operators/ranking.py`` (TF-IDF/BM25, n-gram LM counts) with
the SYMMETRIC window co-occurrence counts that feed GloVe/PPMI-style
embedding training, collocation extraction, and distributional-similarity
features.

Spark-first shape: pair ENUMERATION is pure JVM array code — for each
offset j ≤ window, zip the token array against its own j-shifted suffix
(``zip_with(toks, slice(toks, j+1, …))``), canonicalize each pair with
least/greatest so (a,b) ≡ (b,a), concat the per-offset arrays, ONE
explode, one groupBy. No self-join on positions: the window join that a
naive formulation would do per document is precomputed inside the row.

The association score deliberately stops at the RATIO
``n_pair·T / (w·n_a·n_b)`` (the exp of PMI up to the window constant):
it ranks identically to PMI and is a single IEEE division of exact longs
— bit-portable across engines, where ``ln`` is not correctly rounded in
either. Callers who want log-space values take the log client-side.

At 100 TB: the only exchange carries (pair, partial count) after map-side
combine — vocabulary-sized, not corpus-sized. Hot pairs (stopword
bigrams) are just heavy reducer keys; cap them with a docfreq cut before
the explode if the corpus is adversarial (same playbook as
dedup.shared_ngram_pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens


def _window_pair_array(toks: Column, window: int) -> Column:
    """array<struct<a,b>> of all canonicalized within-window pairs."""
    per_offset = []
    for j in range(1, window + 1):
        suffix = F.slice(toks, j + 1,
                         F.greatest(F.size(toks) - j, F.lit(0)))
        raw = F.zip_with(toks, suffix,
                         lambda a, b: F.struct(a.alias("x"), b.alias("y")))
        kept = F.filter(raw, lambda s: s["y"].isNotNull())
        per_offset.append(F.transform(
            kept, lambda s: F.struct(
                F.least(s["x"], s["y"]).alias("a"),
                F.greatest(s["x"], s["y"]).alias("b"))))
    return F.concat(*per_offset) if len(per_offset) > 1 else per_offset[0]


def cooccurrence_counts(docs: DataFrame, text_col: str = "text", *,
                        window: int = 2) -> DataFrame:
    """(a, b, n_pair) for every unordered token pair within ``window``
    positions of each other, occurrence-preserving, a ≤ b."""
    pairs = docs.select(
        F.explode(_window_pair_array(tokens(text_col), window)).alias("_p"))
    return (pairs.select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pair")))


def association_scores(docs: DataFrame, text_col: str = "text", *,
                       window: int = 2,
                       min_pair_count: int = 5) -> DataFrame:
    """Collocation table: (a, b, n_pair, n_a, n_b, assoc_ratio), where
    ``assoc_ratio = n_pair·T / (window·n_a·n_b)`` with T = total token
    occurrences — exp(PMI) under the standard window-normalized pair
    probability. One token-count pass + one pair pass; unigram counts
    join back by token (two small joins against a vocabulary-sized
    frame)."""
    tok = docs.select(F.explode(tokens(text_col)).alias("tok"))
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = tok.agg(F.count(F.lit(1)).alias("_t"))

    pairs = cooccurrence_counts(docs, text_col, window=window) \
        .filter(F.col("n_pair") >= min_pair_count)
    out = (pairs
           .join(uni.select(F.col("tok").alias("a"),
                            F.col("n_tok").alias("n_a")), "a")
           .join(uni.select(F.col("tok").alias("b"),
                            F.col("n_tok").alias("n_b")), "b")
           .crossJoin(F.broadcast(total)))
    return out.select(
        "a", "b", "n_pair", "n_a", "n_b",
        ((F.col("n_pair") * F.col("_t")).cast("double")
         / (F.lit(window) * F.col("n_a") * F.col("n_b")).cast("double"))
        .alias("assoc_ratio"))
