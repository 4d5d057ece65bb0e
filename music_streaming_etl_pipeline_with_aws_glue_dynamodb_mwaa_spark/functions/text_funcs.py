"""Text column expressions shared by the dedup / text-analysis operators.

All pure Spark Column expressions (JVM-side, codegen'd) — tokenization,
n-gram shingling, stopword counting, fingerprinting. Python/pandas appears
only where bit-level hashes are genuinely cheaper vectorized (see
operators.dedup.simhash64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English function-word list for the language-ID heuristic. The only
# overlap with the synthetic corpus vocabulary is {'the', 'a'}, which is
# exactly what a stopword-ratio heuristic keys on.
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                "that", "for", "on", "with", "as", "at", "by", "this"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def shingles(col: Column | str, n: int) -> Column:
    """Word n-gram shingles as an array<string>; distinct, order-insensitive.

    ``sequence(0, size-n)`` would generate a DESCENDING sequence when the
    document has fewer than n tokens — guard to an empty array instead.
    """
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def stopword_count(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Number of token occurrences (with duplicates) found in the stopword
    list — the numerator of the stopword-ratio language signal."""
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the normalized token stream
    (lowercased, single-space rejoined) — identical content, identical
    fingerprint, independent of incidental whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.concat_ws(" ", F.split(F.lower(F.trim(c)), r"\s+"))
    return F.md5(normalized)
