"""Byte-pair-encoding merge learning — the tokenizer-training primitive
(Sennrich et al. 2016), distributed over the word VOCABULARY.

A training-data pipeline that ships a tokenizer needs the merge table
learned from its own corpus. Classic BPE never iterates over the corpus:
it iterates over the word-frequency vocabulary (words × counts), which is
zipf-small relative to the corpus — exactly the right Spark shape:

- one corpus pass builds (word, count) — the ONLY corpus-sized job;
- each merge round is one vocabulary-sized job: count adjacent symbol
  pairs weighted by word count (JVM ``zip_with`` against the 1-shifted
  symbol array — no position self-join), take the global best pair
  (count desc, then lexicographic — a deterministic total order), and
  rewrite every word's symbol array with a left-to-right greedy fold
  (``F.aggregate``: merge when the accumulator's tail is `a` and the
  element is `b`, matching the reference implementation's scan order on
  overlaps like "aaa");
- the vocabulary frame is eagerly checkpointed per round — the same
  iterative-loop discipline as graph.pagerank / cluster.py (a lazy plan
  would replay all prior rewrites every round).

The driver holds only the k merge rows and the 1-row argmax per round.
Iterative + data-dependent control flow ⇒ no SQL oracle; exact
equivalence with a pure-Python reference BPE is pinned in
tests/test_bpe.py (rows-only at the driver gate).

At 100 TB the corpus pass is a word-keyed groupBy (map-side combined);
the per-round cost is vocabulary-sized and independent of corpus scale —
this is why BPE trainers survive web-scale corpora at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens

#: end-of-word marker, appended as a separate final symbol so merges
#: can't cross word boundaries and word-final units stay distinct
#: (standard BPE convention).
EOW = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace tokens — the one corpus-sized pass."""
    return (docs.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocab, weighted by word count."""
    syms = F.col("_syms")
    shifted = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    pairs = F.filter(
        F.zip_with(syms, shifted,
                   lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
        lambda s: s["b"].isNotNull())
    return (vocab.select(F.explode(pairs).alias("_p"), "count")
            .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
            .agg(F.sum("count").alias("pair_count")))


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Left-to-right greedy rewrite of every symbol array: …,a,b,… → …,ab,…"""
    la, lb = F.lit(a), F.lit(b)
    # F.get (not element_at): null-safe on the empty accumulator — ANSI
    # mode (Spark 4 default) makes out-of-bounds element_at an error
    merged = F.aggregate(
        F.col("_syms"), F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(la, lb)))
        ).otherwise(F.concat(acc, F.array(x))))
    return vocab.withColumn("_syms", merged)


def learn_bpe(docs: DataFrame, text_col: str = "text", *,
              n_merges: int = 8, min_pair_count: int = 2) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table as
    dicts: {step, left, right, pair_count}. Stops early when no pair
    reaches ``min_pair_count``."""
    vocab = (word_vocab(docs, text_col)
             .withColumn("_syms",
                         F.concat(F.split(F.col("word"), ""),
                                  F.array(F.lit(EOW))))
             .localCheckpoint())
    merges: list[dict] = []
    for step in range(n_merges):
        best = (_pair_counts(vocab)
                .orderBy(F.col("pair_count").desc(), F.col("a"), F.col("b"))
                .limit(1).collect())
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["pair_count"]
        merges.append({"step": step, "left": a, "right": b,
                       "pair_count": cnt})
        # EAGER checkpoint: round k's plan must be one rewrite over a leaf,
        # not k nested rewrites (pagerank/cluster loop discipline)
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges


def bpe_merge_table(docs: DataFrame, text_col: str = "text", *,
                    n_merges: int = 8,
                    min_pair_count: int = 2) -> DataFrame:
    """The learned merge table as a DataFrame (step, left, right,
    pair_count) — k rows, created on the driver from ``learn_bpe``."""
    spark = docs.sparkSession
    merges = learn_bpe(docs, text_col, n_merges=n_merges,
                       min_pair_count=min_pair_count)
    schema = "step int, left string, right string, pair_count long"
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["pair_count"])
         for m in merges], schema)
