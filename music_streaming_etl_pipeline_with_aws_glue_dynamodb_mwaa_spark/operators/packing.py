"""Sequence packing for LLM training (training-data extension).

The concat-and-chunk packing every pre-training pipeline performs: within a
group (shard/source), documents are laid head-to-tail in a deterministic
order and cut into fixed token-budget context windows; each document learns
its window index and offset. Downstream, ``groupBy(bin_idx)`` materializes
the actual training sequences.

Spark-first: one window cumsum per group — a single hash shuffle on the
group column, all JVM expressions. Deliberately NOT best-fit bin packing
(an inherently sequential heuristic); concat-and-chunk is what GPT/LLaMA
training actually uses and it parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens


def pack_documents(docs: DataFrame, *, budget_tokens: int,
                   group_col: str = "source", order_col: str = "doc_id",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign each document its context-window bin and intra-bin offset.

    ``token_offset`` = tokens laid down before this doc in its group's
    deterministic (``order_col`` asc) stream; ``bin_idx`` = which
    ``budget_tokens`` window that offset falls in; ``bin_offset`` = position
    inside it. A document straddling a boundary spills into the next window
    (standard packing-with-splitting accounting: the stream is cut every
    ``budget_tokens`` regardless of document edges).

    Exact integer arithmetic end to end (counts, cumsum, one integer
    div/mod) — oracle-reproducible.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    n_tok = F.size(tokens(text_col)).cast("long")
    w = (Window.partitionBy(group_col)
         .orderBy(F.col(order_col).asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum(n_tok).over(w), F.lit(0).cast("long"))
    b = int(budget_tokens)
    return docs.select(
        F.col(id_col),
        F.col(group_col),
        n_tok.alias("n_tokens"),
        offset.alias("token_offset"),
    ).withColumns({
        # integer `div`, never floor(double/b): exact at any offset magnitude
        "bin_idx": F.expr(f"token_offset div {b}").cast("long"),
        "bin_offset": F.pmod(F.col("token_offset"), F.lit(b)).cast("long"),
    })


def packing_stats(packed: DataFrame, *, budget_tokens: int,
                  group_col: str = "source") -> DataFrame:
    """Per-group packing efficiency: windows used, docs and tokens packed,
    fill ratio of the fully-formed windows ((n_bins-1 full windows + the
    partial tail) vs total tokens). One aggregation over the packed frame."""
    agg = packed.groupBy(group_col).agg(
        (F.max("bin_idx") + 1).alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return agg.withColumn(
        "fill_ratio",
        F.col("total_tokens").cast("double")
        / (F.col("n_bins") * F.lit(budget_tokens)))


def shard_by_token_budget(docs: DataFrame, *, shard_tokens: int,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Assign every document to a fixed-token-budget output shard:
    (id, n_tokens, cum_tokens, shard_id), documents in ``id_col`` order,
    ``shard_id = (cum_tokens − n_tokens) div shard_tokens`` — a document
    belongs to the shard its FIRST token falls in, so shards are
    contiguous id-ranges of ≈``shard_tokens`` tokens: the "cut the corpus
    into ~1 GB training files" step before a partitioned write.

    The running total is the two-phase parallel global cumsum
    (operators/ids.py — range-partition + per-partition sums to the
    driver + local fold), never a single-task unpartitioned window; cost
    is one range exchange at any corpus size. Exact integer arithmetic
    end-to-end ⇒ oracle-hashable.
    """
    from ..functions.text_funcs import tokens
    from . import ids
    sized = docs.select(F.col(id_col),
                        F.size(tokens(text_col)).cast("long")
                        .alias("n_tokens"))
    cum = ids.global_cumsum(sized, [id_col], "n_tokens",
                            out_col="cum_tokens")
    return cum.select(
        id_col, "n_tokens", "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {int(shard_tokens)}")
        .alias("shard_id"))
