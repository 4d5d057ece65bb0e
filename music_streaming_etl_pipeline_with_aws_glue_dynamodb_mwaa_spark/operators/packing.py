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
    w = (Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum(n_tok).over(w), F.lit(0).cast("long"))
    return docs.select(
        F.col(id_col),
        F.col(group_col),
        n_tok.alias("n_tokens"),
        offset.alias("token_offset"),
        F.floor(offset / F.lit(budget_tokens)).cast("long").alias("bin_idx"),
        F.pmod(offset, F.lit(budget_tokens)).cast("long").alias("bin_offset"),
    )


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
