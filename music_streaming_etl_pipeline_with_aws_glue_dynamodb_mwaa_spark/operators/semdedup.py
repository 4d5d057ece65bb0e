"""SemDeDup — semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
cluster the embedding space, then deduplicate only WITHIN clusters, where
near-identical pairs overwhelmingly live.

Exact cosine near-dup over a corpus is O(n²) flops
(``dedup.embedding_near_dup_pairs_blocked`` — fine when you truly need every
pair). SemDeDup's observation: semantic duplicates are near their shared
cluster centroid, so restricting the pair search to k-means cells turns the
cost into Σ|cell|² ≈ n²/k — a k-fold flop cut, and each cell is one bounded
task. The trade (documented, inherent): a pair straddling a cell boundary is
missed; recall vs the exact operator is measured in tests/test_semdedup.py.

Spark-first shape:

1. codebook: ``kmeans.kmeans_fit`` — bounded-sample init + distributed
   Lloyd, only k·d floats ever reach the driver;
2. assign: one Arrow-batched matmul pass, NO shuffle;
3. within-cell pairs: ``groupBy(cluster).applyInPandas`` — one shuffle
   keyed by cluster id, one BLAS matmul per cell, emit pairs ≥ threshold;
4. prune: keep the LOWEST doc id of each pair's cluster-local dup graph
   (greedy drop-higher-id — same deterministic rule as corpus.build_corpus).

Float matmul scores → rows-only registration; determinism, soundness
(every dropped row has a kept near-dup witness) and recall vs the exact
pair set are pytest-pinned.

At 100 TB: cell sizes are the skew knob — raise k until the largest cell's
matmul fits a task (the paper runs k≈10⁵ for web-scale); a mega-cell means
the codebook under-fits, not that the operator needs a new shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kmeans as _kmeans


def semantic_dup_pairs(emb: DataFrame, *, id_col: str = "vec_id",
                       vec_col: str = "embedding", k: int = 8,
                       threshold: float = 0.95,
                       centroids: np.ndarray | None = None) -> DataFrame:
    """Within-cluster cosine pairs ≥ threshold: (doc_a, doc_b, cosine,
    cluster_id), doc_a < doc_b. Cost: one assign pass + one cluster-keyed
    shuffle + per-cell matmuls."""
    if centroids is None:
        centroids = _kmeans.kmeans_fit(emb, vec_col, k=k)
    assigned = (_kmeans.kmeans_assign(emb, centroids, id_col=id_col,
                                      vec_col=vec_col)
                .select(id_col, "cluster_id")
                .join(emb.select(id_col, vec_col), id_col))

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [],
                                 "cosine": [], "cluster_id": []})
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, 1))
        ids = pdf[id_col].to_numpy()
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({
            "doc_a": lo, "doc_b": hi, "cosine": sims[ia, ib],
            "cluster_id": np.full(len(lo), pdf["cluster_id"].iat[0])})

    id_type = dict(emb.dtypes)[id_col]
    return (assigned.groupBy("cluster_id")
            .applyInPandas(cell_pairs,
                           f"doc_a {id_type}, doc_b {id_type}, "
                           f"cosine double, cluster_id int"))


def semantic_dedup(emb: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 8,
                   threshold: float = 0.95) -> DataFrame:
    """Surviving rows after SemDeDup pruning: for every within-cluster pair
    ≥ threshold, the higher id drops (greedy, deterministic, one anti-join).
    Returns the input columns of the survivors."""
    losers = (semantic_dup_pairs(emb, id_col=id_col, vec_col=vec_col, k=k,
                                 threshold=threshold)
              .select(F.col("doc_b").alias(id_col)).distinct())
    return emb.join(losers, id_col, "left_anti")
