"""Feature-hashed linear document classifier (fastText-style quality
filter) — train-then-apply entirely inside the engine, oracle-exact.

The canonical corpus-curation move (GPT-3 / CCNet / fastText quality
filtering): label a slice of the corpus with a cheap proxy rule (here: any
boolean Column over the document row — reference quality, language, a
hand-curated seed set), train a linear model over HASHED token features,
then score every document and keep the positive margin. The reference has
no model surface at all (its "validation" is null checks,
``REF/glue_jobs/validate.py:40-41``); this is the extension-family
classifier the 100 TB mandate asks for.

Why a hashed LINEAR model and not logistic regression:

- feature hashing (Weinberger et al., ICML'09) makes the feature space a
  fixed ``width``-row table — no vocabulary build, no OOV, the weight
  table broadcasts at any corpus size;
- the weights here are the regularized class-conditional rate per bucket,
  computed in EXACT INTEGER arithmetic:
      w_b = ((pos_b + 1) * scale) div (pos_b + neg_b + 2) - scale/2
  i.e. a Laplace-smoothed P(positive | bucket) centered at zero and
  scaled to integers — a Naive-Bayes-flavored linear scorer whose every
  intermediate is a BIGINT, so scores hash bit-identically against a SQL
  oracle (the same engine-portability idiom as
  ``operators/sketches.py::_cms_bucket``; true float LR/SGD would be
  iteration-order-dependent and rows-only forever);
- the per-document margin is ONE integer sum over token occurrences plus
  at most one final IEEE division — deterministic under any partitioning.

Spark-first shape, both passes over the token stream stay declarative:

- TRAIN: explode tokens → md5 bucket (map-side expression) → ONE
  width-bounded groupBy (partial agg collapses to ≤ width rows per task
  regardless of corpus size) → width-row weight frame;
- APPLY: the weight frame is broadcast (width ≪ 2M rows); the token
  stream joins map-side and collapses with ONE doc-keyed groupBy-sum.
  Nothing fact-sized is ever collected or shuffled twice on the same key.

At 100 TB: training over the full corpus is two fact scans; when one is
too many, pass a deterministically sampled ``train`` frame (e.g.
``sampling.hash_split`` slice) — the apply pass is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens

#: integer weight scale: w_b ∈ [-scale/2, scale/2]. 1e6 keeps the margin
#: sum for a 10^9-token document inside int64 with 10^3 headroom.
SCALE = 1_000_000


def _bucket(col: Column, width: int) -> Column:
    """Portable token bucket: first 8 md5 hex digits of 'q:<tok>' mod
    width. DuckDB mirror:
    ``(('0x' || substr(md5('q:' || tok), 1, 8))::BIGINT % width)``.
    The 'q:' seed decorrelates these buckets from the CMS family's
    ``tok:row`` keys."""
    h = F.md5(F.concat(F.lit("q:"), col))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(width))


def train_hashed_weights(train: DataFrame, label: Column, *,
                         text_col: str = "text",
                         width: int = 4096) -> DataFrame:
    """Per-bucket integer weights from a proxy-labeled training frame.

    Returns (bucket, w):
        w = ((pos_b+1)·SCALE) div (n_b+2) − ((POS+1)·SCALE) div (N+2)
    — the Laplace-smoothed positive rate of the bucket, centered at the
    CORPUS BASE RATE (not at ½: with an imbalanced prior, ½-centering
    drives every uninformative bucket to the majority sign and the
    margin gate collapses to the prior), all-BIGINT. Buckets absent from
    training score 0 via the apply-side left join — the base-rate prior.
    The base rate is a 1-row aggregate broadcast into the width-row
    weight projection.
    """
    toks = train.select(label.cast("boolean").alias("_label"),
                        F.explode(tokens(text_col)).alias("_tok")) \
                .select("_label", _bucket(F.col("_tok"), width)
                        .alias("bucket"))
    pos = F.sum(F.when(F.col("_label"), F.lit(1)).otherwise(F.lit(0)))
    n = F.count(F.lit(1))
    totals = toks.agg(((pos + 1) * F.lit(SCALE)).cast("long").alias("_tn"),
                      (n + 2).cast("long").alias("_td"))
    return (toks.groupBy("bucket")
            .agg(((pos + 1) * F.lit(SCALE)).cast("long").alias("_num"),
                 (n + 2).cast("long").alias("_den"))
            .crossJoin(F.broadcast(totals))
            .select("bucket",
                    (F.expr("_num div _den") - F.expr("_tn div _td"))
                    .alias("w")))


def score_docs(docs: DataFrame, weights: DataFrame, *,
               id_col: str = "doc_id", text_col: str = "text",
               width: int = 4096) -> DataFrame:
    """Score every document against a (bucket, w) weight frame.

    Returns (id, n_tokens, margin_num, margin, keep):
    margin_num = Σ_occurrences w[bucket(tok)] (exact int64, absent
    buckets contribute 0), margin = margin_num / (n_tokens · SCALE/2) —
    a ONE-IEEE-division normalization to ~[−2, 2] (how far above the
    corpus base rate the doc's average token runs), keep =
    margin_num > 0 (pure integer predicate — the gate is hash-exact
    even where doubles wouldn't be).
    """
    toks = docs.select(F.col(id_col).alias("_id"),
                       F.explode(tokens(text_col)).alias("_tok")) \
               .select("_id", _bucket(F.col("_tok"), width).alias("bucket"))
    scored = (toks.join(F.broadcast(weights), "bucket", "left")
              .groupBy("_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum(F.coalesce(F.col("w"), F.lit(0)))
                    .alias("margin_num")))
    return scored.select(
        F.col("_id").alias(id_col), "n_tokens", "margin_num",
        (F.col("margin_num").cast("double")
         / (F.col("n_tokens") * F.lit(SCALE // 2)).cast("double"))
        .alias("margin"),
        (F.col("margin_num") > 0).alias("keep"))


def quality_classifier(docs: DataFrame, label: Column, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       width: int = 4096,
                       train: DataFrame | None = None) -> DataFrame:
    """Train on ``train`` (default: the full corpus) with the proxy
    ``label``, score every document. Two fact scans total; pass a hash-
    sampled ``train`` slice to make the train pass sublinear at 100 TB."""
    w = train_hashed_weights(train if train is not None else docs, label,
                             text_col=text_col, width=width)
    return score_docs(docs, w, id_col=id_col, text_col=text_col,
                      width=width)
