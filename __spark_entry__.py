"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark``;
this module only wires operators to the driver contract. Hash-parity
convention for computed doubles: NEVER ROUND them — Spark rounds decimal
strings HALF_UP while DuckDB rounds binary doubles, and they disagree at .5
boundaries. Instead every registered query computes exact integer measures
and derives at most ONE IEEE division (bit-identical across engines); ranks
get deterministic tie-breaks mirrored in the oracle (SURVEY.md §2.5,
.claude/skills/verify/SKILL.md gotchas).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import (
    queries_extensions,  # noqa: F401  (imports populate the shared registry)
    queries_reference,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.2) on /root/testdata/sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, sf_dir, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, sf_dir, "part"))
    return kpi.genre_kpi_pipeline(streams, songs)


# The driver's correctness gate samples the FIRST 50 registry entries, so
# ordering is load-bearing: the reference surface (SURVEY.md §2) goes first,
# then one representative per extension family — prioritizing operators that
# have not yet received a driver correctness row (round-2 additions) and the
# queries whose projections were fixed this round. Everything else keeps its
# definition order after the priority block; ALL entries are continuously
# self-checked by tools/oracle_check.py (see ORACLE_FULL_r04.txt).
# Permanent anchors — the reference-surface regression tripwires that
# hold a window slot EVERY round. bench.py's compact stdout line reports
# exactly this set so the driver's cross-round diff always compares a
# stable per-query basis (rotation rows churn by design).
_ANCHORS = [
    "daily_genre_kpis", "top_songs_per_genre",
    "kv_genre_kpi_items", "latest_day_kpis", "csv_scan_corrupt_routing",
    "pack_documents_512",
]

_PRIORITY = _ANCHORS + [
    # --- permanent anchors (6, _ANCHORS above): reference surface tripwires
    # (VERDICT r4 item 1 sanctioned rotating everything else).
    # --- round-9 rotation: DEBT ZERO (VERDICT r8 items 1-2). The strict
    # ledger (rows_match=True rows only — `err: no_oracle` placeholders
    # don't count) shows exactly 35 registry queries that never held a
    # genuine driver comparison; ALL 35 rotate in below, so after this
    # window every query in the registry has been driver-validated.
    # The two round-9 agreement evals go first (certify in their birth
    # round, like ann_recall_eval / the r8 evals did):
    "pagerank_agreement_eval", "lexical_rank_agreement_eval",
    # the 14 SQL-backed debt queries (incl. the five r1/r2 `no_oracle`
    # placeholders promoted to oracle-exact in r4 whose hashes the
    # driver has never actually confirmed — the r8 VERDICT's worst case)
    "neardup_minhash_pairs", "neardup_simhash_pairs",
    "part_pair_support", "doc_token_cms", "doc_token_cms_estimates",
    "customer_bloom_prune", "corpus_drift_report",
    "contrastive_negatives_docs", "source_overlap_prefixes",
    "source_lang_gini", "part_neighbors_topk",
    "purchase_touch_attribution", "events_seasonal_naive_backtest",
    "source_dup_attribution",
    # the 21 rows-only-by-nature debt queries (driver certifies
    # rows+schema; each family's exact core is anchored by a ★ eval —
    # ann_recall_eval, semdedup/kmeans/pagerank/lexical agreement evals,
    # doc_lm_count_table, sketch pytest parity)
    "daily_genre_kpis_approx", "neardup_embedding_pairs_blocked",
    "ann_cosine_topk_lsh", "ann_cosine_topk_ivf", "ann_cosine_topk_sq8",
    "ann_cosine_topk_pq", "ann_cosine_topk_jl",
    "tfidf_top_terms", "bm25_topk", "doc_lm_quality",
    "embedding_kmeans_assign", "embedding_kmeans_sizes",
    "embedding_label_centroids", "semantic_dedup_survivors",
    "part_order_pagerank",
    "events_profile_approx", "events_value_percentiles_approx",
    "events_daily_users_sketch", "events_monthly_users_sketch_rollup",
    "dsir_doc_weights", "diversity_sample_docs",
    # 7 re-validation slots: W2 re-anchors (VERDICT r8 item 1 sanctioned
    # the room) + reference-surface set-op / validate / KV / e2e
    # tripwires that last held driver rows in early rounds
    "top_genres_per_day", "validate_split_good", "validate_split_bad",
    "users_view_and_purchase", "users_view_not_purchase",
    "kv_top_song_items", "pipeline_e2e_kpis",
]

# Round-9 rotation plan (for continuity): this window retires the
# ENTIRE never-genuinely-driver-validated ledger (strict counting:
# 272/307 before, 307/309 after — the two r9 evals are new and rotate
# in with it). From round 10 on, all 50 slots are free for anchors +
# regression re-validation; there is no debt left to schedule.


def _registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    src = queries_reference.REGISTRY
    reg: dict = {}
    for name in _PRIORITY:
        if name in src:
            reg[name] = src[name]
    for name, item in src.items():
        if name not in reg:
            reg[name] = item
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """Static SQL strings pass through; CALLABLE entries are replay-oracle
    builders (operators/pyref.py — deterministic pure-Python re-execution
    of iterative tokenizer training, serialized to a VALUES table) and are
    resolved here, lazily. A builder failure downgrades that one query to
    rows-only instead of breaking the whole oracle map — but NEVER
    silently (round-5 ADVICE): the degradation is named on stderr so a
    pyref regression or a missing testdata dir is distinguishable from
    by-design rows-only in the gate output."""
    import sys

    out: dict[str, str] = {}
    for name, (_, sql) in _registry().items():
        if sql is None:
            continue
        if callable(sql):
            try:
                out[name] = sql()
            except Exception as e:  # noqa: BLE001 — degrade ONE query, loudly
                print(f"[oracle_sql] WARNING: replay-oracle builder for "
                      f"{name!r} failed ({type(e).__name__}: {e}) — "
                      f"downgrading to rows-only", file=sys.stderr)
                continue
        else:
            out[name] = sql
    return out
