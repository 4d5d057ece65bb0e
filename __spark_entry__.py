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
    # --- round-8 rotation (44): first-ever driver rows, every one.
    # Everything rotated OUT is r1–r7 driver-green AND still
    # full-oracle-checked every round (ORACLE_FULL ledger). The two
    # round-8 agreement-eval anchors (VERDICT r7 item 5) go first so
    # they certify in their birth round like ann_recall_eval did:
    "semdedup_agreement_eval", "kmeans_assign_agreement_eval",
    # the eight remaining engine-semantics audits
    "string_semantics_audit", "datetime_semantics_audit",
    "aggregate_semantics_audit", "window_semantics_audit",
    "json_semantics_audit", "regex_semantics_audit",
    "array_semantics_audit", "map_semantics_audit",
    # linfit / forecast-adjacent analytics
    "events_value_linfit", "events_value_linfit_residuals",
    "events_value_linfit_by_type", "events_test_zscore_trainfit",
    "events_value_drift_periods",
    # gapfill / skyline / concurrency / profile shapes
    "user_daily_value_gapfill", "part_price_size_skyline",
    "events_concurrency_histogram", "events_concurrency_histogram_scaled",
    "user_series_similarity_topk", "order_qty_hof_stats",
    # graph family
    "part_clustering_coeff", "part_bfs_hops", "part_order_kcore",
    "part_degree_histogram",
    # multimodal (incl. the two r7 oracle-exact promotions)
    "media_decode_features_real", "media_resize_real",
    "media_audio_loudness",
    # tokenizer-training replay oracles + doc stats
    "bpe_merge_table", "bpe_initial_pair_counts", "doc_bpe_stats",
    "unigram_piece_table", "unigram_candidate_pieces",
    "doc_unigram_stats", "shard_docs_equal_tokens",
    # retrieval / text corpus structures
    "docs_vocab_index", "docs_term_matrix_sparse", "docs_sentence_stats",
    "docs_ngram_novelty", "docs_curriculum_deciles",
    # audits + decimal fact-scale anchor
    "docs_source_lang_fd_audit", "events_key_candidates_audit",
    "events_t_closeness_audit", "lineitem_decimal_revenue",
]

# Round-9 rotation plan (for continuity): after this window the
# never-driver-validated ledger is 28 — 12 SQL-backed
# (part_pair_support, doc_token_cms, doc_token_cms_estimates,
# customer_bloom_prune, corpus_drift_report, contrastive_negatives_docs,
# source_overlap_prefixes, source_lang_gini, part_neighbors_topk,
# purchase_touch_attribution, events_seasonal_naive_backtest,
# source_dup_attribution) + 16 rows-only entries (sketches,
# float-iterative kmeans/semdedup/pagerank, ANN variants, tfidf/bm25/LM,
# dsir, diversity sampling) that get the weaker rows-only driver check.
# One 28-row window retires the whole ledger.


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
