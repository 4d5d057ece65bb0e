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
    # --- round-13 rotation: STALENESS PASS (continuing the r12 plan).
    # No new/promoted queries this round, so all 44 fill slots go to the
    # registry queries whose LAST driver row is oldest: the 4 r5-era
    # stragglers the r12 window couldn't fit, plus 40 of the 43 r6-era
    # rows (alphabetical within round). The 3 r6 stragglers
    # (user_modal_event_type, vocab_growth_curve, weekly_top10_churn)
    # lead the r14 rotation; min last-validated then rises r6 -> r7.
    # r5-era stragglers (4):
    "user_cohort_retention", "user_interevent_stats", "user_value_trend",
    "weighted_sample_docs",
    # r6-era fill (40): stats/eval batch + packing + transcripts
    "ab_purchase_ks", "ab_purchase_welch_t", "classifier_auc",
    "classifier_calibration_bins", "classifier_eval_metrics",
    "customer_cohort_ltv", "customer_rfm_segments", "doc_lm_count_core",
    "docs_kfold_assign", "docs_kfold_stats", "docs_quality_rank_corr",
    "embedding_signbit_signatures", "event_type_user_overlap_kmv",
    "events_cusum_by_type", "events_daily_count_dispersion",
    "events_k_anonymity_audit", "events_k_anonymity_summary",
    "events_temporal_split", "events_type_dow_independence",
    "events_user_bottomk_sample", "events_value_autocorrelation",
    "lineitem_weighted_median_qty", "monthly_new_vs_returning",
    "nation_share_of_region", "neardup_embedding_signbit_pairs",
    "orders_benford_digits", "orders_revenue_8020", "pack_offsets_probe",
    "pack_tokens_probe", "packing_stats_512", "part_abc_classes",
    "session_transcripts", "source_minhash_signature_rollup",
    "source_minhash_similarity", "temporal_split_user_leakage",
    "top_songs_per_genre_ties", "top_user_paths",
    "transcript_pattern_counts", "user_daily_ohlc", "user_event_streaks",
]

# Rotation plan (for continuity): with the never-validated ledger
# retired in r9, the window's job is STALENESS coverage — each round
# re-validates the ~44 queries whose last driver row is oldest, so every
# registry entry gets re-certified on a ~6-round cadence. New or
# newly-promoted queries always take window slots in their birth round.


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
