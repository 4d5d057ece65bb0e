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
    # --- round-10 rotation: SECOND VALIDATION PASS (VERDICT r9 item 5).
    # Debt is zero except the two round-9-born evals (created after the
    # r9 window ran), which certify first; every other slot goes to the
    # registry queries whose LAST driver row is oldest (strict ledger:
    # r1-era 2, r2-era 20, r3-era fill) so the min last-validated-round
    # metric that tools/oracle_check.py now prints rises from 1 to 3+.
    "dsir_agreement_eval", "lm_quality_agreement_eval",
    # r10-born/promoted queries certify in their birth round:
    "media_png_decode", "events_value_percentiles_approx",
    # r1/r2-era (22): the original corpus/dedup/text/media/decontam batch
    "corpus_build", "session_stats",
    "decontam_doc_flags", "decontam_pairs",
    "dedup_cluster_reps", "dedup_clusters", "dedup_first_per_group",
    "doc_fingerprints", "hash_split_assign", "lang_id",
    "media_byte_stats", "media_frame_sample", "media_kind_stats",
    "neardup_embedding_pairs", "neardup_jaccard_pairs",
    "normalize_text_docs", "redact_pii_docs", "stratified_sample_docs",
    "text_quality", "text_stats", "token_counts_by_source",
    "winnow_fingerprints",
    # r3-era fill (20): events/lineitem analytics + media/asof/funnel
    "asof_purchase_click", "cluster_aware_split",
    "doc_quality_classifier", "doc_repetition_stats",
    "doc_token_heavy_hitters", "docs_global_row_numbers",
    "embedding_quantize_int8", "events_daily_agg",
    "events_props_extract", "events_session_windows",
    "events_unique_users_skew_robust", "events_user_rolling_7d",
    "events_value_bands", "events_windowed_counts",
    "funnel_conversion", "hybrid_rrf_topk", "jsonl_scan_roundtrip",
    "lineitem_agg_salted",
]

# Round-10 rotation plan (for continuity): with the never-validated
# ledger retired in r9, the window's job is now STALENESS coverage —
# each round re-validates the 44 queries whose last driver row is
# oldest, so every registry entry gets re-certified on a ~6-round
# cadence. New queries born in a round always take window slots in
# their birth round (here: the two r9-born agreement evals).


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
