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
    # --- round-11 rotation: STALENESS PASS (VERDICT r10 item 6).
    # The 4 queries promoted from rows-only to oracle-exact this round
    # (portable register-table HLL) certify in their birth round first;
    # the remaining 40 slots go to the registry queries whose LAST
    # driver row is oldest (14 r3-era + 26 r4-era), raising the
    # min last-validated-round metric from r3 to r5.
    "daily_genre_kpis_approx", "events_profile_approx",
    "events_daily_users_sketch", "events_monthly_users_sketch_rollup",
    # r3-era fill (14): lineitem/orders analytics + tpch + media
    "lineitem_qty_price_corr", "lineitem_rollup",
    "media_feature_extract", "media_resize_stamped",
    "neardup_containment_pairs", "orders_cdc_apply",
    "orders_merge_upsert", "orders_quality_report", "orders_table_diff",
    "tpch_q10_returned_items", "tpch_q18_large_orders",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "user_state_history",
    # r4-era fill (26): streaming + table-format + scan/session batch
    "adaptive_quality_topk", "ann_cosine_topk", "corpus_data_card",
    "csv_scan_roundtrip", "dedup_exact_text", "doc_tokens_udtf",
    "docs_clean_boilerplate", "docs_remove_dup_spans",
    "events_closed_sessions_streamed", "events_distinct_users_streamed",
    "events_wau_sliding_7d", "events_windowed_counts_streamed",
    "events_zorder_keys", "jsonl_scan_corrupt_routing",
    "kv_top_genre_items", "kvstore_read_genre_kpis",
    "mixture_plan_budget", "mixture_plan_temperature", "orders_cube",
    "orders_join_view_refresh", "orders_snapshot_changes",
    "orders_time_travel_v1", "part_name_fuzzy_pairs",
    "purchase_click_interval_streamed", "scan_project_filter",
    "sessionize_events",
]

# Rotation plan (for continuity): with the never-validated ledger
# retired in r9, the window's job is STALENESS coverage — each round
# re-validates the ~40 queries whose last driver row is oldest, so every
# registry entry gets re-certified on a ~6-round cadence. New or
# newly-promoted queries always take window slots in their birth round
# (here: the four portable-HLL promotions).


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
