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
    # --- round-12 rotation: STALENESS PASS (VERDICT r11 item 6).
    # No new/promoted queries this round, so all 44 fill slots go to the
    # registry queries whose LAST driver row is oldest: the 9 remaining
    # r4-era rows plus 35 of the 39 r5-era rows (alphabetical within
    # round). The 4 r5 stragglers that don't fit the 50-window
    # (user_cohort_retention, user_interevent_stats, user_value_trend,
    # weighted_sample_docs) lead the r13 rotation; min last-validated
    # then rises r5 -> r6.
    # r4-era fill (9): tpch tails + splits/audits
    "source_token_cap_docs", "split_leakage_audit",
    "tpch_q17_small_quantity_revenue", "tpch_q1_pricing_summary",
    "tpch_q21_waiting_supplier", "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit", "union_by_name_evolution",
    "user_spend_gini",
    # r5-era fill (35): stats family + remaining tpch + lm/text batch
    "asof_purchase_next_click", "bigram_lm_counts", "doc_term_stats",
    "events_value_anomalies", "events_value_histogram",
    "events_value_mad_outliers", "events_value_moments",
    "events_value_ntile", "events_value_percentiles",
    "fk_orphans_audit", "funnel_user_stages", "kn_continuation_counts",
    "lineitem_grouping_sets", "lineitem_measures_long",
    "orders_cdc_change_counts", "orders_custkey_loo_price",
    "orders_merge_changelog", "orders_status_pivot",
    "purchase_state_pit", "regional_revenue", "sql_nation_revenue",
    "token_cooccur_assoc", "tpch_q11_important_stock",
    "tpch_q12_late_shipments", "tpch_q13_customer_order_counts",
    "tpch_q14_promo_share", "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts", "tpch_q19_discounted_revenue",
    "tpch_q20_dominant_suppliers", "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
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
