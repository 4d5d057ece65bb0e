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
_PRIORITY = [
    # --- permanent anchors (10): reference surface + the HUGEINT probes
    # (VERDICT r4 item 1 sanctioned rotating everything else; these stay
    # every round as regression tripwires for the flagship chain, the KV
    # projection path, corrupt routing, and the r2/r3 packing root cause)
    "daily_genre_kpis", "top_songs_per_genre", "top_genres_per_day",
    "kv_genre_kpi_items", "latest_day_kpis", "csv_scan_corrupt_routing",
    "pack_documents_512", "packing_stats_512",
    "pack_tokens_probe", "pack_offsets_probe",
    # --- round-5 rotation (40): first-ever driver rows, whole families
    # with zero driver history (VERDICT r4 item 1 list). Everything
    # rotated OUT is r1–r4 driver-green AND still full-oracle-checked
    # every round (ORACLE_FULL ledger).
    # NEW this round: the reference's main entry point as ONE unit
    "pipeline_e2e_kpis",
    # as-of / point-in-time / SCD / CDC family
    "asof_purchase_next_click", "purchase_state_pit",
    "orders_cdc_change_counts", "orders_merge_changelog",
    # OLAP lattice family
    "lineitem_grouping_sets", "orders_status_pivot",
    "lineitem_measures_long", "events_value_histogram",
    # funnel / retention family
    "funnel_user_stages", "user_cohort_retention", "user_interevent_stats",
    # stats family
    "events_value_moments", "events_value_anomalies",
    "events_value_percentiles", "user_value_trend",
    "orders_custkey_loo_price", "events_value_mad_outliers",
    "events_value_ntile",
    # the remaining never-validated TPC-H shapes
    "tpch_q2_min_cost_supplier", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q11_important_stock", "tpch_q12_late_shipments",
    "tpch_q13_customer_order_counts", "tpch_q14_promo_share",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q19_discounted_revenue", "tpch_q20_dominant_suppliers",
    "tpch_q22_global_sales_opportunity",
    # SQL surface + audits
    "regional_revenue", "fk_orphans_audit", "sql_nation_revenue",
    # text/LM counting family
    "doc_term_stats", "bigram_lm_counts", "kn_continuation_counts",
    "token_cooccur_assoc",
    # deterministic weighted sampling
    "weighted_sample_docs",
]


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
