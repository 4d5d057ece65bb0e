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
    # (VERDICT r4 item 1 sanctioned rotating everything else). Round 7
    # trims the four packing probes to ONE — the r2/r3 HUGEINT root
    # cause they guarded is now also caught statically by
    # tools/oracle_check.py's HUGEINT-oracle rejection, so a single
    # packing anchor suffices and three window slots go to first-time
    # rotation rows (VERDICT r6 item 1: debt is the only gap).
    # top_genres_per_day (W2, six driver-green rounds) also rotates out
    # in favor of a first-time row — W1 keeps the top-k window shape
    # anchored.
    # --- round-7 rotation (44): first-ever driver rows. Everything
    # rotated OUT is r1–r6 driver-green AND still full-oracle-checked
    # every round (ORACLE_FULL ledger). Debt after this window: 70.
    # The new ANN recall certification goes first:
    "ann_recall_eval",
    # interval / window / sequence shapes
    "purchase_click_interval", "events_hopping_counts",
    "events_windowed_dense", "user_activity_spans",
    "user_activity_coverage", "events_user_decay_score",
    "event_transition_matrix", "events_daily_agg_incremental",
    # dedup / near-dup family (incremental + eval + verify paths)
    "dedup_incremental_new_docs", "neardup_minhash_incremental",
    "neardup_minhash_eval", "neardup_bow_cosine_pairs",
    "neardup_edit_verified", "media_dedup_by_payload",
    "corpus_build_transitive", "repetition_gate_docs",
    "shared_ngram_pairs_docs",
    # corpus curation / packing / sampling
    "chunk_documents_32", "curation_funnel_report",
    "pack_sequences_manifest", "sample_docs_per_source",
    "mixture_sample_docs", "epoch_shuffle_docs", "vocab_coverage",
    # retrieval / text
    "docs_conjunctive_search", "docs_phrase_search",
    "part_name_canonical", "embedding_nearest_seed_assign",
    # analytics shapes (assoc rules, graph counts, skew, profiles)
    "part_association_rules", "part_triangle_counts",
    "orders_by_nation_salted", "events_profile",
    "views_vs_purchases_daily", "events_value_winsorized",
    "events_value_equidepth", "customer_lorenz_deciles",
    # sources / formats
    "parquet_schema_evolution", "orc_scan_roundtrip",
    # streaming executions (gate-certified vs batch oracles)
    "pipeline_stream_e2e_kpis", "events_enriched_streamed",
    # engine-semantics audits (two never-validated probes plus the
    # round-7 cast/coercion audit)
    "null_semantics_audit", "decimal_semantics_audit",
    "cast_semantics_audit",
]

# Round-8 rotation plan (for continuity): 70 registry queries have never
# held a driver row (tools/oracle_check.py ledger). 51 are SQL-backed —
# two more 44-row windows retire them all; prioritize the remaining
# seven semantics audits, the tokenizer-training replays
# (bpe_merge_table / unigram_piece_table / doc_*_stats), the linfit /
# search / skyline analytics, and the promoted media_resize_real /
# media_decode_features_real. The 19 rows-only entries (sketches,
# float-iterative, ANN variants) should also cycle through for their
# weaker rows-only driver checks once the SQL-backed debt is retired.


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
