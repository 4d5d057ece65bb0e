"""Physical-plan regression tests: the scale posture (SURVEY.md §4) must be
visible in the executed plan, not just intended.

These read ``explain()`` output — brittle across Spark majors by nature, but
that's the point: if an upgrade or refactor silently turns a broadcast join
into a sort-merge join or un-pushes a filter, correctness tests stay green
while the 100 TB plan rots. These fail instead.
"""

from __future__ import annotations

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import queries_reference as qr
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import queries_extensions as qe  # noqa: F401

from .conftest import SF_SMOKE


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def q(name):
    return qr.REGISTRY[name][0]


def test_filter_and_projection_pushed_to_scan(spark):
    plan = _executed(q("scan_project_filter")(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(p_size), LessThan(p_size,15)]" in plan
    # ReadSchema carries only the projected columns — no full-row scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_partkey" in read_schema and "p_brand" not in read_schema


def test_flagship_join_is_broadcast_with_partial_agg(spark):
    plan = _executed(q("daily_genre_kpis")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan          # fact side must not shuffle for the join
    assert plan.count("HashAggregate") >= 2     # partial + final (map-side combine)


def test_approx_variant_avoids_distinct_expand(spark):
    """The ENGINE-NATIVE approx path (approx_count_distinct) drops the
    exact countDistinct's extra shuffle round; the REGISTERED query
    moved to the portable register-table HLL in round 11 (oracle-exact),
    whose plan is checked separately below."""
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
    streams = catalog.streams_from_lineitem(
        catalog.load_table(spark, SF_SMOKE, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, SF_SMOKE, "part"))
    exact = _executed(q("daily_genre_kpis")(spark, SF_SMOKE))
    approx = _executed(kpi.genre_kpi_pipeline(streams, songs, approx=True))
    assert exact.count("Exchange") > approx.count("Exchange")


def test_portable_hll_kpi_plan_shape(spark):
    """The registered portable-HLL approx KPI: the linear-counting
    literal table joins BROADCAST (never shuffles the aggregate), and no
    distinct Expand appears anywhere — the register pipeline is plain
    hash aggregation."""
    plan = _executed(q("daily_genre_kpis_approx")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "Expand" not in plan


def test_topk_uses_window_group_limit(spark):
    plan = _executed(q("top_songs_per_genre")(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


def test_validation_split_is_two_filters_no_join(spark):
    good = _optimized(q("validate_split_good")(spark, SF_SMOKE))
    bad = _optimized(q("validate_split_bad")(spark, SF_SMOKE))
    for plan in (good, bad):
        assert "Join" not in plan               # never an except/anti-join
        assert "Exchange" not in plan           # map-side only: no shuffle at all


def test_ann_query_set_is_broadcast(spark):
    # extension queries register into the shared registry in queries_reference
    plan = _executed(q("ann_cosine_topk")(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_jaccard_candidates_are_equi_joins_only(spark):
    """Near-dup candidate generation must never degrade to a cross join."""
    plan = _executed(q("neardup_jaccard_pairs")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_single_shuffle_two_windows(spark):
    """lag + running-sum share one (user) partitioning: the exchange must be
    planned once, both Window passes downstream of it."""
    plan = _executed(q("sessionize_events")(spark, SF_SMOKE))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") >= 2


def test_corpus_build_no_cartesian(spark):
    plan = _executed(q("corpus_build")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_embedding_runs_grouped_pandas(spark):
    """The blocked all-pairs path must be a grouped-map pandas exec over an
    equi-join replication, not a cross join of vectors."""
    plan = _executed(q("neardup_embedding_pairs_blocked")(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_hash_split_and_sample_are_map_side_only(spark):
    """Deterministic split/sample must be pure projection/filter over the
    scan — zero shuffles, zero joins (the whole point vs sampleBy)."""
    for name in ("hash_split_assign", "stratified_sample_docs"):
        plan = _executed(q(name)(spark, SF_SMOKE))
        assert "Exchange" not in plan, name
        assert "Join" not in plan, name


def test_packing_is_single_shuffle_window(spark):
    """Concat-and-chunk packing = one hash exchange on the group column
    feeding the cumsum window; no joins."""
    plan = _executed(q("pack_documents_512")(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_decontam_benchmark_side_is_broadcast(spark):
    """The corpus side must meet the (small) benchmark via a broadcast hash
    join on the shingle — the corpus never shuffles for candidate
    generation."""
    plan = _executed(q("decontam_pairs")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quantize_is_projection_only(spark):
    plan = _executed(q("embedding_quantize_int8")(spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_redact_and_normalize_are_projection_only(spark):
    for name in ("normalize_text_docs", "redact_pii_docs"):
        plan = _executed(q(name)(spark, SF_SMOKE))
        assert "Exchange" not in plan, name
        assert "Join" not in plan, name


def test_asof_is_single_shuffle_no_join(spark):
    """The as-of union+window plan: the ONLY exchanges are the user_id hash
    partitionings (left+right union, and the clicks-dedup window shares
    the same key), and no join operator exists anywhere — that's the
    entire point vs a range-condition join (which Spark would plan as
    BroadcastNestedLoop)."""
    for name in ("asof_purchase_click", "asof_purchase_next_click"):
        plan = _executed(q(name)(spark, SF_SMOKE))
        assert "Join" not in plan, name
        assert "CartesianProduct" not in plan, name
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "user_id" in line, (name, line)


def test_bm25_topk_no_global_sort(spark):
    """Global top-k must be TakeOrderedAndProject (per-partition heap +
    k-row driver merge), never a full Sort+Exchange(rangepartitioning)."""
    plan = _executed(q("bm25_topk")(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_doc_term_stats_reuses_postings(spark):
    """dl and df re-aggregate the collapsed tf table — the raw text is
    exploded exactly once in the plan."""
    plan = _executed(q("doc_term_stats")(spark, SF_SMOKE))
    assert plan.count("Generate explode") == 0      # behind the checkpoint
    assert plan.count("Scan ExistingRDD") >= 1      # ...computed exactly once


def test_range_join_is_hash_join_not_bnlj(spark):
    """The band interval join must plan as a binned equi-join — never
    BroadcastNestedLoop/Cartesian (what a raw range predicate becomes)."""
    plan = _executed(q("events_value_bands")(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_regional_revenue_dims_broadcast_date_pushed(spark):
    plan = _executed(q("regional_revenue")(spark, SF_SMOKE))
    # nation + region broadcast; the date filter reaches the orders scan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or \
           "GreaterThanOrEqual(o_orderdate" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_no_cartesian(spark):
    plan = _executed(q("part_name_fuzzy_pairs")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_upsert_single_shuffle_group_limit(spark):
    plan = _executed(q("orders_merge_upsert")(spark, SF_SMOKE))
    # union + rank-1 window: one exchange, WindowGroupLimit pushdown, no join
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_tpch_q3_topk_no_global_sort(spark):
    plan = _executed(q("tpch_q3_shipping_priority")(spark, SF_SMOKE))
    # limit folds into the sort: TakeOrderedAndProject, no full Sort stage
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan          # segment dim broadcast
    # both date filters reach the parquet scans
    assert plan.count("PushedFilters: [") >= 2


def test_tpch_q4_exists_is_semi_join(spark):
    plan = _executed(q("tpch_q4_order_priority")(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q10_star_broadcast_dims(spark):
    plan = _executed(q("tpch_q10_returned_items")(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan          # nation broadcast


def test_domain_cap_is_single_exchange(spark):
    """cap_tokens_per_group: one hash exchange (by source) feeds the window
    cumsum; no join, no second shuffle."""
    plan = _executed(q("source_token_cap_docs")(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_mixture_apply_is_broadcast_and_corpus_never_shuffles(spark):
    """mixture_schedule: the k-row plan broadcasts; the corpus side must
    not hit a sort-merge join or shuffle for the apply."""
    plan = _executed(q("mixture_sample_docs")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_classifier_is_two_scans_one_broadcast(spark):
    """Quality classifier: the width-row weight frame must broadcast into
    the apply join (never a shuffled join of the token stream against
    weights), and no cartesian anywhere."""
    plan = _executed(q("doc_quality_classifier")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_containment_candidates_are_equi_joins_only(spark):
    plan = _executed(q("neardup_containment_pairs")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_stats_no_key_exchange(spark):
    """The in-row formulation never shuffles on a key (the only allowed
    exchange is the adaptive round-robin split of an under-partitioned
    scan) and never joins or aggregates."""
    plan = _executed(q("doc_repetition_stats")(spark, SF_SMOKE))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Aggregate" not in plan


def test_session_window_single_exchange(spark):
    """Session windows: one hash exchange on the user key, no join."""
    plan = _executed(q("events_session_windows")(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan


def test_q18_aggregates_before_joins(spark):
    """Q18 shape: the HAVING aggregate must sit BELOW the joins (only
    qualifying orderkeys join), and the final top-k must be
    TakeOrderedAndProject, not a global sort."""
    plan = _executed(q("tpch_q18_large_orders")(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    agg_pos = plan.index("HashAggregate")
    join_pos = plan.index("Join")
    assert join_pos < agg_pos  # joins appear ABOVE the aggregate in the tree


def test_q21_exists_chain_is_semi_anti_hash_joins(spark):
    plan = _executed(q("tpch_q21_waiting_supplier")(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q22_threshold_is_broadcast_scalar(spark):
    """The global-average threshold must reach the filter as a broadcast
    1-row aggregate, and the no-recent-orders predicate as a LEFT ANTI."""
    plan = _executed(q("tpch_q22_global_sales_opportunity")(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_phrase_search_is_join_free(spark):
    """Inlined phrase literals: the whole search is explode+filter inside
    codegen — no join operator of any kind."""
    plan = _executed(q("docs_phrase_search")(spark, SF_SMOKE))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Generate explode" in plan


def test_signbit_pairs_no_cartesian(spark):
    """Multi-index Hamming blocking: candidates come from the postings
    equi-join — never an all-pairs product."""
    plan = _executed(q("neardup_embedding_signbit_pairs")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_term_matrix_vocab_is_broadcast(spark):
    """The vocabulary index joins the tf table as a broadcast — the big
    (doc, term) side never reshuffles for the dictionary lookup."""
    plan = _executed(q("docs_term_matrix_sparse")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ohlc_single_aggregate_no_window(spark):
    """OHLC via struct min/max: one hash aggregate, zero window operators,
    zero joins."""
    plan = _executed(q("user_daily_ohlc")(spark, SF_SMOKE))
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


# ------------------------------------------------- round-5 batch 2/3 ---

def test_cf_topk_and_mode_use_window_group_limit(spark):
    # rank-≤-k filters must collapse to per-key bounded state, not a
    # full sort of every neighbor/value list
    for name in ("part_neighbors_topk", "user_modal_event_type",
                 "lineitem_weighted_median_qty", "events_cusum_by_type"):
        plan = _executed(q(name)(spark, SF_SMOKE))
        assert "WindowGroupLimit" in plan, name


def test_skyline_has_no_quadratic_join(spark):
    # the operator is the prefix-max rewrite; only the oracle is O(n²)
    plan = _executed(q("part_price_size_skyline")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan       # threshold table broadcast


def test_gapfill_single_key_exchange(spark):
    # grid explode, left join, and both LOCF/NOCB windows must ride ONE
    # user-keyed exchange: hashpartitioning(user_id) appears exactly once
    plan = _executed(q("user_daily_value_gapfill")(spark, SF_SMOKE))
    import re
    keys = re.findall(r"hashpartitioning\(([^,]+)", plan)
    assert all(k.startswith("user_id") for k in keys), keys


def test_welch_is_single_pass_partial_agg(spark):
    # one map-combinable aggregation: partial + final, no join, no window
    plan = _executed(q("ab_purchase_welch_t")(spark, SF_SMOKE))
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan and "Window" not in plan
