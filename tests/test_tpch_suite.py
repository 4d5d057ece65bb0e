"""Round-3 additions: full TPC-H suite plan shapes, hybrid RRF fusion,
JSONL scan contract. Correctness is oracle-gated (tools/oracle_check.py);
these pin the SCALE-relevant plan properties and the operator semantics
the oracle can't see."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import queries_reference as qr
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import queries_extensions as qe  # noqa: F401
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import ranking

from .conftest import SF_SMOKE


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def q(name):
    return qr.REGISTRY[name][0]


# -- TPC-H plan shapes ------------------------------------------------------

def test_q5_region_dim_broadcast_no_cartesian(spark):
    plan = _executed(q("tpch_q5_local_supplier_volume")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # year filter reaches the orders scan as a pushed (non-empty) filter
    assert re.search(
        r"PushedFilters: \[[^\]]*o_orderdate", plan)


def test_q6_scan_only_no_join_no_shuffle_agg_input(spark):
    plan = _executed(q("tpch_q6_forecast_revenue")(spark, SF_SMOKE))
    assert "Join" not in plan
    # all three predicates pushed at least partially into the scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan and "l_quantity" in plan


def test_q7_nation_pair_prefilters_before_join(spark):
    plan = _executed(q("tpch_q7_volume_shipping")(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the 2-nation universe filter reaches the nation scan, not post-join
    assert re.search(r"PushedFilters: \[[^\]]*n_name", plan)


def test_q8_share_single_agg_pass(spark):
    df = q("tpch_q8_market_share")(spark, SF_SMOKE)
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    # numerator and denominator in ONE aggregate: only one agg over the
    # joined fact (partial+final pairs count as the same grouping)
    rows = df.collect()
    for r in rows:
        assert 0 <= r["nation_cbp"] <= r["total_cbp"]


def test_q13_left_join_survives_zero_order_customers(spark):
    df = q("tpch_q13_customer_order_counts")(spark, SF_SMOKE)
    dist = {r["c_count"]: r["custdist"] for r in df.collect()}
    # LEFT-join semantics: every customer appears in exactly one bucket
    # (an inner join would drop customers with no qualifying orders), and
    # the 0 bucket holds exactly the customers with none — computed from
    # the data so the assertion binds at any scale factor
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
    c = catalog.load_table(spark, SF_SMOKE, "customer")
    o = catalog.load_table(spark, SF_SMOKE, "orders") \
        .filter(F.col("o_orderpriority") != "1-URGENT")
    n_cust = c.count()
    n_with = c.join(o, c["c_custkey"] == o["o_custkey"],
                    "left_semi").count()
    assert sum(dist.values()) == n_cust
    assert dist.get(0, 0) == n_cust - n_with


def test_q15_revenue_view_evaluates_once(spark):
    df = q("tpch_q15_top_supplier")(spark, SF_SMOKE)
    plan = _executed(df)
    # persisted view: the lineitem scan feeds BOTH the max and the filter
    # through InMemoryTableScan, not two parquet scans
    assert plan.count("InMemoryTableScan") >= 1 or \
        plan.count("Scan parquet") <= 1
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_cbp"] for r in rows}) == 1  # all tie at the max


def test_q17_decorrelated_no_rescan_per_row(spark):
    plan = _executed(q("tpch_q17_small_quantity_revenue")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunction_derives_single_side_pushdowns(spark):
    plan = _executed(q("tpch_q19_discounted_revenue")(spark, SF_SMOKE))
    # the quantity envelope [1,30] reaches the lineitem scan as a pushed
    # filter even though the full predicate is an OR across tables
    assert re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_quantity,1", plan)
    assert re.search(
        r"PushedFilters: \[[^\]]*LessThanOrEqual\(l_quantity,3", plan)
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_is_rank1_window(spark):
    plan = _executed(q("tpch_q2_min_cost_supplier")(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert "CartesianProduct" not in plan


def test_q11_global_threshold_is_broadcast_scalar(spark):
    plan = _executed(q("tpch_q11_important_stock")(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q20_nested_aggregates_share_persisted_frame(spark):
    df = q("tpch_q20_dominant_suppliers")(spark, SF_SMOKE)
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan or plan.count("Scan parquet") <= 3


# -- hybrid RRF -------------------------------------------------------------

def test_rrf_score_formula_and_determinism(spark, tiny_docs_emb=None):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "lex_rank"])
    sem = spark.createDataFrame(
        [(2, 1), (4, 2)], ["doc_id", "sem_rank"])
    out = {r["doc_id"]: r for r in
           ranking.hybrid_rrf(lex, sem, "doc_id", k=10, rrf_k=60).collect()}
    # doc 2 in both lists: 1/62 + 1/61
    assert abs(out[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-15
    # doc 4 semantic-only: 0 + 1/62
    assert abs(out[4]["rrf_score"] - 1 / 62) < 1e-15
    assert out[1]["sem_rank"] is None
    # both-lists doc must outrank single-list docs with comparable ranks
    ordered = sorted(out.values(), key=lambda r: -r["rrf_score"])
    assert ordered[0]["doc_id"] == 2


def test_lexical_topn_rank_window_is_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "spark " * (10 - i % 10)) for i in range(50)],
        ["doc_id", "text"])
    out = ranking.lexical_topn(docs, "doc_id", "text", ["spark"], n=5)
    rows = out.collect()
    assert len(rows) == 5
    assert [r["lex_rank"] for r in
            sorted(rows, key=lambda r: r["lex_rank"])] == [1, 2, 3, 4, 5]


def test_rrf_query_plan_no_cartesian(spark):
    plan = _executed(q("hybrid_rrf_topk")(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


# -- JSONL scan contract ----------------------------------------------------

def test_jsonl_roundtrip_equals_source(spark):
    good = q("jsonl_scan_roundtrip")(spark, SF_SMOKE)
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
    src = catalog.load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text")
    assert good.exceptAll(src).count() == 0
    assert src.exceptAll(good).count() == 0


def test_jsonl_corrupt_lines_route_to_bad(spark):
    bad = q("jsonl_scan_corrupt_routing")(spark, SF_SMOKE).collect()
    assert len(bad) == 2
    by_raw = {r["_corrupt_record"]: r for r in bad}
    # malformed JSON: all-null; type mismatch: salvages other fields
    assert any(r["doc_id"] is None and r["text"] is None
               for r in bad)
    assert any(r["text"] == "hello world" and r["doc_id"] is None
               for r in bad)
    assert all(raw for raw in by_raw)


# -- schema evolution -------------------------------------------------------

def test_merge_schema_single_scan_and_null_fill(spark):
    df = q("parquet_schema_evolution")(spark, SF_SMOKE)
    plan = _executed(df)
    assert plan.count("Scan parquet") == 1  # one widened scan, not a union
    rows = df.collect()
    early = [r for r in rows if r["doc_id"] % 2 == 0]
    late = [r for r in rows if r["doc_id"] % 2 == 1]
    assert early and late
    assert all(r["lang"] is None and r["n_chars"] is None for r in early)
    assert all(r["lang"] is not None for r in late)


def test_union_by_name_never_positional(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import io as sio
    a = spark.createDataFrame([(1, "x")], ["id", "s"])
    b = spark.createDataFrame([("y", 2)], ["s", "id"])  # reversed order
    out = sio.union_evolving([a, b]).collect()
    assert {(r["id"], r["s"]) for r in out} == {(1, "x"), (2, "y")}
    c = spark.createDataFrame([(3,)], ["id"])           # missing column
    out2 = sio.union_evolving([a, c]).collect()
    assert {(r["id"], r["s"]) for r in out2} == {(1, "x"), (3, None)}


# -- incremental join-view maintenance --------------------------------------

def test_ivm_refresh_only_joins_the_delta(spark):
    df = q("orders_join_view_refresh")(spark, SF_SMOKE)
    plan = _executed(df)
    # exactly ONE join (delta ⋈ dim) — the materialized view unions in
    # join-free; the delta predicate reaches the orders scan
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("SortMergeJoin") == 0
    assert "o_orderkey" in plan
    # refresh equals the full recompute (the oracle also pins this)
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog
    o = catalog.load_table(spark, SF_SMOKE, "orders")
    c = catalog.load_table(spark, SF_SMOKE, "customer")
    full = o.join(c, o["o_custkey"] == c["c_custkey"])
    assert df.count() == full.count()


# -- scan-level pruning mechanisms ------------------------------------------

def test_partitioned_sink_prunes_partitions_on_read(spark, tmp_path):
    """The engine's own partitioned sink (S8) must yield reads that touch
    ONLY the filtered partition: PartitionFilters on the scan, one path
    of five."""
    from pyspark.sql import functions as F
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import io as sio
    df = spark.range(100).withColumn(
        "listen_date", F.concat(F.lit("2024-01-0"),
                                (F.col("id") % 5 + 1).cast("string")))
    sio.write_parquet(df, str(tmp_path / "lake"),
                      partition_by=["listen_date"])
    rd = spark.read.parquet(str(tmp_path / "lake")) \
        .filter(F.col("listen_date") == "2024-01-03")
    plan = _executed(rd)
    scan_line = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters" in scan_line
    assert "listen_date" in scan_line.split("PartitionFilters")[1]
    assert rd.count() == 20


def test_runtime_bloom_filter_injects_on_selective_join(spark, tmp_path):
    """session.enable_runtime_bloom_filters: a selective dim filter must
    materialize as bloom_filter_agg + might_contain pushed into the fact
    side of a shuffle join."""
    from pyspark.sql import functions as F
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import session as S
    big = spark.range(100_000).withColumn("k", F.col("id") % 1000)
    small = spark.range(1000).withColumn("k", F.col("id"))
    big.write.mode("overwrite").parquet(str(tmp_path / "big"))
    small.write.mode("overwrite").parquet(str(tmp_path / "small"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        S.enable_runtime_bloom_filters(spark,
                                       application_side_min_scan="0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        b = spark.read.parquet(str(tmp_path / "big"))
        s = spark.read.parquet(str(tmp_path / "small")) \
            .filter(F.col("id") < 20)
        plan = _executed(b.join(s, "k"))
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
