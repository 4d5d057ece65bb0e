"""Registry contract guards: every oracle pairs with a query, and the two
sides agree on column NAMES before any value comparison — catches alias
drift instantly (the driver hashes name-sorted columns, so a rename fails
correctness even with identical values)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMOKE

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_every_oracle_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 35


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


def test_spark_and_oracle_columns_agree(spark, duck):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    mismatches = {}
    for name, sql in oracles.items():
        spark_cols = sorted(qs[name](spark, SF_SMOKE).columns)  # plan only
        duck_cols = sorted(r[0] for r in
                           duck.execute("DESCRIBE " + sql).fetchall())
        if spark_cols != duck_cols:
            mismatches[name] = (spark_cols, duck_cols)
    assert not mismatches, mismatches


def test_no_unhashable_columns_in_oracle_checked_queries(spark):
    """The driver's comparator factorizes result cells with pandas and dies
    on binary/array/map/struct values (r2: media_resize_stamped et al. ERR'd
    with `unhashable type`). Any oracle-checked query must project scalar
    cells only — digests for blobs, CSV/JSON for arrays. Analysis-only:
    builds each plan, never executes it."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    offenders = {}
    for name in oracles:
        schema = qs[name](spark, SF_SMOKE).schema
        bad = [f.name for f in schema.fields
               if f.dataType.typeName() in ("binary", "array", "map", "struct")]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_driver_window_holds_reference_surface_and_family_reps():
    """The driver correctness gate samples the FIRST 50 registry entries;
    pin the load-bearing ordering (reference surface + extension-family
    representatives) so an innocent re-registration can't silently push a
    claimed-done operator out of the checked window."""
    first50 = list(entrymod.queries())[:50]
    # the exact window, not just membership: the driver samples the FIRST
    # 50 in order, so ordering drift IS the failure mode
    assert first50 == entrymod._PRIORITY, "window != _PRIORITY pin"
    must_hold = {
        # permanent anchors (round 7 trimmed the redundant packing/W2
        # probes to keep window slots for first-time rotation rows)
        "daily_genre_kpis", "top_songs_per_genre",
        "kv_genre_kpi_items", "latest_day_kpis", "csv_scan_corrupt_routing",
        "pack_documents_512",
        # round-13 rotation (staleness pass over the oldest driver rows):
        # reps, one per re-validated r5/r6-era family
        "user_cohort_retention", "user_interevent_stats",
        "user_value_trend", "weighted_sample_docs", "ab_purchase_ks",
        "classifier_eval_metrics", "customer_rfm_segments",
        "docs_kfold_assign", "events_k_anonymity_audit",
        "events_user_bottomk_sample", "lineitem_weighted_median_qty",
        "orders_benford_digits", "packing_stats_512",
        "session_transcripts", "source_minhash_similarity",
        "top_user_paths",
    }
    assert must_hold <= set(first50), must_hold - set(first50)


def test_rotation_ledger_no_permanently_ineligible_query():
    """Round-5 coverage-ledger guard (VERDICT r4 item 8): every registered
    query must be either already driver-validated (a row in some
    CORRECTNESS_r*.json) or oracle-backed hence eligible for rotation into
    the 50-window. A rows-only query that never held a driver row is
    allowed (the driver records a weaker rows-only check for those), but
    an oracle-backed query silently dropped from BOTH the historical
    window union and the registry ordering would be a bug in _registry()."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    validated: set[str] = set()
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        validated |= set(json.load(open(f)))
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    # _registry() must keep every REGISTRY entry reachable (rotation can
    # reorder but never drop)
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.queries_reference import REGISTRY
    assert set(names) == set(REGISTRY)
    never = [n for n in names if n not in validated and n in oracles]
    # eligibility: each such query CAN appear in a future 50-window
    # because ordering is fully controlled by _PRIORITY
    assert set(entrymod._PRIORITY) <= set(names)


def test_sql_surface_views_and_parity(spark):
    """create_temp_views exposes every table to spark.sql through the
    normalizing loader; the pure-SQL query equals its DataFrame twin."""
    from pyspark.sql import functions as F
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog as cat

    names = cat.create_temp_views(spark, "/root/testdata/sf0.001")
    assert set(names) >= {"lineitem", "orders", "customer", "nation",
                          "events", "documents"}
    # events view carries the normalized timestamp type, not raw longs
    assert dict(spark.table("events").dtypes)["ts"].startswith("timestamp")
    sql_rows = {tuple(r) for r in entrymod.queries()["sql_nation_revenue"](
        spark, "/root/testdata/sf0.001").collect()}
    l, o = spark.table("lineitem"), spark.table("orders")
    c, n = spark.table("customer"), spark.table("nation")
    cents = lambda col: F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")
    df_rows = {tuple(r) for r in (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
         .filter((F.col("o_orderdate") >= "1997-01-01")
                 & (F.col("o_orderdate") < "1998-01-01"))
         .join(c, o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
         .groupBy("n_name")
         .agg(F.sum(cents("l_extendedprice")
                    * (F.lit(100) - cents("l_discount"))).alias("revenue_cbp"),
              F.count(F.lit(1)).alias("n_lines"))).collect()}
    assert sql_rows == df_rows and sql_rows
