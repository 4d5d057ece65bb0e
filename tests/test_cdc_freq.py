"""CDC changelog apply (upsert/delete/ordering) and exact distributed
heavy hitters (MG candidates + exact recount)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import cdc, freq


@pytest.fixture(scope="module")
def snap(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")


def test_apply_changes_semantics(spark, snap):
    changes = spark.createDataFrame(
        [(2, "b1", 1, "U"),    # update existing
         (2, "b2", 2, "U"),    # later update wins
         (3, "c", 5, "D"),     # delete existing
         (4, "d", 1, "I"),     # insert new key
         (5, "e", 1, "I"),
         (5, "e", 2, "D")],    # insert then delete -> absent
        "k bigint, v string, seq int, op string")
    out = {r["k"]: r["v"]
           for r in cdc.apply_changes(snap, changes, ["k"], "seq").collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_apply_changes_schema_and_determinism(spark, snap):
    changes = spark.createDataFrame(
        [(1, "a2", 1, "U")], "k bigint, v string, seq int, op string")
    out = cdc.apply_changes(snap, changes, ["k"], "seq")
    assert out.columns == snap.columns
    assert sorted(map(tuple, out.collect())) \
        == sorted(map(tuple, cdc.apply_changes(snap, changes, ["k"], "seq")
                      .collect()))


def test_change_counts(spark):
    changes = spark.createDataFrame(
        [(1, "x", 1, "U"), (1, "y", 3, "D"), (1, "z", 2, "U")],
        "k bigint, v string, seq int, op string")
    r = cdc.change_counts(changes, ["k"], "seq").first()
    assert (r["n_changes"], r["first_seq"], r["last_seq"], r["last_op"]) \
        == (3, 1, 3, "D")


# --------------------------------------------------------------------------
# heavy hitters
# --------------------------------------------------------------------------

def _exact_hh(df, col, k):
    n = df.filter(F.col(col).isNotNull()).count()
    rows = (df.filter(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") * k > n).collect())
    return {(r[col], r["c"]) for r in rows}


def test_heavy_hitters_exact_on_zipf(spark):
    # zipf-ish: value v appears ~N/v times
    vals = [v for v in range(1, 200) for _ in range(400 // v)]
    df = spark.createDataFrame([(v,) for v in vals], "x int").repartition(7)
    for k in (10, 50):
        got = {(r["x"], r["count"])
               for r in freq.heavy_hitters(df, "x", k=k).collect()}
        assert got == _exact_hh(df, "x", k)


def test_heavy_hitters_adversarial_partitioning(spark):
    # sorted layout: each partition is dominated by few values — the MG
    # guarantee must still surface the global heavy hitter that is spread
    # thinly across ALL partitions.
    rows = [(i, "hot" if i % 3 == 0 else f"cold{i}") for i in range(3000)]
    df = (spark.createDataFrame(rows, "i long, x string")
          .repartitionByRange(8, "i").select("x"))
    got = {r["x"] for r in freq.heavy_hitters(df, "x", k=4).collect()}
    assert got == {"hot"}


def test_heavy_hitters_nulls_and_empty(spark):
    df = spark.createDataFrame([(None,), ("a",), ("a",), ("b",)],
                               "x string")
    got = {(r["x"], r["count"], r["n_total"])
           for r in freq.heavy_hitters(df, "x", k=2).collect()}
    assert got == {("a", 2, 3)}          # NULL excluded from n and counts
    empty = spark.createDataFrame([], "x string")
    assert freq.heavy_hitters(empty, "x", k=2).count() == 0
