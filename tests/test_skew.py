"""Skew-mitigation operators: salted two-phase aggregation must be exactly
equal to the direct plan; distinct rewrite must equal countDistinct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import skew

from .conftest import SF_SMOKE


def _lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_salted_agg_equals_direct(spark):
    li = _lineitem(spark)
    direct = {r["l_returnflag"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in
              li.groupBy("l_returnflag").agg(
                  F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"),
                  F.min("l_extendedprice").alias("mn"),
                  F.max("l_extendedprice").alias("mx")).collect()}
    salted = {r["l_returnflag"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in
              skew.salted_agg(li, ["l_returnflag"], {
                  "n": ("count", F.lit(1)), "s": ("sum", "l_quantity"),
                  "mn": ("min", "l_extendedprice"),
                  "mx": ("max", "l_extendedprice")}, buckets=8).collect()}
    assert set(direct) == set(salted)
    for k in direct:
        dn, ds, dmn, dmx = direct[k]
        sn, ss, smn, smx = salted[k]
        assert (dn, dmn, dmx) == (sn, smn, smx)
        assert ds == pytest.approx(ss, rel=1e-12)  # double sum: order may differ


def test_salted_agg_rejects_non_reaggregable(spark):
    li = _lineitem(spark)
    with pytest.raises(ValueError, match="not re-aggregable"):
        skew.salted_agg(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_two_phase_count_distinct_equals_builtin(spark):
    li = _lineitem(spark)
    direct = {r["l_returnflag"]: r["n"] for r in
              li.groupBy("l_returnflag").agg(
                  F.countDistinct("l_partkey").alias("n")).collect()}
    rewritten = {r["l_returnflag"]: r["n_distinct"] for r in
                 skew.two_phase_count_distinct(
                     li, ["l_returnflag"], "l_partkey").collect()}
    assert direct == rewritten


def test_salted_agg_is_two_exchanges(spark):
    li = _lineitem(spark)
    out = skew.salted_agg(li, ["l_returnflag"],
                          {"n": ("count", F.lit(1))}, buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2  # (keys,salt) then keys — no third pass


def test_two_phase_count_distinct_ignores_nulls(spark):
    # count(DISTINCT v) never counts NULL; the rewrite must match.
    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u1"), ("a", None), ("b", None), ("c", "u2")],
        "k string, v string")
    direct = {r["k"]: r["n"] for r in
              df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    rewritten = {r["k"]: r["n_distinct"] for r in
                 skew.two_phase_count_distinct(df, ["k"], "v").collect()}
    assert direct == {"a": 1, "b": 0, "c": 1}
    assert rewritten == direct  # including the all-NULL group at 0


def test_aqe_skew_join_engages_on_hot_key(spark):
    """Scale hygiene: with AQE skew-join on (session.py defaults), a join
    whose left side is dominated by one hot key must show AQE splitting
    the skewed partition (`skew=true` in the final adaptive plan) — the
    runtime backstop behind the explicit salting operators."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(0, 200_000).select(
            (F.when(F.col("id") % 10 == 0, F.col("id"))
             .otherwise(F.lit(7))).alias("k"),
            F.concat(F.lit("x" * 32), F.col("id")).alias("pad"))
        dim = spark.range(0, 200_001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        joined = hot.join(dim, "k")
        # execute THIS DataFrame's QueryExecution (count() would build a
        # different one) so the adaptive plan finalizes before inspection
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
