"""spark.read/write.format("kvstore") — the Python Data Source connector."""

from __future__ import annotations

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.kv_datasource import KVStoreDataSource
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.kvstore import KVStore


@pytest.fixture()
def store(tmp_path):
    s = KVStore(str(tmp_path / "kv.db"))
    s.ensure_table("Items", hash_key="date", range_key="genre")
    return s


def _register(spark):
    spark.dataSource.register(KVStoreDataSource)


def test_write_then_read_roundtrip(spark, store):
    _register(spark)
    df = spark.createDataFrame(
        [("2024-01-01", "rock", 10, 1.5), ("2024-01-01", "jazz", 3, 0.25),
         ("2024-01-02", "rock", 7, 2.0)],
        "date string, genre string, n long, score double")
    (df.write.format("kvstore")
       .option("path", store.path).option("table", "Items")
       .mode("append").save())
    assert store.count("Items") == 3

    back = (spark.read.format("kvstore")
            .schema("date string, genre string, n long, score double")
            .option("path", store.path).option("table", "Items")
            .option("numPartitions", 3).load())
    got = {(r["date"], r["genre"]): (r["n"], r["score"]) for r in back.collect()}
    assert got == {("2024-01-01", "rock"): (10, 1.5),
                   ("2024-01-01", "jazz"): (3, 0.25),
                   ("2024-01-02", "rock"): (7, 2.0)}


def test_write_upserts_on_key(spark, store):
    _register(spark)
    for n in (1, 2):
        df = spark.createDataFrame([("2024-01-01", "rock", n)],
                                   "date string, genre string, n long")
        (df.write.format("kvstore")
           .option("path", store.path).option("table", "Items")
           .mode("append").save())
    assert store.count("Items") == 1  # same composite key -> replaced
    assert store.get_item("Items", "2024-01-01", "rock")["n"] == 2


def test_overwrite_truncates_table(spark, store):
    _register(spark)
    a = spark.createDataFrame([("d1", "g1", 1), ("d2", "g2", 2)],
                              "date string, genre string, n long")
    b = spark.createDataFrame([("d9", "g9", 9)],
                              "date string, genre string, n long")
    w = lambda df, mode: (df.write.format("kvstore")
                          .option("path", store.path).option("table", "Items")
                          .mode(mode).save())
    w(a, "append")
    w(b, "overwrite")
    assert [i["date"] for i in store.scan("Items")] == ["d9"]


def test_overwrite_is_staged_not_planner_time(spark, store):
    """A failing overwrite JOB must not leave the target truncated: the
    truncate-and-swap happens only in the driver commit(), so an aborted
    write leaves the old rows intact (and no staging debris)."""
    _register(spark)
    ok = spark.createDataFrame([("d1", "g1", 1)], "date string, genre string, n long")
    (ok.write.format("kvstore").option("path", store.path)
       .option("table", "Items").mode("append").save())

    from pyspark.sql import functions as F
    boom = spark.createDataFrame([("d9", "g9", 9)], "date string, genre string, n long") \
        .withColumn("n", F.expr("CAST(raise_error('task boom') AS LONG)"))
    with pytest.raises(Exception, match="task boom"):
        (boom.write.format("kvstore").option("path", store.path)
             .option("table", "Items").mode("overwrite").save())

    # old data survives the failed overwrite; no hidden staging rows remain
    assert [i["date"] for i in store.scan("Items")] == ["d1"]
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.plans.kvstore import _connect
    with _connect(store.path) as con:
        leftovers = con.execute(
            "SELECT count(*) FROM kv_items WHERE tbl LIKE '__staging_%'").fetchone()[0]
    assert leftovers == 0


def test_schema_inference_from_items(spark, store):
    _register(spark)
    store.put_item("Items", {"date": "d1", "genre": "g", "n": 5, "x": 1.5})
    back = (spark.read.format("kvstore")
            .option("path", store.path).option("table", "Items").load())
    row = back.collect()[0]
    assert (row["date"], row["genre"], row["n"], row["x"]) == ("d1", "g", 5, 1.5)
    assert dict(back.dtypes) == {"date": "string", "genre": "string",
                                 "n": "bigint", "x": "double"}
