"""Versioned snapshot tables: commit protocol, time travel, vacuum,
crash-orphan invisibility."""

from __future__ import annotations

import os

import pytest

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import versioned as V


def _df(spark, n):
    return spark.range(n).withColumnRenamed("id", "k")


def test_write_read_latest_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    assert V.write_snapshot(_df(spark, 3), root) == 1
    assert V.write_snapshot(_df(spark, 5), root) == 2
    assert V.versions(root) == [1, 2]
    assert V.read_snapshot(spark, root).count() == 5          # latest
    assert V.read_snapshot(spark, root, version=1).count() == 3
    with pytest.raises(ValueError):
        V.read_snapshot(spark, root, version=9)


def test_uncommitted_directory_is_invisible(spark, tmp_path):
    """A snapshot directory without a manifest entry (crashed write) must
    not be readable state."""
    root = str(tmp_path / "tbl")
    V.write_snapshot(_df(spark, 3), root)
    # simulate a crash: data for v2 written, manifest never swapped
    _df(spark, 99).write.parquet(os.path.join(root, "v=2"))
    assert V.versions(root) == [1]
    assert V.read_snapshot(spark, root).count() == 3
    with pytest.raises(ValueError):
        V.read_snapshot(spark, root, version=2)
    # the next committed write claims v2 over the orphan
    assert V.write_snapshot(_df(spark, 7), root) == 2
    assert V.read_snapshot(spark, root).count() == 7


def test_vacuum_retention_keeps_newest(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for n in (1, 2, 3, 4):
        V.write_snapshot(_df(spark, n), root)
    dropped = V.vacuum(root, keep_last=2)
    assert dropped == [1, 2]
    assert V.versions(root) == [3, 4]
    assert not os.path.exists(os.path.join(root, "v=1"))
    assert V.read_snapshot(spark, root, version=3).count() == 3
    with pytest.raises(ValueError):
        V.read_snapshot(spark, root, version=1)
    with pytest.raises(ValueError):
        V.vacuum(root, keep_last=0)


def test_multi_table_commit_is_atomic(spark, tmp_path):
    """Two tables publish under ONE version pointer; a crash after one
    table's data lands but before the swap leaves BOTH invisible."""
    root = str(tmp_path / "multi")
    v = V.write_snapshot_multi(
        {"orders": _df(spark, 3), "items": _df(spark, 6)}, root)
    assert v == 1
    assert V.read_table(spark, root, "orders").count() == 3
    assert V.read_table(spark, root, "items").count() == 6
    # simulated crash: v2 data for ONE table only, no manifest swap
    _df(spark, 99).write.parquet(os.path.join(root, "orders", "v=2"))
    assert V.read_table(spark, root, "orders").count() == 3  # still v1
    with pytest.raises(ValueError):
        V.read_table(spark, root, "orders", version=2)
    # the next commit publishes BOTH tables at v2 (overwriting the orphan)
    v2 = V.write_snapshot_multi(
        {"orders": _df(spark, 4), "items": _df(spark, 8)}, root)
    assert v2 == 2
    assert V.read_table(spark, root, "orders").count() == 4
    assert V.read_table(spark, root, "items", version=1).count() == 6
    with pytest.raises(ValueError):
        V.read_table(spark, root, "missing")


def test_vacuum_multi_table_consistent(spark, tmp_path):
    """round-4 ADVICE fix: vacuum on a write_snapshot_multi root prunes
    each table's manifest list, deletes <table>/v=N directories (storage
    actually reclaimed), and read_table refuses vacuumed versions."""
    import os

    import pytest

    root = str(tmp_path / "multi")
    for i in range(3):
        V.write_snapshot_multi(
            {"a": spark.range(i + 1).toDF("x"),
             "b": spark.range(10 + i).toDF("y")}, root)
    dropped = V.vacuum(root, keep_last=2)
    assert dropped == [1]
    assert V.versions(root) == [2, 3]
    # manifest table lists agree with versions()
    import json
    with open(os.path.join(root, "_manifest.json")) as fh:
        m = json.load(fh)
    assert m["tables"] == {"a": [2, 3], "b": [2, 3]}
    # storage reclaimed: the v=1 dirs are gone under BOTH tables
    assert not os.path.exists(os.path.join(root, "a", "v=1"))
    assert not os.path.exists(os.path.join(root, "b", "v=1"))
    # vacuumed version is not readable state; kept ones are
    with pytest.raises(ValueError):
        V.read_table(spark, root, "a", version=1)
    assert V.read_table(spark, root, "b", version=2).count() == 11
