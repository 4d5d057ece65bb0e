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
