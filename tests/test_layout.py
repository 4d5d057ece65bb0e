"""Z-order layout: file envelopes shrink, point queries touch few files;
compaction: output file count follows target size."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import layout


def _touch_fraction(report_rows, x, y):
    """Fraction of files whose [min,max] envelope contains point (x,y)."""
    hit = sum(1 for r in report_rows
              if r["min_x"] <= x <= r["max_x"]
              and r["min_y"] <= y <= r["max_y"])
    return hit / len(report_rows)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(layout.zvalue([F.col("a"), F.col("b")], bits=3)).first()[0]
    # a bits land at even positions (j=0), b at odd (j=1):
    #   pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1, pos4=a2=1, pos5=b2=0
    assert z == 0b011011


def test_zorder_preserves_rows_and_schema(spark):
    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 1000).alias("y"),
        F.col("id").alias("payload"))
    out = layout.zorder_by(df, ["x", "y"], num_partitions=8)
    assert out.columns == ["x", "y", "payload"]
    assert out.count() == 1000
    assert sorted(r["payload"] for r in out.collect()) == list(range(1000))


def test_zorder_write_clusters_files(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"))
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    layout.write_zordered(df, zpath, ["x", "y"], num_files=16)
    df.repartition(16).write.parquet(rpath)  # random layout baseline

    zrep = layout.clustering_report(spark, zpath, ["x", "y"]).collect()
    rrep = layout.clustering_report(spark, rpath, ["x", "y"]).collect()
    assert len(zrep) == 16

    probes = [(0, 0), (500, -500), (900, 900), (-900, 100)]
    z_frac = sum(_touch_fraction(zrep, *p) for p in probes) / len(probes)
    r_frac = sum(_touch_fraction(rrep, *p) for p in probes) / len(probes)
    # random layout: every file spans the domain (~100% touch);
    # z-order: a point lands in a handful of tiles.
    assert r_frac > 0.9
    assert z_frac < 0.5 * r_frac


def test_zorder_single_column_is_range_sort(spark):
    df = spark.range(100).select((F.col("id") % 50).alias("x"))
    out = layout.zorder_by(df, ["x"], num_partitions=4, bits=8)
    # partition-local sorted ascending by x overall when collected per part
    parts = out.withColumn("_p", F.spark_partition_id()).collect()
    by_part: dict[int, list[int]] = {}
    for r in parts:
        by_part.setdefault(r["_p"], []).append(r["x"])
    for vals in by_part.values():
        assert vals == sorted(vals)


def test_compact_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(50_000).repartition(40).write.parquet(src)
    n = layout.compact_small_files(spark, src, dst,
                                   target_file_bytes=200 * 1024)
    got = spark.read.parquet(dst)
    assert got.count() == 50_000
    import os
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n
    assert 1 < n < 40


def test_zorder_quantile_robust_on_heavy_tail(spark, tmp_path):
    # x is heavy-tailed (cubed), y uniform: linear min-max scaling maps
    # ~all x mass into the bottom z-bins, so files can't separate the
    # dense region; rank-space binning spreads it evenly.
    n = 20_000
    df = spark.range(n).select(
        ((F.xxhash64("id") % 1000 + 1000) % 1000).alias("u"),
        F.col("id"))
    df = df.select(
        (F.col("u") * F.col("u") * F.col("u")).alias("x"),   # tail to 1e9
        (F.xxhash64("id", F.lit(2)) % 1000).alias("y"))
    qpath, lpath = str(tmp_path / "q"), str(tmp_path / "l")
    layout.zorder_by_quantile(df, ["x", "y"], num_partitions=16) \
        .write.parquet(qpath)
    layout.zorder_by(df, ["x", "y"], num_partitions=16, bits=8) \
        .write.parquet(lpath)

    qdf = spark.read.parquet(qpath)
    assert qdf.count() == n
    assert set(qdf.columns) == {"x", "y"}

    qrep = layout.clustering_report(spark, qpath, ["x", "y"]).collect()
    lrep = layout.clustering_report(spark, lpath, ["x", "y"]).collect()
    # probes inside the dense low-x region, where the tail crushes the
    # linear scaling. Many probes: each touch fraction is quantized to
    # 1/16 (16 files), and repartitionByRange's sampled boundaries move
    # between runs (reservoir seed depends on session-history RDD ids) —
    # a 4-probe average flaked at one-file resolution in full-suite runs.
    probes = [(x**3, y) for x, y in
              [(2, 100), (10, 500), (50, 900), (30, 50), (5, 700),
               (20, 250), (70, 600), (90, 350), (15, 820), (40, 470)]]
    q_frac = sum(_touch_fraction(qrep, *p) for p in probes) / len(probes)
    l_frac = sum(_touch_fraction(lrep, *p) for p in probes) / len(probes)
    # one file-quantum of slack absorbs boundary-sampling noise; the real
    # claim is "quantile never materially loses, and prunes well".
    assert q_frac <= l_frac + 1.0 / len(qrep) + 1e-9
    assert q_frac < 0.5
