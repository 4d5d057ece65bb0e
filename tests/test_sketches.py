"""HLL sketch columns: estimate accuracy, merge ≡ direct sketch of union,
rollup without raw rescan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sketches


def _events(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") % 10).alias("day"),
        ((F.col("id") * 2654435761) % 700).alias("user"))


def test_estimate_within_hll_error(spark):
    df = _events(spark)
    sk = sketches.distinct_sketches(df, ["day"], "user")
    est = {r["day"]: r["n_distinct_est"]
           for r in sketches.estimate(sk).collect()}
    exact = {r["day"]: r["n"]
             for r in df.groupBy("day")
             .agg(F.countDistinct("user").alias("n")).collect()}
    for day, n in exact.items():
        assert est[day] == pytest.approx(n, rel=0.05)


def test_merge_tracks_direct_sketch(spark):
    """Union of per-day sketches must estimate the union's cardinality
    within the same HLL error envelope as one global sketch. NOT asserted
    bit-identical: the union gadget may walk a different sparse→dense
    representation path than a direct sketch of the union, so the two
    estimates can differ by a few counts while both stay inside the lgK=12
    ±~1.6%·z bound vs truth."""
    df = _events(spark)
    daily = sketches.distinct_sketches(df, ["day"], "user")
    merged = sketches.merge_sketches(
        daily.withColumn("all", F.lit(1)), ["all"],
        estimate_col="n_distinct_est").first()["n_distinct_est"]
    direct = sketches.estimate(
        sketches.distinct_sketches(
            df.withColumn("all", F.lit(1)), ["all"], "user")
    ).first()["n_distinct_est"]
    exact = df.select("user").distinct().count()
    assert merged == pytest.approx(exact, rel=0.05)
    assert direct == pytest.approx(exact, rel=0.05)
    # merged estimate stays close to the direct-global estimate too
    assert merged == pytest.approx(direct, rel=0.05)


def test_rollup_grain_change(spark):
    df = _events(spark).withColumn("week", F.col("day") % 2)
    daily = sketches.distinct_sketches(df, ["week", "day"], "user")
    weekly = {r["week"]: r["est"] for r in sketches.merge_sketches(
        daily, ["week"], estimate_col="est").collect()}
    exact = {r["week"]: r["n"] for r in df.groupBy("week")
             .agg(F.countDistinct("user").alias("n")).collect()}
    assert set(weekly) == set(exact)
    for w, n in exact.items():
        assert weekly[w] == pytest.approx(n, rel=0.05)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key probes true (structural guarantee); on a
    disjoint probe set the 1008-bit/4-hash filter at n=200 keys stays
    well under a ~10% false-positive ceiling ((1-e^{-kn/m})^k ≈ 4.6%)."""
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bloom = sketches.bloom_build(keys, "k")
    # ≤ 16 words, each within the 63-bit mask
    rows = bloom.collect()
    assert len(rows) <= 16
    assert all(0 <= r["word_idx"] < 16 for r in rows)
    hits = sketches.bloom_probe(keys, bloom, "k").collect()
    assert all(r["in_bloom"] for r in hits) and len(hits) == 200
    others = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    fp = sketches.bloom_probe(others, bloom, "k") \
        .filter("in_bloom").count()
    assert fp / 2000 < 0.10


def test_bloom_merge_is_wordwise_or(spark):
    """bloom(A ∪ B) == wordwise-OR of bloom(A), bloom(B) — the mergeable
    no-rescan property the HLL/CMS families share."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 250).select(F.col("id").alias("k"))
    direct = {r["word_idx"]: r["bits"]
              for r in sketches.bloom_build(a.union(b), "k").collect()}
    merged = {r["word_idx"]: r["bits"] for r in
              (sketches.bloom_build(a, "k")
               .unionByName(sketches.bloom_build(b, "k"))
               .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
               .collect())}
    assert direct == merged


# --- portable register-table HLL (round 11) --------------------------------

def _py_hll_est(values, lg_k=12, cap=24):
    """Independent pure-Python replay of the portable estimate."""
    import hashlib
    import math
    m = 1 << lg_k
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        j = int(h[:8], 16) % m
        w = int(h[8:23], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    zp = sum(1 << (cap - min(M, cap)) for M in regs.values())
    v0 = m - len(regs)
    z = zp + v0 * (1 << cap)
    kk = sketches.hll_estimate_scale_constant(lg_k, cap)
    e_raw = kk / z
    if v0 > 0 and e_raw <= 2.5 * m:
        return m * math.log(m / v0)
    return e_raw


def test_portable_hll_matches_python_replay_bitexact(spark):
    df = _events(spark)
    got = {r["day"]: r["n_est"] for r in sketches.hll_distinct_estimates(
        df, ["day"], F.col("user")).collect()}
    rows = df.collect()
    by_day: dict[int, set] = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user"])
    for day, users in by_day.items():
        assert got[day] == _py_hll_est(users), day


def test_portable_hll_estimate_within_error(spark):
    df = _events(spark)
    got = {r["day"]: r["n_est"] for r in sketches.hll_distinct_estimates(
        df, ["day"], F.col("user")).collect()}
    exact = {r["day"]: r["n"] for r in df.groupBy("day")
             .agg(F.countDistinct("user").alias("n")).collect()}
    for day, n in exact.items():
        assert got[day] == pytest.approx(n, rel=0.06)


def test_portable_hll_merge_is_bit_identical_to_direct(spark):
    """The property the binary sketches only hold approximately: max-merge
    of fine-grain registers == direct coarse-grain registers, so the
    rolled-up estimate is BIT-identical to the direct one."""
    df = _events(spark).withColumn("grp", F.col("day") % 3)
    daily = sketches.hll_register_table(df, ["day"], F.col("user"))
    merged = sketches.hll_merge_register_tables(
        daily.withColumn("grp", F.col("day") % 3), ["grp"])
    est_merged = {r["grp"]: r["n_est"] for r in
                  sketches.hll_estimate_registers(
                      merged, ["grp"]).collect()}
    est_direct = {r["grp"]: r["n_est"] for r in
                  sketches.hll_distinct_estimates(
                      df, ["grp"], F.col("user")).collect()}
    assert est_merged == est_direct


def test_portable_hll_null_and_rho_edge(spark):
    """NULL values never enter the sketch; a crafted single-value group
    exercises the w=0-free common path deterministically."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"g": [1, 1, 1, 2], "v": ["a", "a", None, "b"]}),
        "g long, v string")
    out = {r["g"]: r["n_est"] for r in sketches.hll_distinct_estimates(
        df, ["g"], F.col("v")).collect()}
    assert out[1] == pytest.approx(1.0, abs=0.01)
    assert out[2] == pytest.approx(1.0, abs=0.01)
    assert out[1] == _py_hll_est(["a"]) and out[2] == _py_hll_est(["b"])


def test_fast_slot_rho_bit_identical_to_reference_forms(spark):
    """Round-12 micro-optimization guard: the trailing-hex-digit slot and
    the ltrim-derived rho must equal the reference conv(8)+pmod /
    conv(15)+bin+length forms BIT-FOR-BIT on every digit class and both
    rho edges (w=0 → 61, top-bit-set → 1), plus real md5 output."""
    rows = [("000000000000000000000000000000ff",),   # w=0 → rho 61
            ("00000000" + "000000000000001" + "0" * 9,),   # w=1 → rho 60
            ("ffffffff" + "fffffffffffffff" + "0" * 9,),   # max  → rho 1
            ("12345678" + "0000000000000a0" + "0" * 9,),
            ("deadbeef" + "00000000000001f" + "0" * 9,),
            ("0000aaaa" + "200000000000000" + "0" * 9,),
            ("00000fff" + "3abcdef01234567" + "0" * 9,),
            ("87654321" + "48000000000ff00" + "0" * 9,),
            ("11111111" + "7ffffffffffffff" + "0" * 9,),
            ("22222222" + "800000000000000" + "0" * 9,),
            ("33333333" + "9abcdef01234567" + "0" * 9,)]
    synth = spark.createDataFrame(rows, "h string")
    real = spark.range(2000).select(F.md5(F.col("id").cast("string"))
                                    .alias("h"))
    for df in (synth, real):
        old_w = F.conv(F.substring("h", 9, 15), 16, 10).cast("long")
        old_rho = (F.when(old_w == 0, F.lit(61))
                   .otherwise(F.lit(61) - F.length(F.bin(old_w)))
                   ).cast("int")
        new_rho = sketches._hll_rho_of_t(sketches._hll_t_of_h(F.col("h")))
        for lg_k in (12, 10):  # fast hex-aligned path + pmod fallback
            old_slot = F.pmod(F.conv(F.substring("h", 1, 8), 16, 10)
                              .cast("long"), F.lit(1 << lg_k))
            new_slot = sketches._hll_slot_of_h(F.col("h"), lg_k)
            bad = df.select(
                ((old_rho != new_rho)
                 | (old_slot != new_slot)).cast("int").alias("bad")
            ).agg(F.sum("bad")).collect()[0][0]
            assert bad == 0
