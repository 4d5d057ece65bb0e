"""Property tests for the round-4 operators: the portable MinHash scheme
(pure-Python reference parity), z-value interleave invariants, packing
manifest conservation, and the mixture overflow envelope boundary."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import dedup, packing
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import layout


def _py_minhash(shingles: set[str], num_hashes: int = 48) -> list[int]:
    """Pure-Python reference of the md5+affine portable scheme — must
    equal the Spark expression bit-for-bit."""
    P, MIX = dedup._MH_P, dedup._MH_MIX
    out = []
    for i in range(num_hashes):
        a = ((2 * i + 1) * MIX) % P
        out.append(min(
            ((int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P)
             * a + i) % P
            for s in shingles))
    return out


def test_minhash_md5_scheme_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "the quick brown fox jumps over the lazy cat")],
        ["doc_id", "text"])
    sig = {r["_id"]: [r[f"h{i}"] for i in range(48)]
           for r in dedup.minhash_signatures(
               docs, "doc_id", "text", n=3, hash_scheme="md5").collect()}
    for did, text in [(1, "the quick brown fox jumps over the lazy dog"),
                      (2, "pack my box with five dozen liquor jugs"),
                      (3, "the quick brown fox jumps over the lazy cat")]:
        toks = text.split(" ")
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        assert sig[did] == _py_minhash(sh), did


def test_zvalue_interleave_bijective_and_bounded(spark):
    """Every (a, b) in the 4-bit grid gets a DISTINCT z-value < 2^(2*4),
    and the origin maps to 0 — the interleave drops no bits."""
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b",
                    layout.zvalue([F.col("a"), F.col("b")], 4).alias("z"))
    got = {(r["a"], r["b"]): r["z"] for r in out.collect()}
    assert len(set(got.values())) == 256
    assert all(0 <= z < 256 for z in got.values())
    assert got[(0, 0)] == 0
    # bit placement: bit i of dim j lands at position i*k + j, so dim 0's
    # lowest bit is z bit 0 and dim 1's lowest bit is z bit 1
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2


def test_packing_manifest_conserves_docs_and_tokens(spark):
    """Window accounting conservation: every doc appears in exactly one
    bin of its source, bin token sums equal the per-doc sums, and no bin
    (except a straddled one) exceeds the budget at its offsets."""
    rows = [(i, "src%d" % (i % 3), "w " * (5 + (i * 7) % 40)) for i in range(60)]
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        ["doc_id", "source", "text"])
    packed = packing.pack_documents(docs, budget_tokens=64)
    rows_p = packed.collect()
    assert len(rows_p) == 60
    # offsets within a source strictly increase with doc_id and equal the
    # running sum of previous docs' tokens
    by_src: dict = {}
    for r in sorted(rows_p, key=lambda r: (r["source"], r["doc_id"])):
        prev = by_src.get(r["source"], 0)
        assert r["token_offset"] == prev
        assert r["bin_idx"] == prev // 64
        assert r["bin_offset"] == prev % 64
        by_src[r["source"]] = prev + r["n_tokens"]
    stats = packing.packing_stats(packed, budget_tokens=64).collect()
    assert sum(r["n_docs"] for r in stats) == 60
    assert sum(r["total_tokens"] for r in stats) == sum(
        r["n_tokens"] for r in rows_p)
