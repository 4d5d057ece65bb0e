"""Replay-oracle builders (operators/pyref.py): the VALUES serialization
is parseable, escaped, and the builders mirror the registered tokenizer
parameters (the driver-gate parity itself is exercised by
tools/oracle_check.py — these tests pin the plumbing)."""

from __future__ import annotations

import duckdb

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import bpe, pyref


def test_values_table_escaping():
    sql = pyref.values_table([(1, "o'brien"), (2, "plain")],
                             ["id", "name"])
    df = duckdb.sql(sql).df()
    assert list(df["name"]) == ["o'brien", "plain"]


def test_values_table_rejects_non_finite_floats():
    """f'{nan:.17e}' would render an invalid SQL literal whose DuckDB
    parse error points nowhere near the producing reduction — the cell
    serializer fails with a pointed message instead (round-7 ADVICE).
    Finite floats still round-trip bit-exactly."""
    import math

    import pytest

    sql = pyref.values_table([(1, 0.1 + 0.2)], ["id", "v"])
    assert duckdb.sql(sql).fetchone()[1] == 0.1 + 0.2
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite float"):
            pyref.values_table([(1, bad)], ["id", "v"])
    assert math.isfinite(0.30000000000000004)  # keep the import honest


def test_ref_bpe_matches_module_reference():
    texts = ["low low low low low",
             "lower lower newest newest newest",
             "newest newest newest widest widest"]
    merges = pyref.ref_bpe(texts, 6)
    # replay invariants: steps are sequential, counts non-increasing is NOT
    # required, but every merge must have been a real adjacent pair
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] >= 2 for m in merges)
    # encode reassembles the word + EOW
    n = pyref.ref_bpe_encode_len("newest", merges)
    assert 1 <= n <= len("newest") + 1


def test_oracle_builders_parse_and_match_shapes():
    for builder, cols in [
            (pyref.bpe_merge_oracle,
             ["step", "left", "right", "pair_count"]),
            (pyref.unigram_piece_oracle, ["piece", "count"]),
            (pyref.doc_bpe_stats_oracle,
             ["doc_id", "n_words", "n_pieces", "pieces_per_word"]),
            (pyref.doc_unigram_stats_oracle,
             ["doc_id", "n_words", "n_pieces", "pieces_per_word"])]:
        df = duckdb.sql(builder()).df()
        assert list(df.columns) == cols and len(df) > 0
