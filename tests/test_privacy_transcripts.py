"""Round-5 additions: session transcripts (E115), k-anonymity audit (E116),
grouped mergeable MinHash signatures (E117).

Invariants pinned here (the oracle pins value parity; these pin semantics):
- transcript ordering follows (ts, event_id) regardless of input row order,
  and NULL turns render as '' (array_join vs string_agg null contract);
- pattern mining respects min_sessions / max_turns valves;
- k-anonymity flags are exact threshold comparisons; summary rows-at-risk
  counts only violating groups;
- grouped MinHash signatures are MERGEABLE: sketching at a finer grain and
  min-merging upward equals sketching the coarse grain directly, for ANY
  partition of the corpus; similarity matches equal the component-wise
  signature agreement count.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import (
    dedup,
    privacy,
    transcripts,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, u, T0 + datetime.timedelta(seconds=s), t)
         for eid, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def test_transcript_ordered_by_ts_then_event_id(spark):
    # rows arrive shuffled; events 2 and 3 share a timestamp -> event_id
    # breaks the tie; the 5000s gap splits user 1 into two sessions.
    ev = _events(spark, [(3, 1, 100, "c"), (1, 1, 0, "a"), (2, 1, 100, "b"),
                         (4, 1, 5100, "d"), (5, 2, 0, "x")])
    out = transcripts.session_transcripts(ev, gap_seconds=3600)
    got = {(r["user_id"], r["session_idx"]): (r["n_turns"], r["transcript"])
           for r in out.collect()}
    assert got[(1, 0)] == (3, "a -> b -> c")
    assert got[(1, 1)] == (1, "d")
    assert got[(2, 0)] == (1, "x")


def test_transcript_null_turn_renders_empty(spark):
    ev = _events(spark, [(1, 1, 0, "a"), (2, 1, 10, None), (3, 1, 20, "c")])
    out = transcripts.session_transcripts(ev, gap_seconds=3600)
    [row] = out.collect()
    assert row["transcript"] == "a ->  -> c"


def test_pattern_counts_valves(spark):
    # three users share the "a -> b" pattern; one singleton pattern drops
    # below min_sessions; one long session drops at max_turns.
    rows = []
    eid = 0
    for u in (1, 2, 3):
        rows += [(eid := eid + 1, u, 0, "a"), (eid := eid + 1, u, 10, "b")]
    rows += [(eid := eid + 1, 4, 0, "z")]
    rows += [(eid := eid + 1, 5, i * 10, "a") for i in range(5)]
    ev = _events(spark, rows)
    out = transcripts.transcript_pattern_counts(
        ev, min_sessions=2, max_turns=4, gap_seconds=3600)
    got = {r["transcript"]: (r["n_sessions"], r["n_users"])
           for r in out.collect()}
    assert got == {"a -> b": (3, 3)}


def test_k_anonymity_audit_flags(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("x", 2), ("x", 3),     # n=4 <5, l=3
         ("y", 7), ("y", 7), ("y", 7), ("y", 7), ("y", 7)],  # n=5, l=1
        "qi string, person long")
    audit = {r["qi"]: r for r in privacy.k_anonymity_audit(
        df, ["qi"], "person", k=5, l=2).collect()}
    assert audit["x"]["k_violation"] and not audit["x"]["l_violation"]
    assert not audit["y"]["k_violation"] and audit["y"]["l_violation"]
    [s] = privacy.k_anonymity_summary(df, ["qi"], "person", k=5, l=2).collect()
    assert (s["n_groups"], s["k_violating_groups"], s["rows_at_risk"],
            s["l_violating_groups"], s["min_group_n"], s["min_l_distinct"]) \
        == (2, 1, 4, 1, 4, 1)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, g string, text string")


_TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "a completely different sentence about spark physical plans",
    "the quick brown fox jumps over another lazy dog today",
    "minhash sketches are mergeable because min is associative",
]


def test_grouped_minhash_merge_equals_direct(spark):
    # fine grain (g, sub) min-merged upward == direct per-g sketch,
    # for an arbitrary assignment of docs to subgroups.
    rows = [(i, "s1" if i < 3 else "s2", t) for i, t in enumerate(_TEXTS)]
    df = _docs(spark, rows).withColumn(
        "sub", (F.col("doc_id") % 2).cast("string"))
    direct = dedup.grouped_minhash_signatures(df, "g", "text", num_hashes=8)
    fine = dedup.grouped_minhash_signatures(df, ["g", "sub"], "text",
                                            num_hashes=8)
    merged = fine.groupBy("g", "i").agg(F.min("h").alias("h"))
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_grouped_minhash_similarity_matches_signature_agreement(spark):
    rows = [(0, "s1", _TEXTS[0]), (1, "s2", _TEXTS[0]), (2, "s3", _TEXTS[1])]
    df = _docs(spark, rows)
    sim = {(r["g_a"], r["g_b"]): (r["n_matches"], r["est_jaccard"])
           for r in dedup.grouped_minhash_similarity(
               df, "g", "text", num_hashes=8).collect()}
    # identical corpora -> all 8 components agree, estimate 1.0
    assert sim[("s1", "s2")] == (8, 1.0)
    # disjoint vocab pairs share no component -> absent by construction
    assert ("s1", "s3") not in sim and ("s2", "s3") not in sim


def test_contrastive_negatives_properties(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import sampling
    rows = [(i, "s%d" % (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.contrastive_negatives(df, "doc_id", "source",
                                         buckets=4, k=3).collect()
    src = dict(rows)
    by_anchor = {}
    for r in out:
        assert src[r["anchor_id"]] != src[r["neg_id"]]
        assert 1 <= r["rk"] <= 3
        by_anchor.setdefault(r["anchor_id"], []).append(r["neg_id"])
    assert all(len(v) <= 3 for v in by_anchor.values())
    # reproducible under a different physical layout
    out2 = sampling.contrastive_negatives(
        df.repartition(7, "source"), "doc_id", "source",
        buckets=4, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
