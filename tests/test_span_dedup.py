"""remove_duplicate_spans (E102): pure-Python reference parity, alignment
coverage, short-doc and all-unique edge cases, plan shape."""

from __future__ import annotations

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import text as T


def _reference(rows, k, max_docfreq):
    """Brute-force twin: gram docfreq over all docs, cut covered tokens."""
    from collections import defaultdict
    toks = {i: t.split(" ") for i, t in rows}
    docs_per_gram = defaultdict(set)
    for i, tk in toks.items():
        for s in range(len(tk) - k + 1):
            docs_per_gram[" ".join(tk[s:s + k])].add(i)
    out = {}
    for i, tk in toks.items():
        cov = set()
        for s in range(len(tk) - k + 1):
            if len(docs_per_gram[" ".join(tk[s:s + k])]) > max_docfreq:
                cov.update(range(s, s + k))
        kept = [t for j, t in enumerate(tk) if j not in cov]
        out[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    return out


def _run(spark, rows, k=3, max_docfreq=1):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens_kept"],
                         r["n_tokens_removed"])
           for r in T.remove_duplicate_spans(
               df, "doc_id", "text", k=k, max_docfreq=max_docfreq)
           .collect()}
    assert got == _reference(rows, k, max_docfreq), got
    return got


def test_shared_passage_cut_from_both_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta unique one"),
        (2, "intro words alpha beta gamma delta epsilon zeta outro"),
        (3, "totally different tokens here nothing shared at all"),
    ]
    got = _run(spark, rows, k=4)
    # the shared 6-token passage is covered at every alignment in both
    assert "alpha" not in got[1][0] and "zeta" not in got[2][0]
    assert got[3][1] == 8 and got[3][2] == 0      # untouched doc


def test_any_alignment_is_caught(spark):
    # duplicate passage starts mid-doc on one side — overlapping k-grams
    # must still cover it (the fixed-segment operator would miss this)
    rows = [
        (1, "x1 x2 dup1 dup2 dup3 dup4 y1"),
        (2, "dup1 dup2 dup3 dup4 z1 z2 z3"),
    ]
    got = _run(spark, rows, k=4)
    for d in (1, 2):
        for t in ("dup1", "dup2", "dup3", "dup4"):
            assert t not in got[d][0]


def test_short_docs_and_within_doc_repeats(spark):
    rows = [
        (1, "tiny"),                               # shorter than k
        (2, "a b a b a b a b"),                    # repeats only WITHIN
        (3, "c d e f g h"),
    ]
    got = _run(spark, rows, k=3)
    # within-doc repetition is not cross-document duplication: docfreq=1
    assert got[2] == ("a b a b a b a b", 8, 0)
    assert got[1] == ("tiny", 1, 0)


def test_plan_no_position_self_join(spark):
    df = spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")],
                               ["doc_id", "text"])
    out = T.remove_duplicate_spans(df, "doc_id", "text", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the covered-position computation is the in-row linear run-merge —
    # never a per-token EXISTS over the start list (ArrayExists) and never
    # a position self-join
    assert "ArrayExists" not in plan


def test_plan_broadcast_gate_both_shapes(spark):
    """round-4 VERDICT item 3: the duplicated-gram set's join strategy is
    gated — forced broadcast under, shuffle hash join over (web scale where
    the docfreq>1 gram set is unbroadcastable)."""
    df = spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")],
                               ["doc_id", "text"])
    plan_b = (T.remove_duplicate_spans(df, "doc_id", "text", k=3,
                                       broadcast_common=True)
              ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi, BuildRight" in plan_b and "BroadcastHashJoin" in plan_b
    plan_s = (T.remove_duplicate_spans(df, "doc_id", "text", k=3,
                                       broadcast_common=False)
              ._jdf.queryExecution().executedPlan().toString())
    assert "ShuffledHashJoin" in plan_s and "LeftSemi" in plan_s
    seg_b = (T.remove_common_segments(df, "doc_id", "text", seg_tokens=2,
                                      broadcast_common=True)
             ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in seg_b
    seg_s = (T.remove_common_segments(df, "doc_id", "text", seg_tokens=2,
                                      broadcast_common=False)
             ._jdf.queryExecution().executedPlan().toString())
    assert "ShuffledHashJoin" in seg_s
    # outputs identical under every strategy
    for fn, kw in ((T.remove_duplicate_spans, {"k": 3}),
                   (T.remove_common_segments, {"seg_tokens": 2})):
        outs = [sorted(map(tuple, fn(df, "doc_id", "text",
                                     broadcast_common=bc, **kw).collect()))
                for bc in (None, True, False)]
        assert outs[0] == outs[1] == outs[2]
