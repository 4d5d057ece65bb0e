"""BPE merge learning: exact equivalence with a pure-Python reference
implementation (Sennrich-style vocab BPE), determinism, early stop."""

from __future__ import annotations

from collections import Counter

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import bpe


def _ref_bpe(texts, n_merges, min_pair_count=2):
    """Reference BPE over the word vocabulary (greedy left-to-right
    apply, ties broken by (count desc, a, b))."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) + [bpe.EOW] for w in vocab}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, cnt in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((step, a, b, cnt))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


TEXTS = ["low low low low low",
         "lower lower newest newest newest",
         "newest newest newest widest widest",
         "the the the the a a a"]


def test_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [(m["step"], m["left"], m["right"], m["pair_count"])
           for m in bpe.learn_bpe(df, "text", n_merges=6)]
    assert got == _ref_bpe(TEXTS, 6)


def test_bpe_overlap_is_left_to_right(spark):
    # "aaaa": after merging (a,a), greedy left-to-right gives [aa, aa, </w>]
    # → pair (aa, aa) counts 1 per word, not 3 overlapping
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [(m["left"], m["right"], m["pair_count"])
           for m in bpe.learn_bpe(df, "text", n_merges=2)]
    ref = [(a, b, c) for _, a, b, c in _ref_bpe(["aaaa aaaa aaaa"], 2)]
    assert got == ref
    assert got[0] == ("a", "a", 9)       # 3 words × 3 left-to-right pairs
    # after [aa, aa, </w>]: (aa,aa) and (aa,</w>) both count 3; the
    # deterministic tie-break is lexicographic and '<' sorts before 'a'
    assert got[1] == ("aa", "</w>", 3)


def test_bpe_early_stop_and_determinism(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    # every pair occurs once → below min_pair_count=2 → no merges
    assert bpe.learn_bpe(df, "text", n_merges=4) == []
    df2 = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = bpe.learn_bpe(df2, "text", n_merges=4)
    b = bpe.learn_bpe(df2, "text", n_merges=4)
    assert a == b


def test_bpe_merge_table_frame(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    out = bpe.bpe_merge_table(df, "text", n_merges=3).collect()
    assert [r["step"] for r in out] == [0, 1, 2]
    assert all(r["pair_count"] >= 2 for r in out)
