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


def _ref_encode(word, merges):
    s = list(word) + [bpe.EOW]
    for _, a, b, _c in merges:
        out = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        s = out
    return s


def test_encode_words_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe.learn_bpe(df, "text", n_merges=6)
    ref_merges = _ref_bpe(TEXTS, 6)
    words = sorted({w for t in TEXTS for w in t.split(" ")})
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["pieces"]
           for r in bpe.encode_words(wdf, merges, checkpoint_every=3).collect()}
    for w in words:
        assert got[w] == _ref_encode(w, ref_merges), w
        # pieces always reassemble the word + EOW marker
        assert "".join(got[w]) == w + bpe.EOW


def test_encode_docs_and_stats(spark):
    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest")],
        "doc_id long, text string")
    merges = bpe.learn_bpe(df, "text", n_merges=4)
    enc = bpe.encode_docs(df, merges)
    rows = {(r["doc_id"], r["pos"]): (r["word"], r["pieces"])
            for r in enc.collect()}
    assert rows[(1, 0)][0] == "low" and rows[(1, 2)][0] == "lower"
    assert len(rows) == 5
    stats = {r["doc_id"]: r for r in bpe.doc_bpe_stats(df, merges).collect()}
    assert stats[1]["n_words"] == 3 and stats[2]["n_words"] == 2
    char_level = {1: sum(len(w) + 1 for w in ["low", "low", "lower"]),
                  2: sum(len(w) + 1 for w in ["newest", "widest"])}
    for doc_id, r in stats.items():
        assert r["pieces_per_word"] == r["n_pieces"] / r["n_words"]
        # merges must compress below char-level, never below 1 piece/word
        assert r["n_words"] <= r["n_pieces"] < char_level[doc_id]


def test_encode_empty_merge_table(spark):
    """No merges → every word is its raw character stream + EOW."""
    df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    out = {r["word"]: r["pieces"]
           for r in bpe.encode_docs(df, []).collect()}
    assert out == {"ab": ["a", "b", bpe.EOW], "c": ["c", bpe.EOW]}


def test_local_and_distributed_loops_agree(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    local = bpe.learn_bpe(df, "text", n_merges=6)  # vocab under the cap
    dist = bpe.learn_bpe(df, "text", n_merges=6, driver_vocab_max=0)
    assert local == dist == [
        {"step": s, "left": a, "right": b, "pair_count": c}
        for s, a, b, c in _ref_bpe(TEXTS, 6)]
