"""Unigram-LM tokenizer (E104): exact parity with a pure-Python hard-EM
reference, Viterbi determinism, coverage, encode stats."""

from __future__ import annotations

import math
from collections import Counter

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import unigram as U


# -- pure-Python reference (mirrors the documented determinism contract) ----

def _ref_candidates(counts, max_len, cap):
    c = Counter()
    for w, n in counts.items():
        for s in range(len(w)):
            for ln in range(1, min(max_len, len(w) - s) + 1):
                c[w[s:s + ln]] += n
    singles = {p: n for p, n in c.items() if len(p) == 1}
    multi = sorted(((p, n) for p, n in c.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:cap]
    return sorted(list(singles.items()) + multi,
                  key=lambda pc: (-pc[1], pc[0]))


def _ref_train(counts, vocab_size, max_len, cap, prune_frac, rounds):
    pieces = _ref_candidates(counts, max_len, cap)
    for _ in range(rounds):
        logp = U._logp_table(pieces)
        floor_lp = min(logp.values()) - 10.0
        agg = Counter()
        for w, n in counts.items():
            for p in U._viterbi(w, logp, max_len, floor_lp):
                agg[p] += n
        survivors = [(p, agg.get(p, 0)) for p, _ in pieces]
        singles = [(p, c) for p, c in survivors if len(p) == 1]
        multi = [(p, c) for p, c in survivors if len(p) > 1 and c > 0]
        target = max(vocab_size - len(singles), 0)
        if len(multi) > target:
            multi.sort(key=lambda pc: (pc[1], U._desc_key(pc[0])))
            n_drop = min(len(multi) - target,
                         max(1, int(len(multi) * prune_frac)))
            multi = multi[n_drop:]
        pieces = sorted(singles + multi, key=lambda pc: (-pc[1], pc[0]))
        if len(pieces) <= vocab_size:
            break
    return pieces


_DOCS = [
    (0, "hello world wordplay"),
    (1, "hello wordy worlds"),
    (2, "low lower lowest newest widest"),
    (3, "hello hello world low low low"),
]


def _counts():
    c = Counter()
    for _, t in _DOCS:
        c.update(t.split())
    return dict(c)


def test_viterbi_prefers_known_long_pieces():
    logp = {"h": -5.0, "e": -5.0, "l": -5.0, "o": -5.0, "hell": -2.0,
            "hello": -1.5, "lo": -3.0}
    assert U._viterbi("hello", logp, 6, -30.0) == ["hello"]
    assert U._viterbi("hellolo", logp, 6, -30.0) == ["hello", "lo"]
    # unknown chars fall back to the floor, never crash
    assert U._viterbi("hx", logp, 6, -30.0) == ["h", "x"]


def test_train_matches_python_reference(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    got = U.train_unigram(docs, vocab_size=30, max_piece_len=5,
                          candidate_cap=40, prune_frac=0.25, max_rounds=4)
    want = _ref_train(_counts(), 30, 5, 40, 0.25, 4)
    assert got == want
    assert len(got) <= max(30, sum(1 for p, _ in got if len(p) == 1))
    # coverage closure: every character of the corpus is a piece
    chars = {ch for w in _counts() for ch in w}
    assert chars <= {p for p, _ in got if len(p) == 1}


def test_encode_docs_counts_are_consistent(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    pieces = U.train_unigram(docs, vocab_size=30, max_piece_len=5,
                             candidate_cap=40)
    out = {r["doc_id"]: r for r in
           U.encode_docs(docs, pieces).collect()}
    logp = U._logp_table(pieces)
    floor_lp = min(logp.values()) - 10.0
    for did, text in _DOCS:
        words = text.split()
        want = sum(len(U._viterbi(w, logp, 5, floor_lp)) for w in words)
        assert out[did]["n_words"] == len(words)
        assert out[did]["n_pieces"] == want
        assert abs(out[did]["pieces_per_word"]
                   - want / len(words)) < 1e-12
    # pieces per word ≥ 1 always (full coverage, no dropped words)
    assert all(r["n_pieces"] >= r["n_words"] for r in out.values())
