"""BPE trainer: Spark pipeline vs the pure-Python reference encoder, and
the string-replace merge semantics on the adversarial adjacency shapes."""

from __future__ import annotations

import pytest

from briefly_spark.operators.bpe import (
    EOW,
    apply_merge,
    bpe_train,
    encode_word,
    pair_counts,
    symbolize,
    word_freqs,
)


def _train_reference(words: dict[str, int], rounds: int):
    """Pure-Python BPE trainer mirroring the Spark loop: greedy
    left-to-right merge application, (count DESC, lhs, rhs) argmax."""
    syms = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + words[w]
        if not counts:
            break
        (lhs, rhs), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((lhs, rhs, c))
        for w in syms:
            syms[w] = _merge_one(syms[w], lhs, rhs)
    return merges, syms


def _merge_one(s: list[str], lhs: str, rhs: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "low lower lowest",
    "low low low newer newest",
    "a b a b a b",
    "aaa aa a aaaa",
]


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING")
    wf = word_freqs(docs)
    merges_df, symframe = bpe_train(spark, wf, rounds=10)
    got = [(r.lhs, r.rhs, r.pair_freq) for r in merges_df.orderBy("merge_rank").collect()]

    words: dict[str, int] = {}
    for t in CORPUS:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    want, ref_syms = _train_reference(words, rounds=10)
    assert got == want

    # final symbolization agrees word-by-word with the reference encoder
    for row in symframe.collect():
        assert row.sym.strip().split("  ") == ref_syms[row.word], row
    symframe.unpersist()


def test_encode_word_reference_agrees_with_merge_one():
    merges = [("a", "a"), ("aa", "a"), ("b", EOW)]
    for w in ["a", "aa", "aaa", "aaaa", "aaaaa", "ab", "bab", "abab"]:
        s = list(w) + [EOW]
        for lhs, rhs in merges:
            s = _merge_one(s, lhs, rhs)
        assert encode_word(w, merges) == s


@pytest.mark.parametrize(
    "word,lhs,rhs,expect",
    [
        # back-to-back occurrences BOTH merge (the 2-space separator trick)
        ("abab", "a", "b", ["ab", "ab", EOW]),
        # overlapping run merges greedily left-to-right: aaa -> aa, a
        ("aaa", "a", "a", ["aa", "a", EOW]),
        ("aaaa", "a", "a", ["aa", "aa", EOW]),
        # no false substring matches: merged symbols anchor on separators
        ("xab", "a", "b", ["x", "ab", EOW]),
    ],
)
def test_apply_merge_adjacency(spark, word, lhs, rhs, expect):
    frame = symbolize(
        spark.createDataFrame([(word, 1)], "word STRING, freq LONG")
    )
    merged = apply_merge(frame, lhs, rhs)
    sym = merged.collect()[0].sym
    assert sym.strip().split("  ") == expect
    assert encode_word(word, [(lhs, rhs)]) == expect


def test_pair_counts_weighted(spark):
    frame = symbolize(
        spark.createDataFrame([("ab", 3), ("abc", 2)], "word STRING, freq LONG")
    )
    got = {(r.lhs, r.rhs): r.c for r in pair_counts(frame).collect()}
    assert got[("a", "b")] == 5
    assert got[("b", EOW)] == 3
    assert got[("b", "c")] == 2
    assert got[("c", EOW)] == 2
