"""Unigram-LM tokenizer (operators/unigram.py) — Viterbi vs brute-force
enumeration, training on a corpus with a known dominant piece, char
never-pruned floor, Spark ≡ pure-Python count agreement, deterministic
retrain, and the q126-shaped encode surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.operators.unigram import (
    piece_scores_fp,
    seed_pieces,
    unigram_encode,
    unigram_train,
    viterbi_counts,
    viterbi_segment,
)


def _all_segmentations(word, vocab, max_len):
    if not word:
        yield []
        return
    for l in range(1, min(max_len, len(word)) + 1):
        if word[:l] in vocab:
            for rest in _all_segmentations(word[l:], vocab, max_len):
                yield [word[:l]] + rest


def test_viterbi_achieves_bruteforce_optimum():
    scores = piece_scores_fp(
        {"a": 5, "b": 4, "c": 3, "ab": 6, "bc": 2, "abc": 1, "cab": 7}
    )
    for word in ("abc", "abcabc", "cabab", "ccc", "a", "bcbc"):
        got = viterbi_segment(word, scores, max_piece_len=3)
        assert "".join(got) == word
        best = max(
            (sum(scores[p] for p in s), -len(s))
            for s in _all_segmentations(word, scores, 3)
        )
        assert (sum(scores[p] for p in got), -len(got)) == best, (word, got)
        # deterministic
        assert viterbi_segment(word, scores, max_piece_len=3) == got


def test_viterbi_raises_on_unsegmentable():
    import pytest

    with pytest.raises(KeyError):
        viterbi_segment("xyz", {"x": -1, "y": -1}, max_piece_len=3)


def test_seed_counts_and_char_floor(spark):
    words = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("zq", 1)], "word STRING, freq LONG"
    )
    got = {r["piece"]: r["count"] for r in seed_pieces(
        words, max_piece_len=3, seed_size=4, min_count=2
    ).collect()}
    # 'ab' occurrences: 2 per "abab" (pos 1,3) * 3 + 1 * 2 = 8
    assert got["ab"] == 8
    # chars survive even below min_count / outside the budget
    assert got["z"] == 1 and got["q"] == 1
    # 'zq' (count 1) filtered by min_count
    assert "zq" not in got
    # budget respected for multi-char pieces: top-4 by (count desc, piece asc)
    assert sum(1 for p in got if len(p) > 1) <= 4


def test_viterbi_counts_matches_pure_python(spark):
    rows = [("abab", 3), ("ababab", 1), ("ba", 2)]
    words = spark.createDataFrame(rows, "word STRING, freq LONG")
    seed = {r["piece"]: int(r["count"]) for r in seed_pieces(
        words, max_piece_len=4, seed_size=10, min_count=2
    ).collect()}
    scores = piece_scores_fp(seed)
    got = {r["piece"]: r["count"] for r in viterbi_counts(
        words, scores, max_piece_len=4
    ).collect()}
    want: dict[str, int] = {}
    for w, f in rows:
        for p in viterbi_segment(w, scores, 4):
            want[p] = want.get(p, 0) + f
    assert got == want


def test_train_keeps_dominant_piece_and_all_chars(spark):
    # 'ing' rides every word; max_piece_len=3 keeps whole words out of the
    # seed so the shared suffix is the best compression available
    rows = [("sing", 50), ("ring", 40), ("king", 30), ("bring", 20), ("xv", 1)]
    words = spark.createDataFrame(rows, "word STRING, freq LONG")
    vocab = unigram_train(
        spark, words, vocab_size=12, max_piece_len=3, seed_size=50, min_count=2
    )
    got = {r["piece"]: (r["count"], r["score_fp"], r["is_char"]) for r in vocab.collect()}
    alphabet = {c for w, _ in rows for c in w}
    assert alphabet <= set(got), "a character was pruned"
    assert "ing" in got, "the corpus-wide suffix did not survive pruning"
    assert got["ing"][0] == 140  # every word segments as prefix + 'ing'
    # score_fp is exactly the micro-nat log-prob of the final counts
    counts = {p: c for p, (c, _, _) in got.items()}
    want_scores = piece_scores_fp(counts)
    assert {p: s for p, (_, s, _) in got.items()} == want_scores
    assert all((len(p) == 1) == ischar for p, (_, _, ischar) in got.items())


def test_train_is_deterministic(spark):
    rows = [("banana", 7), ("bandana", 5), ("nab", 3)]
    words = spark.createDataFrame(rows, "word STRING, freq LONG")
    kw = dict(vocab_size=10, max_piece_len=3, seed_size=20, min_count=2)
    a = sorted(map(tuple, unigram_train(spark, words, **kw).collect()))
    b = sorted(map(tuple, unigram_train(spark, words, **kw).collect()))
    assert a == b


def test_seed_sql_mirror_matches_spark_on_testdata(spark, sf_dir):
    """The DuckDB mirror of the seed build (the SQL-expressible half of
    the r11 q148 oracle) value-matches the Spark seed on the real
    documents table — the X116 self-hosted-gate pattern."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path
    from briefly_spark.operators.bpe import word_freqs
    from briefly_spark.operators.unigram import sql_seed_pieces

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["piece"], r["count"])
        for r in seed_pieces(
            word_freqs(docs), max_piece_len=6, seed_size=1000, min_count=2
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = set(
        map(tuple, con.execute(sql_seed_pieces("documents")).fetchall())
    )
    assert got == want
    assert len(got) > 50  # real seed, not a degenerate fixture


def test_unrolled_em_mirror_matches_spark_on_testdata(spark, sf_dir):
    """The full unrolled-EM DuckDB mirror (the q148 oracle: seed → 3
    fixed hard-EM rounds → final vocab + per-doc fertility) value-matches
    the Spark query end-to-end on the real documents table at sf0.001 —
    the X116 self-hosted-gate pattern, here guarding the whole training
    replay (Viterbi tie-break key, det_ln scores, prune arithmetic)."""
    import duckdb

    from briefly_spark.catalog import table_path
    from briefly_spark.queries import load_registry

    reg = load_registry()
    spec = reg["q148_unigram_tokenizer"]
    got = set(map(tuple, spec.fn(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = set(map(tuple, con.execute(spec.oracle).fetchall()))
    assert got == want
    parts = {p for p, *_ in got}
    assert parts == {"piece", "doc"}  # both surfaces present


def test_encode_fertility_surface(spark):
    words = spark.createDataFrame(
        [("sing", 5), ("ring", 5), ("so", 2)], "word STRING, freq LONG"
    )
    vocab = unigram_train(
        spark, words, vocab_size=10, max_piece_len=4, seed_size=20, min_count=2
    )
    scores = {r["piece"]: int(r["score_fp"]) for r in vocab.collect()}
    docs = spark.createDataFrame(
        [(1, "sing ring sing"), (2, "so so")], "doc_id LONG, text STRING"
    )
    got = {r["id"]: r for r in unigram_encode(
        docs, vocab, id_col="doc_id", text_col="text", max_piece_len=4
    ).collect()}
    for did, text in ((1, "sing ring sing"), (2, "so so")):
        ws = text.split()
        n_pieces = sum(len(viterbi_segment(w, scores, 4)) for w in ws)
        assert got[did]["n_words"] == len(ws)
        assert got[did]["n_pieces"] == n_pieces
        assert got[did]["fertility_fp"] == (n_pieces * 10000) // len(ws)


def test_seed_plan_uses_takeordered_not_global_sort(spark, sf_dir):
    """The seed ranking (orderBy + limit over the piece-count frame) must
    plan as TakeOrdered — bounded by seed_size, never a global sort of
    the piece space (the q93 discipline; plan_lint will enforce this when
    the seed surface gates as q148)."""
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.bpe import word_freqs

    seed = seed_pieces(
        word_freqs(load_table(spark, sf_dir, "documents")),
        max_piece_len=6,
        seed_size=1000,
        min_count=2,
    )
    plan = seed._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert "Sort [" not in plan.split("TakeOrdered")[0], plan


def test_sample_segmentation_valid_deterministic_and_viterbi_limit():
    from briefly_spark.operators.unigram import sample_segmentation

    scores = piece_scores_fp({"a": 5, "b": 4, "ab": 9, "ba": 2, "aba": 1})
    for word in ("ab", "aba", "abab", "bab"):
        s1 = sample_segmentation(word, scores, 3, seed=7)
        assert "".join(s1) == word
        assert sample_segmentation(word, scores, 3, seed=7) == s1  # same seed
        # α → ∞ collapses to the Viterbi argmax
        hard = sample_segmentation(word, scores, 3, seed=7, alpha=1e6)
        assert hard == viterbi_segment(word, scores, 3), word


def test_sample_segmentation_matches_exact_distribution():
    """Empirical sampling frequencies over hash seeds match the exact
    P(seg) ∝ exp(α·score) on an enumerable lattice — deterministic (the
    seeds are fixed integers, the noise is md5)."""
    import math

    from briefly_spark.operators.unigram import SCORE_SCALE, sample_segmentation

    scores = piece_scores_fp({"a": 3, "b": 2, "ab": 4, "bb": 5})
    word = "abb"
    segs = list(_all_segmentations(word, scores, 2))
    w = [math.exp(sum(scores[p] for p in s) / SCORE_SCALE) for s in segs]
    z = sum(w)
    exact = {tuple(s): wi / z for s, wi in zip(segs, w)}
    n = 600
    counts: dict[tuple, int] = {}
    for seed in range(n):
        got = tuple(sample_segmentation(word, scores, 2, seed=seed))
        counts[got] = counts.get(got, 0) + 1
    assert set(counts) <= set(exact)
    for seg, p in exact.items():
        emp = counts.get(seg, 0) / n
        assert abs(emp - p) < 0.07, (seg, p, emp)


def test_sampled_counts_matches_pure_python(spark):
    from briefly_spark.operators.unigram import sample_segmentation, sampled_counts

    rows = [("abab", 3), ("bab", 2), ("aa", 5)]
    words = spark.createDataFrame(rows, "word STRING, freq LONG")
    seed_counts = {r["piece"]: int(r["count"]) for r in seed_pieces(
        words, max_piece_len=3, seed_size=10, min_count=2
    ).collect()}
    scores = piece_scores_fp(seed_counts)
    got = {r["piece"]: r["count"] for r in sampled_counts(
        words, scores, 3, seed=13
    ).collect()}
    want: dict[str, int] = {}
    for w, f in rows:
        for p in sample_segmentation(w, scores, 3, seed=13):
            want[p] = want.get(p, 0) + f
    assert got == want
