"""Operator-level dedup tests: inverted-index Jaccard pairs (block
isolation, threshold, degenerate docs) and exact-dedup survivor policy."""

from __future__ import annotations

from briefly_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs


def test_ngram_jaccard_pairs_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "the quick brown fox jumps over the lazy dog"),
            (2, "a", "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "a", "completely different text about spark engines here"),
            (4, "b", "the quick brown fox jumps over the lazy dog"),  # dup of 1, other block
        ],
        ["id", "blk", "text"],
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in ngram_jaccard_pairs(
            df, "id", "text", n=3, threshold=0.5, block_cols=("blk",)
        ).collect()
    }
    # near-dup found within its block; identical text in another block NOT paired
    assert set(got) == {(1, 2)}
    assert 0.5 <= got[(1, 2)] < 1.0


def test_ngram_jaccard_pairs_identical_and_short(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five"),  # exact dup -> jac 1.0
            (3, "xy"),  # shorter than n words -> no shingles, never paired
        ],
        ["id", "text"],
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}


def test_exact_dedup_min_id_survivor(spark):
    df = spark.createDataFrame(
        [(5, "same"), (2, "same"), (9, "other")], ["id", "text"]
    )
    got = {r.keep_id: r.n_copies for r in exact_dedup(df, "text", "id").collect()}
    assert got == {2: 2, 9: 1}
