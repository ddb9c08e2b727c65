"""Unit tests for text-analysis operators (language-ID, quality, tokens,
winnowing) — property checks at sf0.001; cross-engine equivalence is
covered by the oracle harness (tests/test_queries_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from briefly_spark.operators.textstats import (
    bpe_token_count,
    language_id,
    quality_score,
    winnow_fingerprint,
    word_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).first()["v"]


def test_language_id_lexicon_hits(spark):
    assert _one(spark, "the cat and the hat is a cat", language_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist", language_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh qwerty", language_id(F.col("text"))) == "und"


def test_language_id_tie_prefers_alphabetical(spark):
    # one hit each for de ('und') and en ('the') → tie → 'de' wins (priority)
    assert _one(spark, "und the zzz", language_id(F.col("text"))) == "de"


def test_token_counts(spark):
    assert _one(spark, "hello, world! x9", word_count(F.col("text"))) == 3
    # hello , world ! x 9 → 6 BPE-ish tokens
    assert _one(spark, "hello, world! x9", bpe_token_count(F.col("text"))) == 6


def test_quality_bounds(spark, sf_dir):
    from briefly_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 10.0 for r in rows)


def test_winnow_shared_substring_shares_fingerprint(spark):
    # winnow(k=8, w=4): any shared run >= k+w-1 = 11 chars must share a hash
    shared = "abcdefghijklmnop"
    df = spark.createDataFrame(
        [("x" + shared + "qqq",), ("zzzz" + shared,)], ["text"]
    ).select(winnow_fingerprint(F.col("text"), k=8, w=4).alias("fp"))
    a, b = [set(r["fp"]) for r in df.collect()]
    assert a & b


def test_winnow_short_text_fallback(spark):
    fp = _one(spark, "tiny", winnow_fingerprint(F.col("text"), k=8, w=4))
    assert len(fp) == 1


def test_gopher_rule_components(spark):
    from briefly_spark.operators.textstats import (
        alpha_word_fraction,
        bullet_line_fraction,
        duplicate_line_fraction,
        ellipsis_line_fraction,
        symbol_word_ratio,
    )

    text = "the cat sat\nthe cat sat\n- bullet one\nreading on...\n# # tag"
    df = spark.createDataFrame([(text,)], ["t"])
    r = df.select(
        duplicate_line_fraction(F.col("t")).alias("dup"),
        bullet_line_fraction(F.col("t")).alias("bul"),
        ellipsis_line_fraction(F.col("t")).alias("ell"),
        alpha_word_fraction(F.col("t")).alias("alpha"),
        symbol_word_ratio(F.col("t")).alias("sym"),
    ).collect()[0]
    assert r.dup == pytest.approx(1 - 4 / 5)   # one duplicated line of 5
    assert r.bul == pytest.approx(1 / 5)
    assert r.ell == pytest.approx(1 / 5)
    assert r.alpha == pytest.approx(11 / 14)   # '-', '#', '#' have no letter
    assert r.sym == pytest.approx((2 + 1) / 14)  # two '#' + one '...'


def test_pii_scrub_and_counts(spark):
    from briefly_spark.operators.textstats import pii_counts, pii_scrub

    text = "mail a.b+c@ex.org or 555-123-4567, host 10.0.0.7 end"
    df = spark.createDataFrame([(text,)], ["t"])
    counts = pii_counts(F.col("t"))
    r = df.select(
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
        pii_scrub(F.col("t")).alias("s"),
    ).collect()[0]
    assert (r.e, r.p, r.i) == (1, 1, 1)
    assert r.s == "mail <EMAIL> or <PHONE>, host <IP> end"


def test_hash_split_stable_and_partitioned(spark):
    from briefly_spark.operators.textstats import hash_split

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    got = df.select("doc_id", hash_split(F.col("doc_id")).alias("s")).collect()
    by_split = {}
    for r in got:
        by_split.setdefault(r.s, set()).add(r.doc_id)
    assert set(by_split) == {"train", "val", "test"}
    # ~5% val / ~5% test with hash noise
    assert 40 <= len(by_split["val"]) <= 160
    assert 40 <= len(by_split["test"]) <= 160
    # stability: re-evaluation and subset evaluation agree row-for-row
    again = {r.doc_id: r.s for r in
             df.filter(F.col("doc_id") < 500)
               .select("doc_id", hash_split(F.col("doc_id")).alias("s")).collect()}
    for doc_id, s in again.items():
        assert doc_id in by_split[s]


def test_pack_sequences_budget_property(spark):
    from briefly_spark.operators.textstats import pack_sequences

    rows = [("a", i, 100 + (i * 37) % 200) for i in range(50)] + [
        ("b", i, 400) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, ord long, toks long")
    packed = pack_sequences(df, group_col="g", order_col="ord", tokens_col="toks", budget=512)
    out = packed.collect()
    # bin assignment is deterministic and order-monotone within a group
    bins = {}
    for r in sorted(out, key=lambda r: (r.g, r.ord)):
        bins.setdefault((r.g, r.bin), []).append(r.toks)
        prev = [x.bin for x in out if x.g == r.g and x.ord < r.ord]
        assert all(b <= r.bin for b in prev)
    for (_, _), toks in bins.items():
        # first-fit approximation: a bin exceeds budget by less than its
        # final document, and only the last doc can overflow
        assert sum(toks) - toks[-1] < 512


def test_mixture_accept_matches_rate(spark):
    from briefly_spark.operators.textstats import mixture_accept

    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    n = df.filter(mixture_accept(F.col("doc_id"), F.lit(0.3))).count()
    assert 0.25 * 5000 < n < 0.35 * 5000


def test_stratified_sample_exact_quotas_and_stability(spark):
    from briefly_spark.operators.textstats import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else "b") for i in range(50)], "doc_id long, source string"
    )
    quotas = spark.createDataFrame([("a", 7), ("b", 100)], "source string, quota int")
    out = stratified_sample(df, quotas, stratum_col="source", id_col="doc_id")
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.source, set()).add(r.doc_id)
    # exact quota when the stratum is large enough; whole stratum when not
    assert len(by["a"]) == 7 and len(by["b"]) == 10
    # content-stable: identical selection regardless of input partitioning
    again = stratified_sample(
        df.repartition(13), quotas, stratum_col="source", id_col="doc_id"
    ).collect()
    assert {(r.source, r.doc_id) for r in again} == {(r.source, r.doc_id) for r in rows}


def test_remove_boilerplate_lines(spark):
    from briefly_spark.operators.textstats import remove_boilerplate_lines

    docs = [
        (i, f"Unique content line {i} stays.\nShared cookie banner text here.\nno punct\nHi.")
        for i in range(12)
    ]
    # doc 99 contains ONLY boilerplate/rule-failing lines → absent from output
    docs.append((99, "Shared cookie banner text here.\nxx"))
    df = spark.createDataFrame(docs, "doc_id long, t string")
    out = {
        r.id: (r.clean_text, r.n_kept)
        for r in remove_boilerplate_lines(
            df, id_col="doc_id", text_col="t", min_words=3, min_docs=10
        ).collect()
    }
    assert 99 not in out
    assert set(out) == set(range(12))
    for i in range(12):
        # banner (13 docs ≥ 10) dropped corpus-wide; short/unpunctuated
        # lines dropped by per-line rules; unique content survives in order
        assert out[i] == (f"Unique content line {i} stays.", 1)


def test_pack_sequences_exact_invariants(spark):
    from briefly_spark.operators.textstats import pack_sequences_exact

    df = spark.createDataFrame(
        [("g", 1, 300), ("g", 2, 500), ("g", 3, 120), ("g", 4, 0), ("h", 9, 1300)],
        "grp string, ord long, toks long",
    )
    out = pack_sequences_exact(
        df, group_col="grp", order_col="ord", tokens_col="toks", budget=512
    ).collect()
    rows = [(r.grp, r.ord, r.bin, r.offset, r.take) for r in out]
    # doc 2 (tokens 300..800 of group g) straddles the 512 boundary → two
    # slices; doc 9 spans three bins alone; zero-token doc 4 emits nothing
    assert sorted(rows) == [
        ("g", 1, 0, 0, 300),
        ("g", 2, 0, 0, 212),
        ("g", 2, 1, 212, 288),
        ("g", 3, 1, 0, 120),
        ("h", 9, 0, 0, 512),
        ("h", 9, 1, 512, 512),
        ("h", 9, 2, 1024, 276),
    ]
    # per-document token conservation and exact non-final bins
    by_doc, by_bin = {}, {}
    for g, o, b, off, take in rows:
        by_doc[(g, o)] = by_doc.get((g, o), 0) + take
        by_bin[(g, b)] = by_bin.get((g, b), 0) + take
    assert by_doc == {("g", 1): 300, ("g", 2): 500, ("g", 3): 120, ("h", 9): 1300}
    assert by_bin[("g", 0)] == 512 and by_bin[("h", 0)] == 512 and by_bin[("h", 1)] == 512


def test_z_interleave_three_dims_bijective(spark):
    """The N-dim Morton generator must be a bijection on the bucket cube:
    every (x, y, z) triple in [0,8)^3 maps to a distinct 9-bit z-value."""
    from briefly_spark.functions.layout import z_interleave_sql

    df = spark.sql(
        "SELECT x, y, z FROM range(8) t1(x), range(8) t2(y), range(8) t3(z)"
    )
    expr = z_interleave_sql(["x", "y", "z"], "spark", bits=3)
    vals = [r[0] for r in df.selectExpr(f"{expr} AS m").collect()]
    assert len(vals) == 512
    assert sorted(vals) == list(range(512))
