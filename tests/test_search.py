"""Unit tests for the lexical retrieval operators (TF-IDF, BM25) — edge
semantics the oracle queries don't isolate: ubiquitous terms (idf = 0),
empty documents, self-exclusion, deterministic tie-breaks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from briefly_spark.operators.search import bm25_topk, term_postings, tfidf_topterms


def test_term_postings_counts_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b b"), (3, "   "), (4, "A a")],
        ["id", "text"],
    )
    got = {
        (r.doc_id, r.term): r.tf for r in term_postings(docs, "id", "text").collect()
    }
    # lowercased, whitespace-only doc contributes nothing
    assert got == {(1, "a"): 2, (1, "b"): 1, (1, "c"): 1, (2, "b"): 3, (4, "a"): 2}


def test_tfidf_ubiquitous_term_scores_zero(spark):
    # "x" appears in every doc -> idf = ln(1) = 0 exactly -> tfidf 0.0
    docs = spark.createDataFrame(
        [(1, "x x rare"), (2, "x common"), (3, "x common")], ["id", "text"]
    )
    rows = tfidf_topterms(docs, "id", "text", k=5).collect()
    by_doc_term = {(r.doc_id, r.term): r for r in rows}
    assert by_doc_term[(1, "x")].tfidf == 0.0
    # rare (df=1, tf=1): det_ln(3) - det_ln(1) ~ 1.0986 -> floor to 4 decimals
    from briefly_spark.numerics import det_ln_py

    expected = math.floor((det_ln_py(3) - det_ln_py(1)) * 10000.0) / 10000.0
    assert by_doc_term[(1, "rare")].tfidf == expected
    # doc 1 ranking: rare (positive) above the zero-score terms; zero-score
    # ties break alphabetically (x before... only x at 0 besides rare)
    d1 = sorted((r.rank, r.term) for r in rows if r.doc_id == 1)
    assert d1[0] == (1, "rare")


def test_bm25_excludes_self_and_ranks_matches_first(spark):
    docs = spark.createDataFrame(
        [
            (100, "spark shuffle join"),
            (1, "spark shuffle join window"),
            (2, "spark unrelated words here"),
            (3, "nothing in common at all"),
        ],
        ["id", "text"],
    )
    postings = term_postings(docs, "id", "text")
    qterms = postings.filter(F.col("doc_id") == 100).select(
        F.col("doc_id").alias("qid"), "term"
    )
    rows = bm25_topk(docs, qterms, "id", "text", k=5).collect()
    assert all(r.doc_id != 100 for r in rows)  # seed never retrieved
    ranked = sorted(rows, key=lambda r: r.rank)
    # doc 1 matches all 3 query terms, doc 2 only one, doc 3 none
    assert ranked[0].doc_id == 1 and ranked[0].n_terms_matched == 3
    assert ranked[1].doc_id == 2 and ranked[1].n_terms_matched == 1
    assert {r.doc_id for r in rows} == {1, 2}


def test_bm25_integer_fixed_point_sum_is_deterministic(spark):
    # same data, two different partitionings -> identical scores (the
    # fixed-point integer sum is order-independent by construction)
    rows = [(i, f"t{i % 3} t{i % 5} shared") for i in range(40)] + [(99, "shared t0")]
    docs1 = spark.createDataFrame(rows, ["id", "text"]).repartition(1)
    docs8 = spark.createDataFrame(rows, ["id", "text"]).repartition(8)
    q = lambda d: term_postings(d, "id", "text").filter(  # noqa: E731
        F.col("doc_id") == 99
    ).select(F.col("doc_id").alias("qid"), "term")
    r1 = {(r.qid, r.doc_id): r.bm25 for r in bm25_topk(docs1, q(docs1), "id", "text").collect()}
    r8 = {(r.qid, r.doc_id): r.bm25 for r in bm25_topk(docs8, q(docs8), "id", "text").collect()}
    assert r1 == r8 and r1


def test_quantized_topk_matches_exact_on_separable_vectors(spark):
    from briefly_spark.operators.similarity import quantized_topk, topk_cosine

    # orthogonal-ish integer vectors: quantization is lossless up to scale
    vecs = [
        (i, [1.0 if j == i % 4 else 0.1 * ((i + j) % 3) for j in range(4)])
        for i in range(24)
    ]
    df = spark.createDataFrame(vecs, ["id", "v"])
    queries = df.filter(F.col("id") < 4).select(F.col("id").alias("query_id"), "v")
    corpus = df.select(F.col("id").alias("neighbor_id"), "v")
    approx = quantized_topk(queries, corpus, k=3, rerank_factor=4)
    exact = topk_cosine(queries, corpus, k=3)
    a = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in approx.collect()}
    e = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in exact.collect()}
    assert a == e


def test_quantize_int8_zero_vector_and_range(spark):
    from briefly_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.5, -1.0]), (3, [3.0, 2.9999])], ["id", "v"]
    )
    got = {r.id: r.q for r in df.select("id", quantize_int8(F.col("v")).alias("q")).collect()}
    assert got[1] == [0.0, 0.0]
    assert got[2] == [math.floor(0.5 / 1.0 * 127), -127.0]
    assert got[3][0] == 127.0 and -127.0 <= got[3][1] <= 127.0


def test_lm_doc_scores_hand_computed(spark):
    import math

    from briefly_spark.operators.lm import lm_doc_scores

    # corpus: vocab {a, b}, V=2; unigrams a:4 (incl. doc3's lone token) b:2
    # doc1 bigrams: (a,b), (b,a); doc2: (a,b); doc3: single token -> no row
    docs = spark.createDataFrame([(1, "a b a"), (2, "a b"), (3, "a")], ["id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in lm_doc_scores(docs, "id", "text").collect()}
    from briefly_spark.numerics import det_ln_py

    nll_ab = math.floor((det_ln_py(4 + 2) - det_ln_py(2 + 1)) * 10000.0)  # c12(a,b)=2
    nll_ba = math.floor((det_ln_py(2 + 2) - det_ln_py(1 + 1)) * 10000.0)  # c12(b,a)=1
    assert set(got) == {1, 2}
    assert got[1] == (2, ((nll_ab + nll_ba) // 2) / 10000.0)
    assert got[2] == (1, nll_ab / 10000.0)


def test_lm_scores_rank_outlier_doc_highest(spark):
    from pyspark.sql import functions as F

    from briefly_spark.operators.lm import lm_doc_scores

    # ten similar docs + one outlier built from tokens no other doc uses:
    # every outlier bigram is unseen (count 1), so its avg NLL is the max
    rows = [(i, "spark table join shuffle agg window scan") for i in range(10)]
    rows.append((99, "zq xv qj wk vn mz yq"))
    docs = spark.createDataFrame(rows, ["id", "text"])
    top = (
        lm_doc_scores(docs, "id", "text")
        .orderBy(F.desc("avg_nll"))
        .limit(1)
        .collect()[0]
    )
    assert top.doc_id == 99


def test_lm_c12_modes_identical(spark):
    import pytest

    from briefly_spark.operators.lm import lm_doc_scores

    rows = [(i, f"w{i % 4} shared w{(i + 1) % 4} shared tail{i % 2}") for i in range(25)]
    docs = spark.createDataFrame(rows, ["id", "text"])
    w = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in lm_doc_scores(docs, "id", "text").collect()}
    j = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in lm_doc_scores(docs, "id", "text", c12_mode="join").collect()
    }
    assert w == j and len(w) == 25
    with pytest.raises(ValueError, match="c12_mode"):
        lm_doc_scores(docs, "id", "text", c12_mode="bogus")


def test_bm25_string_qids_do_not_silently_drop_matches(spark):
    # When qids are NOT doc ids (general API shape: e.g. named probes), a
    # string-qid vs long-doc_id self-exclusion filter would coerce to NULL
    # and drop every row; the guard skips the filter on type mismatch.
    docs = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, "unrelated words entirely")], ["id", "text"]
    )
    qterms = spark.createDataFrame(
        [("probe-a", "spark"), ("probe-a", "join")], ["qid", "term"]
    )
    rows = bm25_topk(docs, qterms, "id", "text", k=5).collect()
    assert {r.qid for r in rows} == {"probe-a"}
    assert rows and rows[0].doc_id == 1


# ---------------------------------------------------------------------------
# Positional phrase search (q142).
# ---------------------------------------------------------------------------
def test_phrase_topk_counts_adjacency(spark):
    from briefly_spark.operators.search import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # "a b" x3
            (2, "a b c"),        # "a b" x1
            (3, "b a b a"),      # "a b" x1 (positions 1-2)
            (4, "a c b"),        # no adjacent "a b"
            (5, "a a a"),        # "a a" x2 (overlapping occurrences count)
        ],
        ["id", "text"],
    )
    phrases = spark.createDataFrame(
        [(10, "a", "b"), (20, "a", "a")], ["qid", "w1", "w2"]
    )
    got = {
        (r.qid, r.doc_id): (r.n_hits, r.rank)
        for r in phrase_topk(docs, phrases, "id", "text", k=5).collect()
    }
    assert got == {
        (10, 1): (3, 1),
        (10, 2): (1, 2),  # tie on n_hits with doc 3 -> lower doc_id first
        (10, 3): (1, 3),
        (20, 5): (2, 1),
    }


def test_phrase_topk_k_bound_and_order_sensitivity(spark):
    from briefly_spark.operators.search import phrase_topk

    docs = spark.createDataFrame(
        [(i, "x y") for i in range(1, 8)] + [(9, "y x")], ["id", "text"]
    )
    out = phrase_topk(
        docs,
        spark.createDataFrame([(1, "x", "y")], ["qid", "w1", "w2"]),
        "id", "text", k=3,
    ).collect()
    # 7 matching docs, k=3 keeps the 3 lowest ids; "y x" never matches
    assert [(r.doc_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        (1, 1), (2, 2), (3, 3)
    ]


# ---------------------------------------------------------------------------
# CCNet head/middle/tail buckets (q140) — discrete-tercile invariants.
# ---------------------------------------------------------------------------
def test_ccnet_buckets_tercile_invariants(spark, sf_dir):
    from briefly_spark.queries import load_registry

    rows = (
        load_registry()["q140_ccnet_ppl_buckets"]
        .fn(spark, sf_dir)
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        n = len(rs)
        heads = [r.avg_nll_fp for r in rs if r.bucket == "head"]
        mids = [r.avg_nll_fp for r in rs if r.bucket == "middle"]
        tails = [r.avg_nll_fp for r in rs if r.bucket == "tail"]
        # discrete-cut cumulative bounds: cum(head) >= n/3, cum(head+mid) >= 2n/3
        assert 3 * len(heads) >= n, lang
        assert 3 * (len(heads) + len(mids)) >= 2 * n, lang
        # score ordering between buckets is strict (cuts are values)
        if heads and mids:
            assert max(heads) < min(mids), lang
        if mids and tails:
            assert max(mids) < min(tails), lang
        assert all(r.bucket in order for r in rs)


# ---------------------------------------------------------------------------
# Intra-document entropy (q143) — hand-computed pin.
# ---------------------------------------------------------------------------
def test_doc_entropy_hand_computed(spark, tmp_path):
    from briefly_spark.numerics import det_ln_py
    from briefly_spark.queries import load_registry

    docs = spark.createDataFrame(
        [
            (1, "a a a a", "en", "s", 7),      # zero entropy: single type
            (2, "a b a b", "en", "s", 7),      # uniform over 2 types
            (3, "a a a b", "en", "s", 7),      # skewed
            (4, "w x y z", "en", "s", 7),      # max entropy: all unique
            (5, "", "en", "s", 0),             # empty: no postings row
        ],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in load_registry()["q143_doc_entropy"].fn(spark, str(tmp_path)).collect()
    }

    def efp(dl: int, n: int) -> int:
        import math
        return math.floor((det_ln_py(dl) - det_ln_py(n)) * 10000.0)

    assert set(rows) == {1, 2, 3, 4}  # empty doc drops out
    assert (rows[1].n_toks, rows[1].n_types, rows[1].ent_sum_fp) == (4, 1, 0)
    assert rows[2].ent_sum_fp == 2 * efp(4, 2) + 2 * efp(4, 2)
    assert rows[3].ent_sum_fp == 3 * efp(4, 3) + 1 * efp(4, 1)
    assert rows[4].ent_sum_fp == 4 * efp(4, 1)
    # ordering: repetitive < skewed < uniform-2 < all-unique (per-token mean;
    # equal n_toks here so the raw sums order identically)
    assert (
        rows[1].ent_sum_fp < rows[3].ent_sum_fp
        < rows[2].ent_sum_fp < rows[4].ent_sum_fp
    )


# ---------------------------------------------------------------------------
# Held-out LM scoring (q145) — unseen-event semantics, hand-computed.
# ---------------------------------------------------------------------------
def test_lm_holdout_unseen_events_hand_computed(spark):
    import math

    from briefly_spark.numerics import det_ln_py
    from briefly_spark.operators.lm import lm_holdout_nll_sums

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], ["id", "text"]
    )  # unigrams: a=3, b=2, c=1 -> V=3; bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    score = spark.createDataFrame(
        [(10, "a b"), (11, "a z"), (12, "q r")], ["id", "text"]
    )
    rows = {
        r.doc_id: r for r in lm_holdout_nll_sums(train, score, "id", "text").collect()
    }

    def nll(c1: int, c12: int) -> int:
        return math.floor(
            (det_ln_py(c1 + 3) - det_ln_py(c12 + 1)) * 10000.0
        )

    # seen bigram: c1(a)=3, c12(a,b)=2
    assert rows[10].nll_sum_fp == nll(3, 2) and rows[10].n_bigrams == 1
    # seen head, unseen tail: c1(a)=3, c12=0
    assert rows[11].nll_sum_fp == nll(3, 0)
    # fully novel head: c1=0, c12=0 -> ln(V) - ln(1)
    assert rows[12].nll_sum_fp == nll(0, 0)
    assert rows[12].nll_sum_fp == math.floor(det_ln_py(3) * 10000.0)
    # in-domain scores lowest; the smoothing artifact orders the unseen
    # cases: a fully-novel head gets p = 1/V (> 1/(c1+V) for a seen head
    # with an unseen tail), so seen-head/unseen-tail is the MOST surprised
    assert rows[10].nll_sum_fp < rows[12].nll_sum_fp < rows[11].nll_sum_fp


def test_hybrid_rrf_dense_branch_routes_to_lsh_above_pair_bound(spark, sf_dir, monkeypatch):
    """r15 scale pin: q129's dense branch is q·n with BOTH sides growing
    (queries are vec_id % 100) — a K² term.  Above the pair bound it must
    route to lsh_topk and still produce the fused contract (schema,
    per-query top-k, sane ranks); at every gate-swept SF the bound keeps
    the exact tier, so this forces the LSH path with a tiny bound."""
    import briefly_spark.queries.search as qs

    monkeypatch.setattr(qs, "_HYB_EXACT_MAX_PAIRS", 1)
    out = qs.q129_hybrid_rrf(spark, sf_dir)
    rows = out.collect()
    assert rows, "LSH-tier hybrid returned nothing"
    assert out.columns == ["qid", "id", "rank", "fused_fp", "n_branches"]
    per_q = {}
    for r in rows:
        assert 1 <= r.rank <= 5 and r.n_branches in (1, 2)
        per_q.setdefault(r.qid, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
