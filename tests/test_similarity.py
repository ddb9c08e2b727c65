"""Similarity & vector operator tests: LSH recall vs exact baseline,
mean-pool correctness, related-articles fallback/default semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.functions.vectors import cosine, mean_pool
from briefly_spark.operators.similarity import ivf_topk, lsh_topk, related_topk, topk_cosine


def test_cosine_known_values(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])], ["a", "b"])
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert abs(got[0] - 0.0) < 1e-12
    assert abs(got[1] - 1.0) < 1e-12


def test_cosine_zero_vector_guard(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c == 0.0


def test_mean_pool(spark):
    df = spark.createDataFrame(
        [("u", [1.0, 2.0]), ("u", [3.0, 4.0]), ("w", [5.0, 6.0])], ["url", "vec"]
    )
    got = {r.url: r.vector for r in mean_pool(df, ["url"], "vec").collect()}
    assert got["u"] == [2.0, 3.0]
    assert got["w"] == [5.0, 6.0]


def test_lsh_recall_vs_exact(spark, sf_dir):
    from briefly_spark.queries.similarity import _emb

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_cosine(queries, corpus, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(queries, corpus, dims=64, k=5, bits=4, tables=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # multi-table LSH (4 tables × 4 bits) over *random* vectors — real
    # corpora with genuine near-dups recall far higher; assert usability.
    assert recall > 0.3, f"LSH recall degenerate: {recall:.2f}"


def test_ivf_recall_vs_exact(spark, sf_dir):
    from briefly_spark.queries.similarity import _emb

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_cosine(queries, corpus, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(queries, corpus, k=5, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 4/16 cells probed over *random* vectors (no cluster structure) — the
    # worst case for IVF; assert usability, not production recall.
    assert recall > 0.3, f"IVF recall degenerate: {recall:.2f}"


def test_related_topk_fallback_and_default(spark):
    # topic "a" has only the query + 1 member → fallback must fill from "b";
    # neighbor 99 has no score row → deterministic default (5) applies.
    mkv = lambda seed: [float(seed), 1.0, 0.0]  # noqa: E731
    queries = spark.createDataFrame([(1, "a", [1.0, 1.0, 0.0])], ["query_id", "topic", "v"])
    corpus = spark.createDataFrame(
        [(2, "a", mkv(1)), (10, "b", mkv(2)), (11, "b", mkv(3)), (99, "b", mkv(4))],
        ["neighbor_id", "topic", "v"],
    )
    scores = spark.createDataFrame(
        [(2, 9), (10, 1), (11, 1)], ["neighbor_id", "validation_score"]
    )
    out = related_topk(queries, corpus, scores, k_candidates=4, k_final=4)
    rows = {r.neighbor_id: r for r in out.collect()}
    # all four candidates surface: 1 same-topic + 3 fallback (fill to k=4)
    assert set(rows) == {2, 10, 11, 99}
    # unscored neighbor got the deterministic default 5
    assert abs(rows[99].combined_score - (0.7 * rows[99].sim * 10 + 0.3 * 5)) < 2e-3
    assert [r.rank for r in sorted(rows.values(), key=lambda r: r.rank)] == [1, 2, 3, 4]


def test_ivf_kmeans_centroids_recall(spark, sf_dir):
    from briefly_spark.operators.similarity import ivf_candidate_ids, topk_cosine
    from briefly_spark.queries.similarity import _emb

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    exact = {
        (r.query_id, r.neighbor_id) for r in topk_cosine(queries, corpus, k=5).collect()
    }
    cand = {
        (r.query_id, r.neighbor_id)
        for r in ivf_candidate_ids(
            queries, corpus, n_cells=16, n_probe=4, centroids="kmeans"
        ).collect()
    }
    # trained cells should put a usable share of true neighbors in probed
    # cells even on structureless random vectors
    recall = len(exact & cand) / len(exact)
    assert recall > 0.3, f"kmeans-IVF candidate recall degenerate: {recall:.2f}"


def test_related_topk_lsh_tier_end_to_end(spark, sf_dir):
    # The flagship's 100 TB candidate tier, end-to-end on the real sf0.001
    # tables (entry()'s tier="auto" resolves to exact at every local SF, so
    # without this the LSH tier only runs inside the q44 sf0.01 audit):
    # same pipeline, candidates from lsh_candidate_ids, sanity overlap vs
    # the exact tier.
    from briefly_spark.queries.similarity import _related_inputs

    queries, corpus, scores = _related_inputs(spark, sf_dir)
    kw = dict(k_candidates=6, k_final=5)
    approx = related_topk(queries, corpus, scores, tier="lsh", dims=64, bits=4, **kw)
    exact = related_topk(queries, corpus, scores, tier="exact", **kw)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    per_q = {q for q, _ in e}
    # every query answered with a full top-5, and the weighted re-rank over
    # LSH candidates overlaps the exact tier meaningfully even on random
    # vectors (q44 measures 0.34-0.38 at sf0.01; floor well below)
    assert {q for q, _ in a} == per_q
    from collections import Counter

    counts = Counter(q for q, _ in a)
    assert set(counts.values()) == {5}
    overlap = len(a & e) / len(e)
    assert overlap > 0.15, f"LSH-tier overlap degenerate: {overlap:.2f}"


def test_related_topk_null_topic_rows_fall_to_tier1(spark):
    # NULL topics must behave like the branched form: never tier 0, still
    # eligible tier-1 candidates — not silently dropped.
    queries = spark.createDataFrame(
        [(1, None, [1.0, 0.0])], "query_id long, topic string, v array<double>"
    )
    corpus = spark.createDataFrame(
        [(2, None, [1.0, 0.1]), (3, "b", [1.0, 0.2])],
        "neighbor_id long, topic string, v array<double>",
    )
    scores = spark.createDataFrame([(2, 5)], "neighbor_id long, validation_score int")
    out = related_topk(queries, corpus, scores, k_candidates=2, k_final=2)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert got == {(1, 2), (1, 3)}


def test_contrastive_pairs_margin_and_roles(spark):
    from pyspark.sql import functions as F

    from briefly_spark.operators.similarity import contrastive_pairs, topk_cosine

    vecs = [(i, [float((i * 7 + j * 3) % 11), float((i * 5 + j) % 7), 1.0]) for i in range(30) for j in [0]]
    df = spark.createDataFrame(vecs, ["id", "v"])
    anchors = df.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = df.select(F.col("id").alias("neighbor_id"), "v")
    got = contrastive_pairs(anchors, corpus, neg_lo=3, neg_hi=5).collect()
    # 3 anchors x ranks 3..5 = 9 rows
    assert len(got) == 9
    # the positive is the true rank-1 neighbor, margins are non-negative,
    # and the negative is never the positive
    exact = {r.query_id: r.neighbor_id for r in topk_cosine(anchors, corpus, k=1).collect()}
    for r in got:
        assert r.pos_id == exact[r.anchor_id]
        assert r.margin >= 0
        assert r.neg_id != r.pos_id


def test_mmr_rerank_prefers_diversity(spark):
    from briefly_spark.operators.similarity import mmr_rerank
    import pyspark.sql.functions as F

    # candidates: 11 and 12 are near-duplicates (sim 95), 13 is diverse
    # (sim 10 to both).  Pure top-k would pick 11, 12; MMR must pick the
    # diverse 13 at rank 2 despite its lower relevance.
    cand = spark.createDataFrame(
        [(1, 11, 100), (1, 12, 98), (1, 13, 60)],
        "query_id LONG, cid LONG, rel_fp LONG",
    )
    pairs = [(1, 11, 12, 95), (1, 11, 13, 10), (1, 12, 13, 10)]
    sims = spark.createDataFrame(
        pairs + [(q, b, a, s) for q, a, b, s in pairs],
        "query_id LONG, cid_a LONG, cid_b LONG, sim_fp LONG",
    )
    got = {r.sel_rank: (r.cid, r.mmr_fp) for r in mmr_rerank(cand, sims, k=3).collect()}
    assert got[1] == (11, 100)
    assert got[2] == (13, 50)   # 60 - 10 beats 98 - 95
    assert got[3] == (12, 3)    # 98 - max(95, 10)


def test_mmr_rerank_sparse_sims_missing_pair_is_zero_penalty(spark):
    """A thresholded/sparse sims table omits dissimilar pairs; a candidate
    with NO sims row to any selected candidate must get penalty 0 (the most
    diverse candidate is exactly the one a sparse table omits), not drop
    out of contention via an inner join."""
    from briefly_spark.operators.similarity import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 11, 100), (1, 12, 98), (1, 13, 60)],
        "query_id LONG, cid LONG, rel_fp LONG",
    )
    # only the near-dup pair survives the threshold; 13 has no rows at all
    sims = spark.createDataFrame(
        [(1, 11, 12, 95), (1, 12, 11, 95)],
        "query_id LONG, cid_a LONG, cid_b LONG, sim_fp LONG",
    )
    got = {r.sel_rank: (r.cid, r.mmr_fp) for r in mmr_rerank(cand, sims, k=3).collect()}
    assert got[1] == (11, 100)
    assert got[2] == (13, 60)  # penalty 0, beats 12's 98 - 95 = 3
    assert got[3] == (12, 3)


def test_mmr_rerank_tie_breaks_to_smallest_cid(spark):
    from briefly_spark.operators.similarity import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 21, 50), (1, 20, 50)], "query_id LONG, cid LONG, rel_fp LONG"
    )
    sims = spark.createDataFrame(
        [(1, 20, 21, 0), (1, 21, 20, 0)],
        "query_id LONG, cid_a LONG, cid_b LONG, sim_fp LONG",
    )
    got = {r.sel_rank: r.cid for r in mmr_rerank(cand, sims, k=2).collect()}
    assert got == {1: 20, 2: 21}


def test_related_topk_auto_gate_is_pair_product(spark):
    """r14: the auto tier gates on |queries|x|corpus|, not corpus size
    alone — relate_batch drains corpus-sized query batches, so a
    corpus-only bound kept the exact quadratic tier at q*n ~ 5e8 pairs
    in the x32 scale cell.  Observable: forcing the bound below q*n must
    route to LSH (which demands dims), a bound above it stays exact."""
    import pytest

    queries = spark.createDataFrame(
        [(i, "t", [float(i), 1.0]) for i in range(6)],
        "query_id long, topic string, v array<double>",
    )
    corpus = spark.createDataFrame(
        [(100 + i, "t", [float(i), 2.0]) for i in range(6)],
        "neighbor_id long, topic string, v array<double>",
    )
    scores = spark.createDataFrame([(100, 5.0)], "neighbor_id long, validation_score double")
    # 36 pairs > bound of 10 -> LSH tier -> dims required
    with pytest.raises(ValueError, match="dims"):
        related_topk(queries, corpus, scores, tier="auto", exact_max_pairs=10)
    # 36 pairs <= 36 -> exact tier, runs without dims
    out = related_topk(queries, corpus, scores, tier="auto", exact_max_pairs=36)
    assert out.count() > 0


def test_pq_adc_recall_floor(spark, sf_dir):
    # PQ is approximate: assert recall@5 against the exact integer
    # squared-L2 top-5 stays above a floor at fixture scale
    import pyspark.sql.functions as F
    from briefly_spark.operators.pq import pq_fit_encode, pq_search, quantized
    from briefly_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_fit_encode(
        emb, id_col="vec_id", vec_col="embedding", dim=64, subspaces=8, k=16, iters=2
    )
    corpus_q = quantized(emb, "vec_id", "embedding")
    qdf = corpus_q.filter(F.col("id") % 50 == 0).select(
        F.col("id").alias("query_id"), "q"
    )
    approx = pq_search(
        qdf, corpus_q, codes, books, dim=64, subspaces=8, shortlist=32, k_final=5
    )
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}

    corpus = quantized(emb, "vec_id", "embedding")
    from pyspark.sql import Window

    pairs = (
        qdf.crossJoin(corpus.select(F.col("id").alias("nid"), F.col("q").alias("cq")))
        .filter(F.col("query_id") != F.col("nid"))
        .select(
            "query_id", "nid",
            F.aggregate(
                F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d", "nid")
    exact = {
        (r.query_id, r.nid)
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.4, recall  # 8x16 codebooks + exact re-rank of the ADC top-32


def test_ivfpq_full_probe_equals_flat_and_pruned_is_bounded(spark, sf_dir):
    """X150 (r14): IVF-PQ — the coarse prune in front of flat ADC that
    fixes the one super-linear weak-scaling term (the x32 sweep measured
    flat pq_search at exp 1.35 when the probe panel grows with the
    corpus).  Contract pins: (a) probing EVERY cell is byte-identical to
    flat pq_search (the prune only removes, never reorders); (b) with
    n_probe < n_cells every returned neighbor lies in a cell the query
    probed (the candidate bound is structural, not statistical);
    (c) recall@5 vs flat PQ stays usable at fixture scale."""
    import pyspark.sql.functions as F
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.pq import (
        ivf_coarse_cells,
        ivfpq_search,
        pq_fit_encode,
        pq_search,
        quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_fit_encode(
        emb, id_col="vec_id", vec_col="embedding", dim=64, subspaces=8, k=16, iters=2
    )
    corpus_q = quantized(emb, "vec_id", "embedding")
    qdf = corpus_q.filter(F.col("id") % 50 == 0).select(
        F.col("id").alias("query_id"), "q"
    )
    flat = sorted(
        map(
            tuple,
            pq_search(
                qdf, corpus_q, codes, books, dim=64, subspaces=8,
                shortlist=32, k_final=5,
            ).collect(),
        )
    )
    # (a) full probe == flat, byte-identical
    full = sorted(
        map(
            tuple,
            ivfpq_search(
                qdf, corpus_q, codes, books, dim=64, subspaces=8,
                n_cells=8, n_probe=8, shortlist=32, k_final=5,
            ).collect(),
        )
    )
    assert full == flat
    # (b) pruned: every neighbor sits in a probed cell of its query
    pruned = ivfpq_search(
        qdf, corpus_q, codes, books, dim=64, subspaces=8,
        n_cells=8, n_probe=3, shortlist=32, k_final=5,
    )
    cells = ivf_coarse_cells(corpus_q, n_cells=8)
    from pyspark.sql import Window

    def assigned(df, id_col, keep):
        w = Window.partitionBy(id_col).orderBy(F.asc("cd"), F.asc("cell_id"))
        return (
            df.crossJoin(F.broadcast(cells))
            .select(
                id_col,
                "cell_id",
                F.aggregate(
                    F.zip_with("q", "cv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"), lambda acc, x: acc + x,
                ).alias("cd"),
            )
            .withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") <= keep)
            .select(id_col, "cell_id")
        )

    probed = {
        (r.query_id, r.cell_id) for r in assigned(qdf, "query_id", 3).collect()
    }
    corpus_cell = {
        r.id: r.cell_id
        for r in assigned(
            corpus_q.select(F.col("id"), "q"), "id", 1
        ).collect()
    }
    rows = pruned.collect()
    assert rows, "pruned IVF-PQ returned nothing"
    for r in rows:
        assert (r.query_id, corpus_cell[r.neighbor_id]) in probed
    # (c) recall vs flat PQ stays usable on the near-uniform fixture
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(got & set((a, b) for a, b, _, _ in flat)) / max(len(flat), 1)
    assert recall >= 0.3, recall


def test_pq_codes_are_compact(spark, sf_dir):
    from briefly_spark.operators.pq import pq_fit_encode
    from briefly_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_fit_encode(
        emb, id_col="vec_id", vec_col="embedding", dim=64, subspaces=4, k=8, iters=1
    )
    n = emb.count()
    assert codes.count() == 4 * n                      # S rows per vector
    assert books.count() <= 4 * 8                      # at most S·k centroids
    assert set(codes.columns) == {"id", "s", "code"}   # no vectors in the code table


def test_related_topk_auto_tier_empty_queries_above_corpus_bound(spark):
    """ADVICE r15 pin: with tier='auto', corpus_n above the pair bound,
    and dims=None, an EMPTY query batch must resolve to the exact tier's
    empty result (0 pairs <= bound — the pair-product contract), not
    raise the LSH ValueError('dims') the corpus-only short-circuit used
    to route into."""
    queries = spark.createDataFrame([], "query_id long, topic string, v array<double>")
    corpus = spark.createDataFrame(
        [(i, "t", [float(i), 1.0]) for i in range(8)],
        "neighbor_id long, topic string, v array<double>",
    )
    scores = spark.createDataFrame([], "neighbor_id long, validation_score int")
    out = related_topk(
        queries, corpus, scores, tier="auto", exact_max_pairs=4, dims=None
    )
    assert out.count() == 0


def test_related_topk_auto_tier_count_hints(spark):
    """VERDICT r14 #4 pin: corpus_n/queries_n hints replace the eager
    probe counts without changing routing — hinted auto matches
    probe-based auto below the bound, and an over-estimated hint routes
    to LSH (the scale-safe direction) exactly like a real count would."""
    corpus = spark.createDataFrame(
        [(i, "t", [float(i % 3), 1.0]) for i in range(10)],
        "neighbor_id long, topic string, v array<double>",
    )
    queries = spark.createDataFrame(
        [(100, "t", [1.0, 1.0])], "query_id long, topic string, v array<double>"
    )
    scores = spark.createDataFrame([], "neighbor_id long, validation_score int")
    kw = dict(k_candidates=3, k_final=3)
    probed = related_topk(queries, corpus, scores, tier="auto", **kw)
    hinted = related_topk(
        queries, corpus, scores, tier="auto", corpus_n=10, queries_n=1, **kw
    )
    assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, probed.collect()))
    # over-estimate above the pair bound -> LSH tier, which needs dims:
    # the ValueError proves the hint routed without any count() probe
    import pytest

    with pytest.raises(ValueError, match="dims"):
        related_topk(
            queries, corpus, scores, tier="auto",
            corpus_n=10, queries_n=10, exact_max_pairs=50, dims=None, **kw
        )


def test_lsh_bits_for_constant_occupancy_policy():
    """r15 gate-rung pin: adaptive bits hold expected bucket occupancy
    ~target, clamped to [8, 20] — fixed bits would make LSH candidate
    pairs grow q*n/2^bits ~ K^2 (the q129 x32 finding)."""
    from briefly_spark.operators.similarity import lsh_bits_for

    assert lsh_bits_for(0) == 8
    assert lsh_bits_for(20_000) == 9          # ceil(log2(20000/64))
    assert lsh_bits_for(640_000) == 14        # the x32 rung's corpus
    assert lsh_bits_for(10**12) == 20         # max clamp
    assert lsh_bits_for(100) == 8             # min clamp
    # monotone non-decreasing in n
    vals = [lsh_bits_for(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
    assert vals == sorted(vals)


def test_related_topk_auto_routed_lsh_uses_adaptive_bits(spark, monkeypatch):
    """The auto->LSH route resolves bits=None via lsh_bits_for(corpus_n);
    an explicit bits pin must NOT consult it.  Pinned by interception
    (r15 review finding: the earlier schema/count assertions held for any
    bits value, leaving the resolution path itself unpinned)."""
    import briefly_spark.operators.similarity as sim

    corpus = spark.createDataFrame(
        [(i, "t", [float(i % 4), 1.0, 0.5]) for i in range(12)],
        "neighbor_id long, topic string, v array<double>",
    )
    queries = spark.createDataFrame(
        [(100, "t", [2.0, 1.0, 0.5])], "query_id long, topic string, v array<double>"
    )
    scores = spark.createDataFrame([], "neighbor_id long, validation_score int")
    kw = dict(k_candidates=3, k_final=3, tier="auto", dims=3,
              corpus_n=10**9, queries_n=10**6, exact_max_pairs=50)

    calls = []
    real = sim.lsh_bits_for
    monkeypatch.setattr(
        sim, "lsh_bits_for", lambda n, **k: calls.append(n) or real(n, **k)
    )
    adaptive = related_topk(queries, corpus, scores, **kw)
    assert calls == [10**9], "auto->LSH must resolve bits from corpus_n"
    assert adaptive.count() >= 0  # plan executes at the resolved bits=20

    calls.clear()
    pinned = related_topk(queries, corpus, scores, bits=8, **kw)
    assert calls == [], "an explicit bits pin must bypass lsh_bits_for"
    assert adaptive.columns == pinned.columns
    assert pinned.count() >= 0
