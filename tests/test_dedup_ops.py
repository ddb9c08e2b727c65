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


def test_connected_components_chain_and_singleton(spark):
    from briefly_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "id long")
    edges = spark.createDataFrame([(2, 1), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    # chain 1-2-3 resolves transitively; pair 10-11; singleton labels itself
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from briefly_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    # a 4-chain needs >1 round to reach the far end
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iters=1)


def test_connected_components_star_long_chain(spark):
    """A 200-node path graph: min-propagation needs ~O(n) rounds (would
    blow max_iters=25); the large-star/small-star variant converges in
    O(log n) — well within the same budget."""
    from briefly_spark.operators.dedup import connected_components

    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r.id: r.component
        for r in connected_components(nodes, edges, method="star", max_iters=25).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_star_matches_min(spark):
    """Both methods agree on a mixed graph (cliques + chain + singletons),
    including string ids."""
    import random

    from briefly_spark.operators.dedup import connected_components

    rng = random.Random(7)
    # 3 cliques of 5, one 12-chain, 10 singletons; string ids shuffled
    ids = [f"d{i:03d}" for i in range(37)]
    edge_list = []
    for c in range(3):
        members = ids[c * 5 : c * 5 + 5]
        edge_list += [(a, b) for a in members for b in members if a < b]
    chain = ids[15:27]
    edge_list += list(zip(chain, chain[1:]))
    rng.shuffle(edge_list)
    nodes = spark.createDataFrame([(i,) for i in ids], "id string")
    edges = spark.createDataFrame(edge_list, "id_a string, id_b string")
    got_min = {
        r.id: r.component for r in connected_components(nodes, edges).collect()
    }
    got_star = {
        r.id: r.component
        for r in connected_components(nodes, edges, method="star").collect()
    }
    assert got_star == got_min
    # singletons label themselves
    for s in ids[27:]:
        assert got_star[s] == s


def test_connected_components_bad_method(spark):
    import pytest

    from briefly_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(1,)], "id long")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="method"):
        connected_components(nodes, edges, method="bogus")


def test_lsh_calibration_matches_bruteforce(spark):
    """The lsh_calibration section's decile buckets, candidate flags, and
    theory column pinned against an itertools all-pairs reference on the
    sf0.001 corpus — a third engine next to the Spark plan and the DuckDB
    oracle.  (Hosted in q122_shingle_containment since the r15 graft.)"""
    import hashlib
    import itertools

    from briefly_spark.queries.dedup import _corpus, q122_shingle_containment

    rows = _corpus(spark, "/root/testdata/sf0.001").select("id", "text").collect()

    def shingles(text):
        w = [t for t in text.split()]
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 0))}

    def sig(sh):
        hh = [hashlib.md5(s.encode()).hexdigest() for s in sh]
        return [min(h[i * 4 : i * 4 + 4] for h in hh) for i in range(8)]

    def bandkeys(sg):
        return [
            hashlib.md5(f"{sg[2 * b]}|{sg[2 * b + 1]}".encode()).hexdigest()
            for b in range(4)
        ]

    docs = {r["id"]: shingles(r["text"]) for r in rows}
    keys = {i: bandkeys(sig(sh)) for i, sh in docs.items() if sh}
    expected = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = docs[a], docs[b]
        inter = len(sa & sb)
        if inter == 0:
            continue
        jac = inter / (len(sa) + len(sb) - inter)
        if jac < 0.1:
            continue
        bucket = min(int(jac * 10 // 1), 9)
        hit = any(ka == kb for ka, kb in zip(keys[a], keys[b]))
        n, c = expected.get(bucket, (0, 0))
        expected[bucket] = (n + 1, c + int(hit))

    got = {
        int(r["k"]): tuple(int(x) for x in r["value"].split("/"))
        for r in q122_shingle_containment(spark, "/root/testdata/sf0.001")
        .filter("section = 'lsh_calibration'")
        .collect()
    }
    assert set(got) == set(expected)
    for bucket, (n, c) in expected.items():
        mid = bucket * 1000 + 500
        s2 = (mid * mid) // 10000
        p2 = ((10000 - s2) * (10000 - s2)) // 10000
        theory = 10000 - (p2 * p2) // 10000
        assert got[bucket] == (n, c, (c * 10000) // n, theory), bucket
