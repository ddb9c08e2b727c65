"""Weighted integer PageRank — operator-level tests against a hand-run
reference implementation of the same all-integer update rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.operators.graph import weighted_pagerank


def _reference_pr(node_ids, edges, iters, scale):
    """Plain-Python mirror of the integer update rule."""
    n = len(node_ids)
    pr0 = scale // n
    tele = (15 * pr0) // 100
    wdeg = {}
    for s, _d, w in edges:
        wdeg[s] = wdeg.get(s, 0) + w
    pr = {i: pr0 for i in node_ids}
    for _ in range(iters):
        inmass = {i: 0 for i in node_ids}
        for s, d, w in edges:
            inmass[d] += (pr[s] * w) // wdeg[s]
        pr = {i: tele + (85 * inmass[i]) // 100 for i in node_ids}
    return pr


def _run(spark, node_ids, edges, iters, scale=10**12):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    got = weighted_pagerank(nodes, e, iters=iters, scale=scale)
    return {r["id"]: r["pr"] for r in got.collect()}


def test_pagerank_matches_integer_reference(spark):
    node_ids = [1, 2, 3, 4, 5]
    # asymmetric weighted graph + one isolated node (5)
    edges = [
        (1, 2, 10), (2, 1, 10),
        (2, 3, 30), (3, 2, 30),
        (3, 4, 5), (4, 3, 5),
        (1, 3, 20), (3, 1, 20),
    ]
    for iters in (1, 3, 5):
        got = _run(spark, node_ids, edges, iters)
        assert got == _reference_pr(node_ids, edges, iters, 10**12), iters


def test_pagerank_isolated_node_holds_teleport_floor(spark):
    scale = 10**12
    got = _run(spark, [1, 2, 3], [(1, 2, 7), (2, 1, 7)], iters=4, scale=scale)
    tele = (15 * (scale // 3)) // 100
    assert got[3] == tele
    # the connected symmetric pair hold identical (and larger) mass
    assert got[1] == got[2] > tele


def test_pagerank_hub_outranks_leaves(spark):
    # star: hub 0 linked to 4 leaves, uniform weights
    edges = []
    for leaf in (1, 2, 3, 4):
        edges += [(0, leaf, 1), (leaf, 0, 1)]
    got = _run(spark, [0, 1, 2, 3, 4], edges, iters=5)
    assert all(got[0] > got[leaf] for leaf in (1, 2, 3, 4))
    assert len(set(got[leaf] for leaf in (1, 2, 3, 4))) == 1


def test_label_propagation_spreads_and_clamps(spark):
    from briefly_spark.operators.graph import label_propagation

    seeded = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None), (4, "vi")], "id LONG, seed STRING"
    )
    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 1, 10), (2, 3, 5), (3, 2, 5), (4, 3, 20), (3, 4, 20)],
        "src LONG, dst LONG, w LONG",
    )
    got = {r.id: (r.seeded, r.label) for r in label_propagation(seeded, edges, iters=3).collect()}
    # 2 takes en from its heavier neighbor; 3 takes vi; seeds stay clamped
    assert got == {1: (True, "en"), 2: (False, "en"), 3: (False, "vi"), 4: (True, "vi")}


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    from briefly_spark.operators.graph import label_propagation

    seeded = spark.createDataFrame(
        [(1, "zz"), (2, "aa"), (3, None)], "id LONG, seed STRING"
    )
    edges = spark.createDataFrame(
        [(1, 3, 7), (2, 3, 7)], "src LONG, dst LONG, w LONG"
    )
    got = {r.id: r.label for r in label_propagation(seeded, edges, iters=1).collect()}
    assert got[3] == "aa"  # equal votes -> lexicographically smallest


def test_label_propagation_isolated_keeps_null_and_carry(spark):
    from briefly_spark.operators.graph import label_propagation

    seeded = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None)], "id LONG, seed STRING"
    )
    # 2 hears from 1 only in round 1; 3 is isolated
    edges = spark.createDataFrame([(1, 2, 1)], "src LONG, dst LONG, w LONG")
    got = {r.id: r.label for r in label_propagation(seeded, edges, iters=2).collect()}
    assert got == {1: "en", 2: "en", 3: None}


# ---------------------------------------------------------------------------
# Triangle census (q144) — hand-built graphs.
# ---------------------------------------------------------------------------
def test_triangle_stats_hand_built(spark):
    from briefly_spark.operators.graph import triangle_stats

    # block "k4": complete graph on {1,2,3,4} -> 4 triangles, 12 wedges,
    # transitivity 3*4/12 = 1.0 -> 10000
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    # block "path": 10-11-12-13 -> 0 triangles, wedges = 1+1 = 2
    path = [(10, 11), (11, 12), (12, 13)]
    # block "star": hub 20, leaves 21-24 -> 0 triangles, wedges C(4,2)=6
    star = [(20, x) for x in (21, 22, 23, 24)]
    # block "tri+tail": triangle 30-31-32 plus pendant 33 on 30
    #   wedges: d(30)=3 -> 3, d(31)=d(32)=2 -> 1+1, total 5; T=1
    tt = [(30, 31), (30, 32), (31, 32), (30, 33)]
    und = spark.createDataFrame(k4 + path + star + tt, ["a", "b"])
    blocks = spark.createDataFrame(
        [(i, "k4") for i in range(1, 5)]
        + [(i, "path") for i in range(10, 14)]
        + [(i, "star") for i in range(20, 25)]
        + [(i, "tri_tail") for i in range(30, 34)],
        ["id", "blk"],
    )
    got = {
        r.blk: (r.n_edges, r.n_wedges, r.n_triangles, r.transitivity_fp)
        for r in triangle_stats(und, blocks).collect()
    }
    assert got == {
        "k4": (6, 12, 4, 10000),
        "path": (3, 2, 0, 0),
        "star": (4, 6, 0, 0),
        "tri_tail": (4, 5, 1, (3 * 1 * 10000) // 5),
    }


def test_triangle_stats_counts_each_triangle_once(spark):
    """Degree ties everywhere (every vertex d=2 in a pure triangle): the
    (deg, id) orientation must still count the triangle exactly once."""
    from briefly_spark.operators.graph import triangle_stats

    und = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["a", "b"])
    blocks = spark.createDataFrame([(i, "t") for i in (1, 2, 3)], ["id", "blk"])
    [r] = triangle_stats(und, blocks).collect()
    assert (r.n_edges, r.n_wedges, r.n_triangles, r.transitivity_fp) == (3, 3, 1, 10000)


# ---------------------------------------------------------------------------
# Property test: triangle census vs a brute-force itertools counter on
# random graphs (few examples — each is a Spark round-trip; the hand-built
# graphs pin the known shapes, this sweeps degree-tie/orientation space).
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _edge_sets = st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    ).map(lambda s: sorted({(min(a, b), max(a, b)) for a, b in s}))

    @given(_edge_sets)
    @settings(max_examples=10, deadline=None)
    def test_triangle_stats_matches_bruteforce_on_random_graphs(edges):
        from itertools import combinations

        from briefly_spark.operators.graph import triangle_stats
        from briefly_spark.session import get_spark

        spark = get_spark("tri-property")
        und = spark.createDataFrame(edges, ["a", "b"])
        verts = sorted({v for e in edges for v in e})
        blocks = spark.createDataFrame([(v, "g") for v in verts], ["id", "blk"])
        eset = set(edges)
        tri = sum(
            1
            for c in combinations(verts, 3)
            if {(c[0], c[1]), (c[0], c[2]), (c[1], c[2])} <= eset
        )
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        [r] = triangle_stats(und, blocks).collect()
        assert (r.n_edges, r.n_wedges, r.n_triangles) == (len(edges), wedges, tri)
        assert r.transitivity_fp == ((3 * tri * 10000) // wedges if wedges else 0)

except ImportError:  # pragma: no cover - hypothesis always shipped here
    pass


def _brute_cores(edges):
    """Textbook Batagelj–Zaveršnik peeling in pure Python."""
    adj = {v: set() for e in edges for v in e}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    core = {}
    k = 1
    while adj:
        while True:
            weak = [v for v, nbs in adj.items() if len(nbs) < k]
            if not weak:
                break
            for v in weak:
                core[v] = k - 1
                for nb in adj.pop(v):
                    if nb in adj:
                        adj[nb].discard(v)
        k += 1
    return core


def test_kcore_known_shapes(spark):
    from briefly_spark.operators.graph import kcore_decompose

    cases = {
        "path": ([(1, 2), (2, 3)], {1: 1, 2: 1, 3: 1}),
        "star": ([(0, i) for i in range(1, 6)], {i: 1 for i in range(6)}),
        "k4": ([(a, b) for a in range(4) for b in range(a + 1, 4)],
               {i: 3 for i in range(4)}),
        "k4_pendant": ([(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)],
                       {0: 3, 1: 3, 2: 3, 3: 3, 9: 1}),
        "two_triangles_shared": ([(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)],
                                 {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}),
    }
    for name, (edges, want) in cases.items():
        und = spark.createDataFrame(edges, "a long, b long")
        got = {r["id"]: r["core"] for r in kcore_decompose(und).collect()}
        assert got == want, name


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _kcore_edges = st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=22,
    ).map(lambda s: sorted({(min(a, b), max(a, b)) for a, b in s}))

    @given(_kcore_edges)
    @settings(max_examples=8, deadline=None)
    def test_kcore_matches_bruteforce_on_random_graphs(edges):
        from briefly_spark.operators.graph import kcore_decompose
        from briefly_spark.session import get_spark

        spark = get_spark("kcore-property")
        und = spark.createDataFrame(edges, "a long, b long")
        got = {r["id"]: r["core"] for r in kcore_decompose(und).collect()}
        assert got == _brute_cores(edges)

except ImportError:  # pragma: no cover - hypothesis always shipped here
    pass
