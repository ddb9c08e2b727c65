"""Graph operators — bounded-iteration iterative algorithms over edge
DataFrames (Pregel-style message passing expressed as join + groupBy).

Complements the connected-components operators in operators/dedup.py
(label propagation / star contraction) with *value* propagation:
weighted PageRank over the near-dup similarity graph.  In a curation
pipeline the PageRank of the near-dup graph ranks TEMPLATE HUBS — a
boilerplate page duplicated (with small mutations) across many sources
accumulates centrality that pairwise scores alone don't expose; the
reference's dedup stage (raw_articles.py:44-96) sees only pairs.

Determinism: every per-iteration value is an INTEGER fixed-point
(scale 10¹²) and every update uses only integer +, ×, and floor
division — integer arithmetic is exact and order-independent, so the
result is bit-identical across engines and across shuffle
re-orderings, unlike float PageRank whose sums depend on reduction
order.  Edge weights are ``floor(jac·10⁴)`` integers for the same
reason.

Scale shape: one iteration = one equi-join of the rank table onto the
edge list (both hash-partitioned by src) + one partial-aggregated
groupBy(dst) shuffle; iterations are a fixed small count, so the whole
plan is ``iters`` shuffles of O(edges) — the standard distributed
PageRank layout.  At 100 TB, persist the degree-annotated edge list
bucketed by ``src`` (storage.py K6) and the per-iteration join is
exchange-free on the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: global fixed-point scale for rank mass (integer micro-micro units)
PR_SCALE = 10**12


def weighted_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    iters: int = 5,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted PageRank with damping 0.85, ``iters`` synchronous rounds.

    ``nodes``: one row per vertex (``id_col``).  ``edges``: directed
    ``(src, dst, w)`` with integer weights — callers pass both directions
    for an undirected graph.  Returns ``(id, pr)`` with ``pr`` the
    integer fixed-point rank (initial mass ``scale // N`` per node).

    Update rule, all-integer (floor division written ``div``):

        contrib(u→v) = (pr(u) · w(u,v)) div wdeg(u)
        pr'(v)       = (15 · (scale div N)) div 100
                       + (85 · Σ_u contrib(u→v)) div 100

    Nodes with no out-edges contribute nothing (their mass decays to the
    teleport floor); nodes with no in-edges hold exactly the teleport
    floor.  Mass is sub-conserved (floor losses), which is fine for a
    RANKING — and what makes the result engine-exact.
    """
    # wdeg joins back onto edges keyed by src: the rank join below is then
    # a single equi-join on src per iteration.
    deg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    # The edge list is consumed once per round: persist it so candidate
    # generation (often an expensive inverted-index join upstream) runs
    # once, not ``iters`` times (the dedup.py CC persist discipline).
    e = edges.join(deg, "src").select("src", "dst", "w", "wdeg").persist()
    # N via an aggregate broadcast onto nodes — keeps the plan fully lazy
    # (no driver-side count action inside query construction).
    # Integer division throughout — a double 10¹²/N rounded-then-truncated
    # can differ from exact floor division by 1 at integer boundaries.
    params = nodes.agg(
        F.expr(f"cast({scale} as bigint) div count(1)").alias("pr0")
    ).select("pr0", F.expr("(15 * pr0) div 100").alias("tele"))
    # (id, tele) is round-invariant: keep it as a persisted base frame so
    # the rank lineage is consumed exactly ONCE per round (consuming the
    # evolving frame twice would double the recursive lineage each round).
    base = (
        nodes.select(F.col(id_col).alias("id"))
        .crossJoin(F.broadcast(params))
        .persist()
    )
    pr = base.select("id", F.col("pr0").alias("pr"))
    for _ in range(iters):
        contrib = e.join(pr.select(F.col("id").alias("src"), "pr"), "src").select(
            "dst", F.expr("(pr * w) div wdeg").alias("c")
        )
        inmass = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("inmass"))
            .select(F.col("dst").alias("id"), "inmass")
        )
        pr = base.join(inmass, "id", "left").select(
            "id",
            (F.col("tele") + F.expr("(85 * coalesce(inmass, 0L)) div 100")).alias("pr"),
        )
    return pr.select("id", "pr")


def label_propagation(
    seeded: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    seed_col: str = "seed",
    iters: int = 3,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani form, clamped
    seeds), ``iters`` synchronous rounds over a weighted directed edge
    list — community/topic assignment on the near-dup graph.

    ``seeded``: one row per vertex with a nullable ``seed_col`` (the
    clamped ground-truth labels).  ``edges``: ``(src, dst, w)`` integer
    weights, both directions for undirected graphs.  Per round each
    vertex takes the weight-majority label of its labeled in-neighbors —
    ties to the lexicographically SMALLEST label via min(struct(-votes,
    label)), so the fixpoint prefix is engine-exact — seeds stay
    clamped, and a vertex with no labeled neighbor keeps its current
    label.  Returns ``(id, seeded, label)``.

    Scale: per round ONE label⋈edges equi-join on src plus one
    partial-aggregated (dst, label) tally — O(edges) per round, fixed
    round count, persisted edge list (the :func:`weighted_pagerank`
    discipline).  The evolving label frame is consumed twice per round
    (votes + the keep-current carry), so each round persists it to keep
    lineage linear in the round count.
    """
    e = edges.select("src", "dst", "w").persist()
    base = seeded.select(
        F.col(id_col).alias("id"), F.col(seed_col).alias("seed")
    ).persist()
    cur = base.withColumn("label", F.col("seed"))
    for _ in range(iters):
        # the evolving frame is consumed twice per round (votes + the
        # keep-current carry): persist it so lineage stays linear in
        # rounds, not exponential (the dedup.py CC discipline).  The
        # persists are deliberately LAZY and never force-materialized
        # here: an eager count() per round was tried (review r12) and
        # reverted — populating the cache at CONSTRUCTION time leaks
        # InMemoryRelation substitutions into every later plan sharing
        # this lineage (measured: q95's plan signature shifted from
        # q115's caches).  The frames live until the session clears its
        # cache — the sweep harnesses clearCache per query; long-lived
        # callers should clearCache between invocations.
        cur = cur.persist()
        votes = (
            e.join(
                cur.filter(F.col("label").isNotNull()).select(
                    F.col("id").alias("src"), "label"
                ),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.sum("w").alias("v"))
        )
        best = (
            votes.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("v")).alias("nv"), F.col("label").alias("l"))
                ).alias("b")
            )
            .select(F.col("dst").alias("id"), F.col("b.l").alias("new_label"))
        )
        prev = cur.select("id", F.col("label").alias("old_label"))
        cur = (
            base.join(best, "id", "left")
            .join(prev, "id")
            .select(
                "id",
                "seed",
                F.coalesce("seed", "new_label", "old_label").alias("label"),
            )
        )
    return cur.select("id", F.col("seed").isNotNull().alias("seeded"), "label")


def triangle_stats(und: DataFrame, blocks: DataFrame) -> DataFrame:
    """Per-block triangle census over an undirected graph — edges ``und``
    as (a, b) with a < b, one row per edge; ``blocks`` maps vertex id →
    grouping attrs (every edge is intra-block by construction).  Returns
    one row per block: (…attrs, n_edges, n_wedges, n_triangles,
    transitivity_fp) with transitivity = 3·triangles/wedges at 10⁴
    fixed point (0 when wedgeless).

    Degree-ordered orientation (Suri & Vassilvitskii, WWW 2011 — public
    method): orient every edge from the (degree, id)-smaller endpoint to
    the larger, enumerate wedges as ordered out-neighbor pairs of each
    source, and close them against the oriented edge set.  Out-degrees
    under this orientation are O(√m) regardless of hub degrees, so the
    wedge self-join — the only super-linear step — is arboricity-bounded,
    never hub-quadratic; every join is an equi-join (AQE-splittable) and
    each triangle is counted exactly once."""
    a_deg = und.select(F.col("a").alias("v"))
    b_deg = und.select(F.col("b").alias("v"))
    vdeg = (
        a_deg.unionByName(b_deg)
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e = (
        und.join(vdeg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(vdeg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    orient = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )
    e1 = orient.select("src", F.col("dst").alias("v"), F.col("dd").alias("dv"))
    e2 = orient.select("src", F.col("dst").alias("w"), F.col("dd").alias("dw"))
    wedge = e1.join(e2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tri = wedge.join(
        orient.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).select("src")
    attrs = [c for c in blocks.columns if c != "id"]
    be = (
        und.join(blocks.withColumnRenamed("id", "a"), "a")
        .groupBy(*attrs)
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    bw = (
        vdeg.join(blocks.withColumnRenamed("id", "v"), "v")
        .groupBy(*attrs)
        .agg(
            F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
        )
    )
    bt = (
        tri.join(blocks.withColumnRenamed("id", "src"), "src")
        .groupBy(*attrs)
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = (
        be.join(bw, attrs)
        .join(bt, attrs, "left")
        .withColumn("n_triangles", F.coalesce(F.col("n_tri"), F.lit(0)).cast("long"))
    )
    return out.select(
        *attrs,
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.expr("(3 * n_triangles * 10000) div n_wedges"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("transitivity_fp"),
    )


def kcore_decompose(
    und: DataFrame, *, max_rounds: int | None = None
) -> DataFrame:
    """Exact k-core decomposition of an undirected graph — per vertex,
    the largest k such that the vertex survives in a subgraph of minimum
    degree k (Batagelj–Zaveršnik peeling, distributed as synchronous
    rounds; public method).  The density diagnostic between connected
    components (too coarse: one bridge merges everything) and triangles
    (local): a near-dup TEMPLATE cluster is a high-k core, a chain of
    borderline pairs peels away at k=1 — core number is the survivor-
    election safety signal at cluster granularity.

    ``und``: one row per undirected edge (a, b) with a < b.  Returns
    (id, core) for every vertex with ≥1 edge (isolated vertices have
    core 0 by definition — callers union them in if needed).

    Algorithm: peel k = 1, 2, 3, …; at each k, repeatedly drop vertices
    with degree < k until the remainder has min degree ≥ k (vertices
    dropped at level k have core k−1 … but recorded as core = k−1 only
    when they fall BEFORE the k-level stabilizes; here every vertex's
    core is the last k at which it survived stabilization).  Termination
    is structural, not capped: every stabilization round removes at
    least one vertex, so rounds ≤ |V| + max core (review r12 — the old
    degeneracy-sized default cap of 64 FAILED legitimate chain-shaped
    graphs, where peeling removes only the two frontier vertices per
    round and cascade depth is O(n)).  ``max_rounds`` is now purely an
    optional runaway backstop (None = unbounded).

    Scale shape per round: one symmetric-edge degree aggregation + one
    semi/anti join — O(edges) equi-join work, AQE-splittable, no windows;
    the evolving edge frame is localCheckpoint-materialized per peel
    level so lineage stays flat (the CC discipline).  Driver state: the
    current k and a survivor count (two scalars)."""
    sym = und.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    )
    live = sym.localCheckpoint(eager=True)
    # the vertex set is tracked EXPLICITLY: a vertex whose last edges are
    # peeled away would otherwise vanish from the edge frame without ever
    # being assigned its core number (degree-0 is "< k" at every k).
    verts = live.select("id").distinct().localCheckpoint(eager=True)
    spark = und.sparkSession
    out_parts: list[DataFrame] = []
    k = 1
    rounds = 0
    while verts.take(1):
        # stabilize level k: drop degree<k vertices until none remain
        while True:
            rounds += 1
            if max_rounds is not None and rounds > max_rounds:
                raise RuntimeError(
                    f"kcore_decompose exceeded max_rounds={max_rounds} "
                    "(the cap is an optional runaway backstop; rounds are "
                    "structurally bounded by |V| + max core)"
                )
            deg = live.groupBy("id").agg(F.count(F.lit(1)).alias("d"))
            # weak is consumed ~5× per round (emptiness probe, the core
            # record, the verts anti-join, both sides of the live anti-
            # join): checkpoint it ONCE so the degree aggregation runs
            # once per round, not five times (review r12)
            weak = (
                verts.join(deg, "id", "left")
                .filter(F.coalesce(F.col("d"), F.lit(0)) < k)
                .select("id")
                .localCheckpoint(eager=True)
            )
            if not weak.take(1):
                break
            # vertices peeled at level k have core number k-1
            out_parts.append(
                weak.select("id", F.lit(k - 1).cast("long").alias("core"))
            )
            verts = verts.join(weak, "id", "left_anti").localCheckpoint(eager=True)
            live = (
                live.join(weak, "id", "left_anti")
                .join(weak.select(F.col("id").alias("nb")), "nb", "left_anti")
                .localCheckpoint(eager=True)
            )
        k += 1
    if not out_parts:
        return spark.createDataFrame([], "id long, core long")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out
