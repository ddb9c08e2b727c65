"""Graph pack — iterative value propagation over the near-dup graph.

q95: weighted PageRank over the bigram-Jaccard similarity graph of the
documents table.  Ranks template hubs for curation triage: a boilerplate
page whose mutated copies span many sources accumulates centrality that
per-pair scores don't expose.  The oracle unrolls the same 5 integer
fixed-point iterations as CTE stages — possible only because every
update is integer-exact (see operators/graph.py determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.operators.dedup import ngram_jaccard_pairs
from briefly_spark.operators.graph import PR_SCALE, label_propagation, weighted_pagerank
from briefly_spark.oracle_guards import guarded_scan, sql_row_cap_cte
from briefly_spark.queries import register

_PR_ITERS = 5

# Edge build shared by the oracle: bigram shingles, blocked quadratic
# pairs (the oracle states the SEMANTICS; the Spark side generates the
# identical pair set via the inverted-index join — q33 discipline).
#: shared toks → shingles → blocked quadratic pairs prefix — ONE spelling
#: for every near-dup-graph oracle in this file (q95/q115 edges, q144
#: triangles): these CTEs are load-bearing for cross-engine equivalence,
#: so a tokenizer or formula fix must hit all consumers at once.
_PAIRS_SQL = f"""
toks AS (
  SELECT doc_id AS id, source, lang,
         list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS t
  FROM documents
),
sh AS (
  SELECT id, source, lang,
         list_distinct(
           list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                          i -> t[i] || ' ' || t[i+1])) AS shingles
  FROM toks
),
{sql_row_cap_cte("documents", label="near-dup-graph pair mirror (q95/q115/q144)")},
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
  FROM {guarded_scan("sh")} a JOIN sh b
    ON a.source = b.source AND a.lang = b.lang AND a.id < b.id
)"""
# ARMED row cap on the shared blocked-cartesian prefix (r15 oracle-cost
# ladder: q95's mirror measured exp 1.82 over sf0.01→sf0.1, 77 s at
# sf0.1, ~1.4 h extrapolated at sf1 — the iterative PageRank stages are
# cheap next to this pair join).  One guard here arms every consumer
# (q95/q115/q144) at once; the guard scan feeds the join's left side so
# the refusal is dataflow-structural (briefly_spark/oracle_guards.py).

_EDGES_SQL = _PAIRS_SQL + """,
edges AS (
  SELECT id_a AS src, id_b AS dst, CAST(floor(jac * 10000) AS BIGINT) AS w
  FROM pairs WHERE jac >= 0.05
  UNION ALL
  SELECT id_b AS src, id_a AS dst, CAST(floor(jac * 10000) AS BIGINT) AS w
  FROM pairs WHERE jac >= 0.05
),
deg AS (SELECT src, SUM(w) AS wdeg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w, deg.wdeg
      FROM edges JOIN deg USING (src)),
nodes AS (SELECT doc_id AS id FROM documents),
params AS (
  SELECT CAST({scale} // COUNT(*) AS BIGINT) AS pr0,
         CAST((15 * ({scale} // COUNT(*))) // 100 AS BIGINT) AS tele
  FROM documents
)
""".replace("{scale}", str(PR_SCALE))


def _iter_sql(prev: str, cur: str) -> str:
    """One unrolled integer PageRank round as a CTE stage."""
    return f"""
{cur} AS (
  SELECT n.id,
         -- CAST: COALESCE(SUM(BIGINT),0) widens to HUGEINT in DuckDB, which
         -- fetches as Decimal/float64 and breaks the value-hash vs Spark's
         -- long; BIGINT stages also keep // on the same integer type both
         -- rounds and both engines.
         CAST((SELECT tele FROM params)
           + (85 * CAST(COALESCE(SUM((p.pr * e.w) // e.wdeg), 0) AS BIGINT)) // 100
           AS BIGINT) AS pr
  FROM nodes n
  LEFT JOIN e ON e.dst = n.id
  LEFT JOIN {prev} p ON p.id = e.src
  GROUP BY n.id
)"""


def _pagerank_oracle() -> str:
    stages = ["pr0 AS (SELECT id, (SELECT pr0 FROM params) AS pr FROM nodes)"]
    for i in range(_PR_ITERS):
        stages.append(_iter_sql(f"pr{i}", f"pr{i + 1}"))
    return (
        "WITH "
        + _EDGES_SQL.strip().rstrip(",")
        + ",\n"
        + ",\n".join(stages)
        + f"\nSELECT id AS doc_id, pr FROM pr{_PR_ITERS}"
    )


@register(
    "q95_dup_graph_pagerank",
    covers=("J4", "A3"),
    oracle=_pagerank_oracle(),
)
def q95_dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-hub centrality: 5 rounds of weighted PageRank (damping
    0.85, integer fixed-point, scale 10¹²) over the bigram-Jaccard ≥ 0.05
    similarity graph blocked by (source, lang).

    Edge generation is the q33 inverted-index join (O(postings), never
    O(block²) — the oracle's quadratic form only STATES the semantics);
    each PageRank round is one rank⋈edges equi-join plus one
    partial-aggregated groupBy(dst) shuffle, O(edges) per round with a
    fixed round count.  All-integer updates make the ranks engine-exact
    (operators/graph.py), so the oracle hashes the full fixed point — not
    a rounded shadow of it."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.05, block_cols=("source", "lang")
    )
    w = F.floor(F.col("jac") * 10000).cast("long").alias("w")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"), w).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), w)
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    ranked = weighted_pagerank(nodes, edges, iters=_PR_ITERS)
    return ranked.select(F.col("id").alias("doc_id"), "pr")


# --------------------------------------------------------------------------
# q115 — semi-supervised label propagation over the near-dup graph.
# --------------------------------------------------------------------------
_LP_ITERS = 3


def _lp_iter_sql(prev: str, k: int) -> str:
    """One unrolled synchronous LPA round: weighted label tally over
    labeled in-neighbors, rank-1 argmax (votes DESC, label ASC), clamped
    seeds, keep-current fallback."""
    return f"""
votes{k} AS MATERIALIZED (
  SELECT e.dst, p.label, CAST(SUM(e.w) AS BIGINT) AS v
  FROM e JOIN {prev} p ON p.id = e.src
  WHERE p.label IS NOT NULL
  GROUP BY e.dst, p.label
),
best{k} AS MATERIALIZED (
  SELECT dst, label AS new_label FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst ORDER BY v DESC, label ASC) AS rn
    FROM votes{k})
  WHERE rn = 1
),
lp{k} AS MATERIALIZED (
  SELECT p.id, p.seed, COALESCE(p.seed, b.new_label, p.label) AS label
  FROM {prev} p LEFT JOIN best{k} b ON b.dst = p.id
)"""


def _lp_oracle() -> str:
    stages = [
        """lp0 AS MATERIALIZED (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 7 = 0 THEN lang END AS seed,
         CASE WHEN doc_id % 7 = 0 THEN lang END AS label
  FROM documents
)"""
    ]
    for i in range(_LP_ITERS):
        stages.append(_lp_iter_sql(f"lp{i}", i + 1))
    return (
        "WITH "
        + _EDGES_SQL.strip().rstrip(",")
        + ",\n"
        + ",".join(stages)
        + f"""
SELECT id AS doc_id, seed IS NOT NULL AS seeded, label FROM lp{_LP_ITERS}"""
    )


@register(
    "q115_label_propagation",
    covers=("J4", "A3"),
    oracle=_lp_oracle(),
)
def q115_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community/topic assignment by semi-supervised label propagation:
    every seventh document is seeded with its known ``lang`` label, and 3
    synchronous rounds spread weight-majority labels across the same
    bigram-Jaccard ≥ 0.05 near-dup graph q95 ranks (shared edge
    machinery — the q33 inverted-index join, never O(block²)).  Ties
    break to the smallest label via min(struct(-votes, label)) and votes
    are integer edge-weight sums, so every round — and therefore the
    final assignment — is engine-exact; the oracle replays the identical
    3 rounds as unrolled CTE stages.  Unreached vertices keep a NULL
    label (honest "unknown", not a forced guess)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.05, block_cols=("source", "lang")
    )
    w = F.floor(F.col("jac") * 10000).cast("long").alias("w")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"), w).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), w)
    )
    seeded = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 7 == 0, F.col("lang")).alias("seed"),
    )
    lp = label_propagation(seeded, edges, iters=_LP_ITERS)
    return lp.select(F.col("id").alias("doc_id"), "seeded", "label")


# --------------------------------------------------------------------------
# q144 — triangle census / transitivity of the near-dup graph.
# --------------------------------------------------------------------------
_TRI_EDGES_SQL = _PAIRS_SQL + """,
und AS (SELECT id_a AS a, id_b AS b FROM pairs WHERE jac >= 0.05),
vdeg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
  GROUP BY v
),
orient AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.a ELSE u.b END AS src,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.b ELSE u.a END AS dst,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN db.d ELSE da.d END AS dd
  FROM und u JOIN vdeg da ON da.v = u.a JOIN vdeg db ON db.v = u.b
),
wedge AS (
  SELECT e1.src, e1.dst AS v, e2.dst AS w
  FROM orient e1 JOIN orient e2 USING (src)
  WHERE (e1.dd < e2.dd) OR (e1.dd = e2.dd AND e1.dst < e2.dst)
),
tri AS (
  SELECT wd.src FROM wedge wd
  JOIN orient t ON t.src = wd.v AND t.dst = wd.w
),
blocks AS (SELECT doc_id, source, lang FROM documents),
be AS (
  SELECT bl.source, bl.lang, CAST(count(*) AS BIGINT) AS n_edges
  FROM und u JOIN blocks bl ON bl.doc_id = u.a GROUP BY 1, 2
),
bw AS (
  SELECT bl.source, bl.lang,
         CAST(sum(d.d * (d.d - 1) // 2) AS BIGINT) AS n_wedges
  FROM vdeg d JOIN blocks bl ON bl.doc_id = d.v GROUP BY 1, 2
),
bt AS (
  SELECT bl.source, bl.lang, CAST(count(*) AS BIGINT) AS n_tri
  FROM tri t JOIN blocks bl ON bl.doc_id = t.src GROUP BY 1, 2
)
"""


@register(
    "q144_dup_triangles",
    covers=("J4", "A3", "A4"),
    oracle=f"""
WITH {_TRI_EDGES_SQL.strip()}
SELECT be.source, be.lang, be.n_edges, bw.n_wedges,
       CAST(coalesce(bt.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN bw.n_wedges > 0
                 THEN (3 * coalesce(bt.n_tri, 0) * 10000) // bw.n_wedges
                 ELSE 0 END AS BIGINT) AS transitivity_fp
FROM be JOIN bw ON bw.source = be.source AND bw.lang = be.lang
LEFT JOIN bt ON bt.source = be.source AND bt.lang = be.lang
""",
)
def q144_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph, per (source, lang) block:
    edges, wedges, triangles, and global-clustering transitivity
    (3·T/wedges, 10⁴ fixed point).  The cluster-QUALITY diagnostic the CC
    family (q37/q123) can't give: a component can be a chain of
    borderline pairs (transitivity ≈ 0 — survivor election is risky) or
    a template clique (≈ 10⁴ — collapse is safe); read next to q123's
    size histogram it says WHICH.

    Scale (operators/graph.py:triangle_stats): edge generation is the
    q33/q95 inverted-index join; triangles use the degree-ordered
    orientation (Suri & Vassilvitskii 2011), so the wedge self-join —
    the only super-linear step — is bounded by oriented out-degree
    O(√m) even at hub vertices; everything is equi-joins and partial
    aggregates, and the oracle states the same census quadratically."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.05, block_cols=("source", "lang")
    )
    und = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    blocks = docs.select(F.col("doc_id").alias("id"), "source", "lang")
    from briefly_spark.operators.graph import triangle_stats

    return triangle_stats(und, blocks)
