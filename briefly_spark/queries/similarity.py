"""Similarity-search pack — exact ANN baseline, the reference's full
related-articles semantics, and the LSH scale path, over ``embeddings``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread, table_rows
from briefly_spark.operators.similarity import (
    ann_recall_audit,
    contrastive_pairs,
    ivf_topk,
    lsh_topk,
    quantized_topk,
    related_topk,
    topk_cosine,
)
from briefly_spark.queries import register


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
        f" / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x * x))))"
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("id"),
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


# --------------------------------------------------------------------------
# q40 — exact brute-force cosine top-k (the ANN correctness baseline).
# --------------------------------------------------------------------------
@register(
    "q40_ann_topk",
    covers=("J4", "W1", "W5"),
    oracle=f"""
WITH emb AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
q AS (SELECT * FROM emb WHERE id % 10 = 0),
pairs AS (
  SELECT q.id AS query_id, c.id AS neighbor_id, {_cos_sql('q.v', 'c.v')} AS cos
  FROM q JOIN emb c ON q.id <> c.id
)
SELECT query_id, neighbor_id, rank, floor(cos * 10000) / 10000.0 AS sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q40_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for a 10% query sample: pair join →
    native zip_with dot product → per-query window.  This is the exact
    baseline the LSH path (q42) is measured against; at scale the query
    side broadcasts and the corpus streams (no shuffle of the corpus)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    return topk_cosine(queries, corpus, k=5)


# --------------------------------------------------------------------------
# q41 — the reference's related-articles pipeline, set-oriented (flagship).
# --------------------------------------------------------------------------
@register(
    "q41_related_articles",
    covers=("J4", "J5", "J6", "A7", "W1", "W5", "S8"),
    oracle=f"""
WITH emb AS (
  SELECT vec_id AS id,
         CASE WHEN label <= 7 THEN CAST(label AS VARCHAR)
              ELSE 't' || CAST(vec_id % 90 AS VARCHAR) END AS topic,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT * FROM emb WHERE id % 20 = 0),
pairs AS (
  SELECT q.id AS query_id, q.topic AS q_topic, c.id AS neighbor_id, c.topic AS c_topic,
         {_cos_sql('q.v', 'c.v')} AS cos
  FROM q JOIN emb c ON q.id <> c.id
),
tier0 AS (
  SELECT query_id, neighbor_id, cos
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM pairs WHERE q_topic = c_topic)
  WHERE rk <= 6
),
n0 AS (SELECT query_id, count(*) AS n_found FROM tier0 GROUP BY query_id),
rest AS (
  SELECT r.query_id, r.neighbor_id, r.cos
  FROM (
    SELECT p.query_id, p.neighbor_id, p.cos,
           row_number() OVER (PARTITION BY p.query_id ORDER BY p.cos DESC, p.neighbor_id) AS rk
    FROM pairs p
    ANTI JOIN tier0 t ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
  ) r LEFT JOIN n0 ON r.query_id = n0.query_id
  WHERE r.rk <= 6 - coalesce(n0.n_found, 0)
),
cand AS (SELECT * FROM tier0 UNION ALL SELECT * FROM rest),
hyd AS (SELECT query_id, neighbor_id, cos,
               0.7 * (cos * 10) + 0.3 * ((neighbor_id * 7) % 11) AS combined
        FROM cand)
SELECT query_id, neighbor_id, rank,
       floor(cos * 10000) / 10000.0 AS sim,
       floor(combined * 10000) / 10000.0 AS combined_score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY combined DESC, neighbor_id) AS rank
      FROM hyd)
WHERE rank <= 5
""",
)
def q41_related_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hardest operator as ONE set-oriented job
    (get_relevant_articles.py:26-153): same-topic top-6 → cross-topic
    fallback fill → hydration join for validation_score → weighted re-rank
    0.7·(sim·10) + 0.3·score → top-5.  Labels 8-9 are fragmented into
    single-member topics so the fallback path (J5) is genuinely exercised.
    validation_score is the deterministic (id·7) mod 11 — replacing the
    reference's random default (SURVEY §7.2)."""
    queries, corpus, scores = _related_inputs(spark, sf_dir)
    # tier="auto": exact below the pair bound (all local SFs — keeps the
    # exact-oracle hash), LSH candidate generation above it.  The probe
    # counts come from the parquet FOOTER (catalog.table_rows — zero
    # Spark jobs; VERDICT r14 #4: the two eager count() probes were
    # q41's one bench mover at r14): corpus is exactly one row per
    # embeddings row, and queries (the id%20 slice) is bounded above by
    # it.  queries_n must be the SLICE bound, not n: the catalog ids are
    # contiguous intervals (replica stride 10M is %20-aligned), so the
    # id%20 slice is exactly ≤ n//20 + 1 — passing n instead moved the
    # exact→LSH crossover from n≈22,360 down to n≈5,000 and flipped a
    # K=4 replicated sweep to approximate results vs the exact oracle
    # (r15 review finding; LSH changes RESULTS, not just cost).
    n = table_rows(sf_dir, "embeddings")
    return related_topk(
        queries, corpus, scores, k_candidates=6, k_final=5, tier="auto",
        dims=64, corpus_n=n, queries_n=n // 20 + 1,
    )


def _related_inputs(spark: SparkSession, sf_dir: str):
    """Shared inputs for the related-articles queries (q41/q44): labels 8-9
    are fragmented into single-member topics so the fallback path (J5) is
    genuinely exercised; validation_score is the deterministic (id·7) mod 11
    replacing the reference's random default (SURVEY §7.2)."""
    emb = _emb(spark, sf_dir)
    topic = F.when(F.col("label") <= 7, F.col("label").cast("string")).otherwise(
        F.concat(F.lit("t"), (F.col("id") % 90).cast("string"))
    )
    base = emb.select("id", topic.alias("topic"), "v")
    queries = base.filter(F.col("id") % 20 == 0).select(
        F.col("id").alias("query_id"), "topic", "v"
    )
    corpus = base.select(F.col("id").alias("neighbor_id"), "topic", "v")
    scores = base.select(
        F.col("id").alias("neighbor_id"), ((F.col("id") * 7) % 11).alias("validation_score")
    )
    return queries, corpus, scores


# Shared oracle for the approximate-ANN audit queries (q42/q43): the oracle
# asserts the EXPECTED audit outcome — every per-query topk_complete row true
# plus a true mean_recall_floor summary — so the driver's value hash matches
# iff the Spark-side invariants (exact-k output per query, mean recall@5 vs
# the exact baseline ≥ floor) actually hold.  Recall floors have wide margin:
# measured means are 0.42–0.51 across sf0.001/0.01/0.1 vs a 0.30 floor.
_ANN_AUDIT_ORACLE = """
SELECT vec_id AS qid, 'topk_complete' AS metric, true AS ok
FROM embeddings WHERE vec_id % 10 = 0
UNION ALL
SELECT CAST(-1 AS BIGINT), 'mean_recall_floor', true
"""


def _ann_audit_inputs(spark: SparkSession, sf_dir: str):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("id") % 10 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    return queries, corpus


# --------------------------------------------------------------------------
# q42 — hyperplane-LSH approximate ANN (scale path) under a recall-floor
# oracle: the emitted table is the deterministic audit of LSH vs exact.
# --------------------------------------------------------------------------
@register("q42_lsh_ann", covers=("J4", "W5"), oracle=_ANN_AUDIT_ORACLE)
def q42_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate ANN: deterministic hyperplane signatures →
    bucket equi-join → exact re-rank.  The O(|Q|·|C|) pair join becomes a
    bucketed join — the 100 TB path.  Approximate output can't hash-match an
    exact oracle, so the query emits :func:`ann_recall_audit` of the LSH
    result against the exact baseline — per-query completeness plus a mean
    recall@5 ≥ 0.30 floor — which IS deterministic and oracle-checkable.
    Point recall is also asserted in tests/test_similarity.py."""
    queries, corpus = _ann_audit_inputs(spark, sf_dir)
    approx = lsh_topk(queries, corpus, dims=64, k=5, bits=4)
    exact = topk_cosine(queries, corpus, k=5)
    return ann_recall_audit(approx, exact, queries, k=5, floor=0.30)


# --------------------------------------------------------------------------
# q43 — IVF-cell approximate ANN (coarse-quantizer scale path) under the
# same recall-floor oracle.
# --------------------------------------------------------------------------
@register("q43_ivf_ann", covers=("J4", "W5"), oracle=_ANN_AUDIT_ORACLE)
def q43_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate ANN: deterministic coarse centroids → cell
    assignment via one broadcast join → queries probe their n_probe nearest
    cells → exact re-rank inside probed cells.  The second scale path next
    to hyperplane LSH (q42): cost shrinks by ~n_cells/n_probe, recall rises
    with n_probe — at 100 TB centroids come from an offline spark.ml KMeans
    fit, broadcast exactly like this seeded stand-in.  Emits the
    :func:`ann_recall_audit` table (see q42) so the approximate tier sits
    under the driver's hash gate."""
    queries, corpus = _ann_audit_inputs(spark, sf_dir)
    approx = ivf_topk(queries, corpus, k=5, n_cells=16, n_probe=4)
    exact = topk_cosine(queries, corpus, k=5)
    return ann_recall_audit(approx, exact, queries, k=5, floor=0.30)


# --------------------------------------------------------------------------
# q49 — contrastive training-pair mining (anchor, positive, hard negatives).
# --------------------------------------------------------------------------
@register(
    "q49_contrastive_pairs",
    covers=("J4", "W5"),
    oracle=f"""
WITH emb AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
q AS (SELECT * FROM emb WHERE id % 20 = 0),
pairs AS (
  SELECT q.id AS query_id, c.id AS neighbor_id, {_cos_sql('q.v', 'c.v')} AS cos
  FROM q JOIN emb c ON q.id <> c.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
),
pos AS (
  SELECT query_id, neighbor_id AS pos_id, floor(cos * 10000) / 10000.0 AS pos_sim
  FROM ranked WHERE rank = 1
)
SELECT r.query_id AS anchor_id, p.pos_id, r.neighbor_id AS neg_id, p.pos_sim,
       floor(r.cos * 10000) / 10000.0 AS neg_sim,
       p.pos_sim - floor(r.cos * 10000) / 10000.0 AS margin
FROM ranked r JOIN pos p USING (query_id)
WHERE r.rank BETWEEN 6 AND 10
""",
)
def q49_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for embedding training: every 20th vector
    anchors a (positive = rank-1 neighbor, hard negatives = ranks 6–10)
    pair set with similarity margins — the data a contrastive fine-tune
    actually consumes.  One ranking pass feeds both roles
    (:func:`contrastive_pairs`); at 100 TB the exact ranking swaps for an
    approximate tier with the same pair-selection window."""
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("id") % 20 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    return contrastive_pairs(anchors, corpus, neg_lo=6, neg_hi=10)


# --------------------------------------------------------------------------
# q45 — int8-quantized ANN (bytes-per-vector scale path) under the same
# recall-floor oracle.
# --------------------------------------------------------------------------
@register("q45_quantized_ann", covers=("J4", "W5"), oracle=_ANN_AUDIT_ORACLE)
def q45_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN: int8 candidate scan (8× smaller resident
    vectors — the bytes-per-vector lever, orthogonal to LSH/IVF's
    pairs-per-query lever) → top-20 candidates per query → full-precision
    re-rank to top-5.  floor(·) quantization is bit-identical across
    engines, and the emitted table is the same :func:`ann_recall_audit`
    shape as q42/q43 (measured mean recall@5 = 1.0 at every local SF —
    int8 at 64 dims loses nothing once re-ranked 4×; floor 0.80 leaves
    margin for other corpora)."""
    queries, corpus = _ann_audit_inputs(spark, sf_dir)
    approx = quantized_topk(queries, corpus, k=5, rerank_factor=4)
    exact = topk_cosine(queries, corpus, k=5)
    return ann_recall_audit(approx, exact, queries, k=5, floor=0.80)


# --------------------------------------------------------------------------
# q44 — LSH-tier related-articles pipeline under the recall-floor oracle:
# the scale path of the flagship operator, oracle-gated.
# --------------------------------------------------------------------------
@register(
    "q44_related_lsh",
    covers=("J4", "J5", "J6", "A7", "W5"),
    oracle="""
SELECT vec_id AS qid, 'topk_complete' AS metric, true AS ok
FROM embeddings WHERE vec_id % 20 = 0
UNION ALL
SELECT CAST(-1 AS BIGINT), 'mean_recall_floor', true
""",
)
def q44_related_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The related-articles pipeline on its 100 TB candidate tier: the same
    two-tier + fallback + hydrate + re-rank semantics as q41, but candidates
    come from :func:`lsh_candidate_ids` instead of the quadratic pair join.
    Emits :func:`ann_recall_audit` of the LSH-tier final top-5 against the
    exact-tier final top-5 — per-query completeness plus mean overlap ≥ 0.25
    (measured 0.34-0.38 across sf0.001/0.01/0.1; the weighted re-rank
    amplifies candidate-set differences, so the floor sits below the plain
    ANN one).  Deterministic per dataset ⇒ hash-stable under the driver
    gate."""
    queries, corpus, scores = _related_inputs(spark, sf_dir)
    approx = related_topk(
        queries, corpus, scores, k_candidates=6, k_final=5, tier="lsh", dims=64, bits=4, tables=4
    )
    exact = related_topk(queries, corpus, scores, k_candidates=6, k_final=5)
    return ann_recall_audit(approx, exact, queries, k=5, floor=0.25)


# --------------------------------------------------------------------------
# q113 — random-projection dimensionality reduction (signed JL transform).
# --------------------------------------------------------------------------
#: ±1 sign matrix for the Johnson–Lindenstrauss projection, derived ONCE
#: from md5 so it is seed-free and identical everywhere (the matrix is a
#: shared literal in BOTH the Spark plan and the oracle SQL — no per-row
#: hashing).  64 input dims → 16 output dims.
_RP_D_IN = 64
_RP_D_OUT = 16
#: floor(x · 2^20) input quantization: the multiply by a power of two is
#: EXACT in IEEE doubles, so quantized coordinates — and therefore the
#: all-integer projection sums — are engine-exact.
_RP_SCALE = "1048576.0"


def _rp_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[-1], 16) % 2 == 0 else -1
            for i in range(_RP_D_IN)
        ]
        for j in range(_RP_D_OUT)
    ]


def _q113_oracle() -> str:
    rows = ",\n  ".join(
        f"({j}, {_rp_signs()[j]})" for j in range(_RP_D_OUT)
    )
    return f"""
SELECT vec_id, CAST(dim AS BIGINT) AS dim,
       CAST(list_sum(list_transform(generate_series(1, {_RP_D_IN}),
            i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * {_RP_SCALE}) AS BIGINT)
                 * signs[i])) AS BIGINT) AS proj_fp
FROM embeddings
CROSS JOIN (VALUES
  {rows}
) AS sm(dim, signs)
"""


@register("q113_random_projection", covers=("A5", "S8"), oracle=_q113_oracle())
def q113_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection (Achlioptas/JL transform) of the embedding
    column: 64 dims → 16, preserving pairwise distances within JL bounds —
    the standard cheapening step BEFORE clustering (q96), SemDeDup (q85)
    or IVF training at corpus scale.  The ±1 sign matrix is a 64×16
    md5-derived LITERAL shared by plan and oracle (seed-free, no per-row
    hashing), coordinates quantize by an exact power-of-two scale, and
    each output coordinate is an integer dot product — fully map-only,
    zero shuffles, engine-exact.  Output exploded to (vec_id, dim,
    proj_fp) scalars so the gate hashes a scalar surface."""
    signs = _rp_signs()
    # no spread(): the projection is map-only, so partition parallelism
    # comes from file splits — the plan must stay exchange-free (pinned).
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(_RP_SCALE))).cast("long"),
    )
    matrix = F.array(
        *[F.array(*[F.lit(s) for s in row]) for row in signs]
    )
    proj = F.transform(
        matrix,
        lambda row: F.aggregate(
            F.zip_with(qvec, row, lambda a, b: a * b.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return emb.select(
        "vec_id", F.posexplode(proj).alias("dim", "proj_fp")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "proj_fp")


# --------------------------------------------------------------------------
# q116 — MMR diversified re-ranking over the retrieval shortlist.
# --------------------------------------------------------------------------
_MMR_M = 8  # shortlist size per query
_MMR_K = 3  # final diversified picks

#: identical arithmetic text in both dialects: integer dot products from
#: floor(x·2^20) quantization, then one floor of an all-correctly-rounded
#: double expression (mul/div/sqrt — never a library transcendental).
_COS_FP = (
    "CAST(floor((CAST({dot} AS DOUBLE) * 1000000.0)"
    " / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))) AS BIGINT)"
)


def _q116_oracle() -> str:
    dot_qc = "list_sum(list_transform(generate_series(1,64), i -> q.qv[i]*c.qv[i]))"
    dot_ab = "list_sum(list_transform(generate_series(1,64), i -> na.qv[i]*nb.qv[i]))"
    rel = _COS_FP.format(dot=dot_qc, na="q.nf", nb="c.nf")
    sim = _COS_FP.format(dot=dot_ab, na="na.nf", nb="nb.nf")
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE)*1048576.0) AS BIGINT)) AS qv
  FROM embeddings
),
n AS MATERIALIZED (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(generate_series(1,64), i -> qv[i]*qv[i]))
              AS BIGINT) AS nf
  FROM e
),
p AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS cid, {rel} AS rel_fp
  FROM n q JOIN n c ON q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
),
cand AS MATERIALIZED (
  SELECT query_id, cid, rel_fp FROM (
    SELECT query_id, cid, rel_fp,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel_fp DESC, cid) AS rn
    FROM p) WHERE rn <= {_MMR_M}
),
sims AS MATERIALIZED (
  SELECT a.query_id, a.cid AS cid_a, b.cid AS cid_b, {sim} AS sim_fp
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
  JOIN n na ON na.vec_id = a.cid
  JOIN n nb ON nb.vec_id = b.cid
),
s1 AS MATERIALIZED (
  SELECT query_id, cid, rel_fp AS mmr_fp FROM (
    SELECT query_id, cid, rel_fp,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel_fp DESC, cid) AS rn
    FROM cand) WHERE rn = 1
),
p2 AS MATERIALIZED (
  SELECT c.query_id, c.cid, c.rel_fp - max(s.sim_fp) AS score
  FROM cand c
  JOIN s1 ON s1.query_id = c.query_id AND c.cid <> s1.cid
  JOIN sims s ON s.query_id = c.query_id AND s.cid_a = c.cid
             AND s.cid_b = s1.cid
  GROUP BY c.query_id, c.cid, c.rel_fp
),
s2 AS MATERIALIZED (
  SELECT query_id, cid, score AS mmr_fp FROM (
    SELECT query_id, cid, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, cid) AS rn
    FROM p2) WHERE rn = 1
),
sel2 AS MATERIALIZED (
  SELECT query_id, cid FROM s1 UNION ALL SELECT query_id, cid FROM s2
),
p3 AS MATERIALIZED (
  SELECT c.query_id, c.cid, c.rel_fp - max(s.sim_fp) AS score
  FROM cand c
  LEFT JOIN sel2 x ON x.query_id = c.query_id AND x.cid = c.cid
  JOIN sims s ON s.query_id = c.query_id AND s.cid_a = c.cid
  JOIN sel2 t ON t.query_id = s.query_id AND t.cid = s.cid_b
  WHERE x.cid IS NULL
  GROUP BY c.query_id, c.cid, c.rel_fp
),
s3 AS MATERIALIZED (
  SELECT query_id, cid, score AS mmr_fp FROM (
    SELECT query_id, cid, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, cid) AS rn
    FROM p3) WHERE rn = 1
)
SELECT query_id, CAST(1 AS INT) AS sel_rank, cid, mmr_fp FROM s1
UNION ALL
SELECT query_id, CAST(2 AS INT) AS sel_rank, cid, mmr_fp FROM s2
UNION ALL
SELECT query_id, CAST(3 AS INT) AS sel_rank, cid, mmr_fp FROM s3
"""


@register("q116_mmr_rerank", covers=("J4", "W5"), oracle=_q116_oracle())
def q116_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: exact cosine shortlist (m=8 per query) then
    k=3 greedy MMR picks (λ=1/2) — near-duplicate hits that brute top-k
    would return back-to-back are penalized by their similarity to what's
    already selected.  Numerics: quantized INTEGER dot products, one
    floor over mul/div/sqrt doubles (all correctly rounded — no library
    transcendental), integer MMR scores; every argmax tie-breaks
    (score DESC, cid ASC), so the full greedy trajectory is engine-exact
    and the oracle unrolls it as static CTE rounds.  Plan: the retrieval
    stage is the q40 discipline (queries broadcast, corpus streams, one
    ranking window); the selection rounds run on the shortlist frame —
    m·|queries| rows — so their cost is independent of corpus size."""
    from briefly_spark.operators.similarity import mmr_rerank

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1048576.0)).cast("long"),
    )
    base = emb.select("vec_id", qv.alias("qv")).withColumn(
        "nf",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("qv"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    base = base.persist()
    queries = base.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nf").alias("q_nf"),
    )
    corpus = base.select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("c_qv"), F.col("nf").alias("c_nf")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_qv"), F.col("c_qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rel = F.expr(
        _COS_FP.format(dot="dot_fp", na="q_nf", nb="c_nf")
    )
    # score with vectors in hand (map-side), but send only the THIN
    # (query_id, cid, rel_fp) triple through the ranking-window shuffle —
    # the q42/q45 "shuffles never carry vectors" discipline; shortlist
    # vectors re-attach afterwards by equi-join against the cached base.
    pairs = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("cid"))
        .withColumn("dot_fp", dot)
        .select("query_id", "cid", rel.alias("rel_fp"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rel_fp"), F.asc("cid"))
    cand = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_M)
        .drop("rn")
    )
    cand = cand.persist()
    hydrate = base.select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("h_qv"), F.col("nf").alias("h_nf")
    )
    cand_v = cand.join(hydrate, "cid")
    a = cand_v.select("query_id", F.col("cid").alias("cid_a"), F.col("h_qv").alias("a_qv"), F.col("h_nf").alias("a_nf"))
    b = cand_v.select("query_id", F.col("cid").alias("cid_b"), F.col("h_qv").alias("b_qv"), F.col("h_nf").alias("b_nf"))
    sdot = F.aggregate(
        F.zip_with(F.col("a_qv"), F.col("b_qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("cid_a") != F.col("cid_b"))
        .withColumn("dot_fp", sdot)
        .select(
            "query_id",
            "cid_a",
            "cid_b",
            F.expr(_COS_FP.format(dot="dot_fp", na="a_nf", nb="b_nf")).alias("sim_fp"),
        )
    )
    return mmr_rerank(
        cand.select("query_id", "cid", "rel_fp"), sims, k=_MMR_K
    )


# --------------------------------------------------------------------------
# q118 — product-quantization ANN with asymmetric distance computation.
# --------------------------------------------------------------------------
_PQ_S = 8       # subspaces (64 dims -> 8 × 8)
_PQ_W = 8       # subspace width
_PQ_K = 16      # centroids per subspace codebook
_PQ_ITERS = 2   # Lloyd rounds per codebook
_PQ_SHORTLIST = 32  # ADC candidates per query, exact-re-ranked to top-k
_PQ_TOPK = 5
_IVF_CELLS = 16  # coarse cells for the ivfpq section (X150 graft, r15)
_IVF_PROBE = 4   # cells probed per query — a real 4/16 prune, oracle-mirrored


def _q118_oracle() -> str:
    """Fused PQ oracle: ONE (id, s, q) sub-vector frame carries every
    subspace through the shared Lloyd rounds (the same fusion the Spark
    side uses — one shuffle per round regardless of subspace count),
    instead of 8 unrolled per-subspace CTE chains.  Bit-identical result
    (verified hash-equal to the unrolled form); oracle text ~5× smaller
    and DuckDB materializes 4 frames per round instead of 32."""

    def sq(v: str, c: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {_PQ_W} + 1),"
            f" i -> ({v}.q[i] - {c}.cv[i]) * ({v}.q[i] - {c}.cv[i])))"
        )

    parts = [
        f"""qv AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
  FROM embeddings
),
sub AS MATERIALIZED (
  SELECT id, CAST(t.s AS INT) AS s,
         q[(CAST(t.s AS INT) * {_PQ_W} + 1):((CAST(t.s AS INT) + 1) * {_PQ_W})] AS q
  FROM qv, UNNEST(range({_PQ_S})) t(s)
),
cr0 AS MATERIALIZED (
  SELECT s, id AS cell, q AS cv FROM (
    SELECT *, row_number() OVER (PARTITION BY s ORDER BY id) AS rn FROM sub)
  WHERE rn <= {_PQ_K}
)"""
    ]
    for r in range(_PQ_ITERS):
        parts.append(f"""
asr{r} AS MATERIALIZED (
  SELECT s, id, q, cell FROM (
    SELECT v.s, v.id, v.q, c.cell,
           row_number() OVER (PARTITION BY v.s, v.id
                              ORDER BY {sq("v", "c")}, c.cell) AS rn
    FROM sub v JOIN cr{r} c ON c.s = v.s) WHERE rn = 1
),
cr{r + 1} AS MATERIALIZED (
  SELECT s, cell, list(cval ORDER BY dim) AS cv FROM (
    SELECT s, cell, u.dim, CAST(SUM(u.val) AS BIGINT) // COUNT(*) AS cval
    FROM asr{r},
         UNNEST(list_transform(range(1, len(q) + 1),
                i -> {{'dim': i, 'val': q[i]}})) t(u)
    GROUP BY s, cell, u.dim) GROUP BY s, cell
)""")
    parts.append(f"""
codes AS MATERIALIZED (
  SELECT id, s, cell AS code FROM (
    SELECT v.id, v.s, c.cell,
           row_number() OVER (PARTITION BY v.s, v.id
                              ORDER BY {sq("v", "c")}, c.cell) AS rn
    FROM sub v JOIN cr{_PQ_ITERS} c ON c.s = v.s) WHERE rn = 1
),
dt AS MATERIALIZED (
  SELECT v.id AS query_id, v.s AS s, c.cell AS code,
         CAST({sq("v", "c")} AS BIGINT) AS d
  FROM (SELECT id, s, q FROM sub WHERE id % 20 = 0) v
  JOIN cr{_PQ_ITERS} c ON c.s = v.s
),
scored AS MATERIALIZED (
  SELECT dt.query_id, codes.id AS neighbor_id,
         CAST(SUM(dt.d) AS BIGINT) AS adc_dist
  FROM codes JOIN dt ON codes.s = dt.s AND codes.code = dt.code
  WHERE dt.query_id <> codes.id
  GROUP BY dt.query_id, codes.id
)""")
    parts.append(f"""
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, neighbor_id) AS rn
    FROM scored) WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS MATERIALIZED (
  SELECT c.query_id, c.neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
              i -> (qq.q[i] - nq.q[i]) * (qq.q[i] - nq.q[i]))) AS BIGINT)
           AS sq_dist
  FROM cand c
  JOIN qv qq ON qq.id = c.query_id
  JOIN qv nq ON nq.id = c.neighbor_id
)""")
    # X150 graft (r15): the PRUNED IVF-PQ leg, mirrored in full.  Coarse
    # cells are the n_cells corpus vectors with smallest md5(id) (the
    # operators/pq.py:ivf_coarse_cells discipline — deterministic, so the
    # whole prune sits on the oracle surface, not just the full-probe
    # identity the pin test already covers); corpus→cell and query→probe
    # assignments are integer full-width argmins with smallest-cell ties;
    # ADC is restricted to probed-cell candidate pairs; the shortlist
    # re-ranks through the SAME exact integer distance as the flat leg.
    fsq = (
        "list_sum(list_transform(range(1, len(v.q) + 1),"
        " i -> (v.q[i] - c.cv[i]) * (v.q[i] - c.cv[i])))"
    )
    parts.append(f"""
cells AS MATERIALIZED (
  SELECT id AS cell_id, q AS cv FROM qv
  ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {_IVF_CELLS}
),
corpus_cell AS MATERIALIZED (
  SELECT id, cell_id FROM (
    SELECT v.id, c.cell_id,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {fsq}, c.cell_id) AS rn
    FROM qv v JOIN cells c ON TRUE) WHERE rn = 1
),
query_cell AS MATERIALIZED (
  SELECT query_id, cell_id FROM (
    SELECT v.id AS query_id, c.cell_id,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {fsq}, c.cell_id) AS rn
    FROM (SELECT id, q FROM qv WHERE id % 20 = 0) v
    JOIN cells c ON TRUE) WHERE rn <= {_IVF_PROBE}
),
ivf_scored AS MATERIALIZED (
  SELECT ca.query_id, ca.neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS adc_dist
  FROM (SELECT qc.query_id, cc.id AS neighbor_id
        FROM query_cell qc JOIN corpus_cell cc USING (cell_id)
        WHERE qc.query_id <> cc.id) ca
  JOIN codes ON codes.id = ca.neighbor_id
  JOIN dt ON dt.query_id = ca.query_id
         AND dt.s = codes.s AND dt.code = codes.code
  GROUP BY ca.query_id, ca.neighbor_id
),
ivf_rerank AS MATERIALIZED (
  SELECT c.query_id, c.neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
              i -> (qq.q[i] - nq.q[i]) * (qq.q[i] - nq.q[i]))) AS BIGINT)
           AS sq_dist
  FROM (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist, neighbor_id) AS rn
          FROM ivf_scored) WHERE rn <= {_PQ_SHORTLIST}) c
  JOIN qv qq ON qq.id = c.query_id
  JOIN qv nq ON nq.id = c.neighbor_id
)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT 'flat' AS section, query_id, neighbor_id,
       CAST(rank AS BIGINT) AS rank, sq_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sq_dist, neighbor_id) AS rank
  FROM rerank) WHERE rank <= {_PQ_TOPK}
UNION ALL
SELECT 'ivfpq' AS section, query_id, neighbor_id,
       CAST(rank AS BIGINT) AS rank, sq_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sq_dist, neighbor_id) AS rank
  FROM ivf_rerank) WHERE rank <= {_PQ_TOPK}"""
    )


@register("q118_pq_ann", covers=("W5", "J4"), oracle=_q118_oracle())
def q118_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) — the last rung of
    the ANN ladder (q40 exact → q42 LSH → q43 IVF → q45 int8-SQ → PQ):
    8 per-subspace integer-Lloyd's codebooks (the q96 discipline), the
    corpus encoded to 8 small ints per vector (32× smaller than floats),
    asymmetric distances resolved by joining the code table against a
    BROADCAST |queries|·S·k distance table, and the ADC top-32 shortlist
    EXACT-re-ranked to top-5 — the production IVF-PQ usage: coarse codes
    prune, full precision (hydrated by id equi-join, shortlist rows only)
    decides.  Every stage is integer-exact (quantized coordinates,
    integer argmins with smallest-cell ties, truncating-division centroid
    updates, integer ADC sums), so the oracle unrolls the complete
    fit+encode+search pipeline — 8 codebooks × 2 Lloyd rounds included —
    as static CTE stages and hashes the exact result.  Measured recall@5
    vs exact ≈ 0.54 at fixture scale on the synthetic near-uniform
    embeddings — PQ's adversarial worst case (no cluster structure;
    distance concentration); K and the shortlist size are the recall
    levers, and the recall floor is pytest-pinned.  See operators/pq.py
    for the 100 TB shape.

    r15 graft (X150, tools/window_plan.py disposition): an 'ivfpq'
    section carries the PRUNED coarse-cell search (n_cells=16, n_probe=4
    — a real 4/16 prune, the fix for flat ADC's q·n ~ K² super-linear
    term found by the r14 ×32 sweep) alongside the 'flat' surface, under
    ONE driver hash.  The oracle mirrors the prune itself — smallest-md5
    coarse cells, integer argmin assignments, probed-cell-only ADC —
    not just the full-probe byte-identity (which stays pytest-pinned in
    tests/test_similarity.py); codebooks, distance table, and the exact
    re-rank are shared between the legs on both sides."""
    from briefly_spark.operators.pq import (
        ivfpq_search,
        pq_fit_encode,
        pq_search,
        quantized,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    codes, books = pq_fit_encode(
        emb, id_col="vec_id", vec_col="embedding", dim=64,
        subspaces=_PQ_S, k=_PQ_K, iters=_PQ_ITERS,
    )
    codes = codes.persist()
    corpus_q = quantized(emb, "vec_id", "embedding").persist()
    queries = corpus_q.filter(F.col("id") % 20 == 0).select(
        F.col("id").alias("query_id"), "q"
    )
    flat = pq_search(
        queries, corpus_q, codes, books,
        dim=64, subspaces=_PQ_S, shortlist=_PQ_SHORTLIST, k_final=_PQ_TOPK,
    )
    ivfpq = ivfpq_search(
        queries, corpus_q, codes, books,
        dim=64, subspaces=_PQ_S, n_cells=_IVF_CELLS, n_probe=_IVF_PROBE,
        shortlist=_PQ_SHORTLIST, k_final=_PQ_TOPK,
    )

    def tidy(df: DataFrame, section: str) -> DataFrame:
        return df.select(
            F.lit(section).alias("section"),
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "sq_dist",
        )

    return tidy(flat, "flat").unionByName(tidy(ivfpq, "ivfpq"))
