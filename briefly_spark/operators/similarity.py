"""Similarity search — SURVEY §2.4 J4/J5 (the reference's Qdrant ANN) and
the training-pipeline ANN operators.

Three tiers, same output contract (query_id, neighbor_id, rank, sim):

- :func:`topk_cosine` — exact brute-force top-k: (blocked) pair join →
  native cosine → per-query window.  The correctness baseline; also the
  right choice whenever one side broadcasts (queries ≪ corpus).
- :func:`hyperplane_signature` + :func:`lsh_topk` — approximate scale path:
  deterministic random-hyperplane LSH (signs of dot products with md5-seeded
  ±1 planes) → bucket equi-join → exact re-rank inside buckets.  Replaces
  the O(|Q|·|C|) pair join with a bucketed join; recall tunable via
  signature bits / probe radius.
- :func:`related_topk` — the reference's full related-articles semantics
  (get_relevant_articles.py:62-139): same-topic top-k, cross-topic fallback
  fill to k, hydration join for validation_score, weighted re-rank
  0.7·(sim·10) + 0.3·validation, final top-n.

Pair-scoring cost discipline: vector norms are computed ONCE per row in a
staged projection before the join, so each joined pair evaluates a single
dot-product fold (`dot/(qn·cn)` is IEEE-identical to cosine computed
per-pair, keeping oracle hash-equality).  Inlining the norm into the pair
expression would triple the per-pair fold count — the dominant cost of a
quadratic verify stage.

Scale design: the corpus side is repartitioned on the blocking key, every
ranking is a window over ``partitionBy(query)`` — no collect, no driver
loops; skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from briefly_spark.catalog import spread
from briefly_spark.functions.vectors import dot, l2_norm
from briefly_spark.numerics import trunc4


def _ranked(pairs: DataFrame, k: int, *, score_col: str = "cos") -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.asc("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _with_norm(df: DataFrame, norm_col: str) -> DataFrame:
    """Stage ||v|| once per row (separate projection — no CSE in lambdas)."""
    return df.withColumn(norm_col, l2_norm(F.col("v")))


def _pair_cos(qn: str = "q.qn", cn: str = "c.cn") -> Column:
    """cos from pre-staged norms; same zero-norm guard as vectors.cosine."""
    qn_c, cn_c = F.col(qn), F.col(cn)
    return F.when(
        (qn_c > 0) & (cn_c > 0), dot(F.col("q.v"), F.col("c.v")) / (qn_c * cn_c)
    ).otherwise(F.lit(0.0))


def topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    block: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k.  Inputs: queries(query_id, v[, block]),
    corpus(neighbor_id, v[, block]).  Returns (query_id, neighbor_id, rank,
    sim) with deterministic ties (sim desc, neighbor_id asc)."""
    q = _with_norm(queries, "qn").alias("q")
    # The self-exclusion predicate makes this a broadcast-nested-loop join
    # (queries broadcast, corpus streamed) whose parallelism is exactly the
    # corpus's partition count — a single small parquet file streams as ONE
    # task.  Spread the corpus across the cluster before the quadratic
    # stage; one narrow shuffle of the thin side buys full-width execution.
    c = _with_norm(spread(corpus), "cn").alias("c")
    cond = F.lit(True) if block is None else (F.col(f"q.{block}") == F.col(f"c.{block}"))
    if exclude_self:
        cond = cond & (F.col("q.query_id") != F.col("c.neighbor_id"))
    pairs = q.join(c, cond).select("q.query_id", "c.neighbor_id", _pair_cos().alias("cos"))
    return _ranked(pairs, k).select(
        "query_id", "neighbor_id", "rank", trunc4(F.col("cos")).alias("sim")
    )


# ---------------------------------------------------------------------------
# deterministic hyperplane LSH
# ---------------------------------------------------------------------------
def plane_matrix(dims: int, n_planes: int, offset: int = 0) -> list[list[float]]:
    """md5-seeded ±1 hyperplanes, computed ONCE on the driver: plane p,
    dim d (1-based) is +1 iff the first hex char of md5("p:d") is ≥ '8'.
    Deterministic and engine-free — the matrix is folded into the plan as
    literals, so executors never hash plane coordinates (doing it in-plan
    cost planes×dims md5 calls *per row*)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0] >= "8" else -1.0
            for d in range(1, dims + 1)
        ]
        for p in range(offset, offset + n_planes)
    ]


def hyperplane_signature(v: Column, planes: list[list[float]]) -> Column:
    """'0'/'1' signature of v against literal ±1 planes: one zip_with fold
    per plane (sign of <v, plane>).

    MEASURED (sf0.1, 64-dim, local[32]): unrolling the fold into an
    explicit ±v[i] add-chain is ~2.5× SLOWER here despite winning in a
    plain scan+aggregate micro-bench — 64-term expression trees exceed
    what codegen/JIT handle well in join/projection contexts.  Keep the
    fold; see the same note on :func:`briefly_spark.functions.vectors.dot`."""
    bits = []
    for row in planes:
        lit_plane = F.array(*[F.lit(x) for x in row])
        d = F.aggregate(
            F.zip_with(v, lit_plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(d > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def signature_tables(v: Column, dims: int, bits: int, tables: int) -> Column:
    """L independent bucket keys (table t uses planes [t·bits, (t+1)·bits)).
    Multi-table LSH: a true neighbor is a candidate if it collides in ANY
    table — recall ≈ 1-(1-p^bits)^tables for per-plane agreement p.

    MEASURED (sf0.01, 16 planes × 64 dims): ONE transform over a 2-D
    plane-literal array (one lambda, one fold per plane at runtime) is
    ~30% faster per run than bits·tables separate fold expressions — same
    leaf-literal count, far fewer lambda nodes for Catalyst to analyze.
    Output is bit-identical to the per-plane form
    (:func:`hyperplane_signature`, kept for tests/single-table use)."""
    planes = plane_matrix(dims, bits * tables)
    lit2d = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    bitchars = F.transform(
        lit2d,
        lambda plane: F.when(
            F.aggregate(F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x) > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array(
        *[F.concat_ws("", F.slice(bitchars, t * bits + 1, bits)) for t in range(tables)]
    )


def lsh_bits_for(
    n_corpus: int,
    *,
    target_bucket_rows: int = 64,
    min_bits: int = 8,
    max_bits: int = 20,
) -> int:
    """Corpus-size-adaptive hyperplane count: enough bits that expected
    bucket occupancy stays ~``target_bucket_rows`` (buckets ≈ n/target),
    clamped to [min_bits, max_bits].

    WHY (r15 gate-rung finding): with FIXED bits the bucket count is a
    constant, so occupancy grows linearly with the corpus and candidate
    pairs grow |Q|·n/2^bits — the same q·n ~ K² class as the r14
    flat-ADC finding, just divided by a constant (measured: q129's LSH
    branch at the ×32 rung).  With bits ~ log2(n/target) the occupancy
    is constant, so candidate pairs ~ |Q|·target·tables — linear in the
    query panel, flat in the corpus.  Exact-duplicate vectors always
    share every bucket regardless of bits (they are genuine neighbors —
    output-relevant work); adaptive bits splits the *distinct* vectors.
    Signature cost grows with bits (bits·tables plane dots per row) —
    logarithmic in n, the right trade.  max_bits=20 caps the plan's
    plane-literal array at 80·dims floats.

    Recall: more bits lowers per-table collision probability for
    near-but-not-identical vectors; multi-table OR-ing compensates
    (recall ≈ 1-(1-p^bits)^tables).  Callers that pin bits for a gated
    hash (q44's bits=4) are unaffected — this helper is only wired into
    scale paths that engage above the exact-tier pair bound."""
    import math

    if n_corpus <= 0:
        return min_bits
    need = math.ceil(math.log2(max(n_corpus / target_bucket_rows, 1.0)))
    return max(min_bits, min(max_bits, need))


def lsh_candidate_ids(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    dims: int,
    bits: int = 8,
    tables: int = 4,
) -> DataFrame:
    """Thin multi-table LSH candidate generation: both sides are bucketed L
    times, candidates = bucket equi-join union over tables, deduped to
    distinct (query_id, neighbor_id).

    Shuffle-payload discipline (mirrors ``lsh_candidate_pairs``, dedup.py):
    the ×tables posexplode and the banded join carry ONLY (id, tbl, bucket)
    — never the vector or its norm, which would multiply shuffle bytes by
    the table count.  Callers re-attach payloads by id equi-joins on the
    deduped set."""
    def banded_ids(df: DataFrame, id_col: str) -> DataFrame:
        # signature staged in its own projection (computed once per row)
        signed = df.select(id_col, signature_tables(F.col("v"), dims, bits, tables).alias("sigs"))
        return signed.select(id_col, F.posexplode("sigs").alias("tbl", "bucket"))

    qb = banded_ids(queries, "query_id").alias("qb")
    cb = banded_ids(corpus, "neighbor_id").alias("cb")
    return (
        qb.join(
            cb,
            (F.col("qb.tbl") == F.col("cb.tbl"))
            & (F.col("qb.bucket") == F.col("cb.bucket"))
            & (F.col("qb.query_id") != F.col("cb.neighbor_id")),
        )
        .select("qb.query_id", "cb.neighbor_id")
        .distinct()
    )


def _score_candidates(cand: DataFrame, queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """Re-attach v/norm to a thin candidate-id set and score each distinct
    pair exactly once: two id equi-joins + one cosine fold per pair."""
    qv = _with_norm(queries, "qn").alias("q")
    cv = _with_norm(spread(corpus), "cn").alias("c")
    return (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", _pair_cos().alias("cos"))
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    dims: int,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH:
    :func:`lsh_candidate_ids` → payload re-attach → exact cosine re-rank on
    the deduped candidate set.  O(pairs-in-buckets) instead of O(|Q|·|C|) —
    the 100 TB path; tune (bits, tables) for the recall/cost point.  Same
    output contract as :func:`topk_cosine`."""
    cand = lsh_candidate_ids(queries, corpus, dims=dims, bits=bits, tables=tables)
    pairs = _score_candidates(cand, queries, corpus)
    return _ranked(pairs, k).select(
        "query_id", "neighbor_id", "rank", trunc4(F.col("cos")).alias("sim")
    )


def kmeans_centroids(corpus: DataFrame, n_cells: int, *, seed: int = 7) -> DataFrame:
    """Real coarse-quantizer training: ``spark.ml`` KMeans over the corpus
    vectors, returning the same (cell_id, cv, cvn) centroid-dim contract the
    seeded-sample path produces.  Seeded k-means|| init → reproducible for
    a fixed dataset/partitioning; fit once offline at 100 TB and broadcast
    the centers exactly like the stand-in.  The model's centers are a
    driver-side list (n_cells × dims floats) — collecting them is the
    broadcast, not a data collect."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    spark = corpus.sparkSession
    rows = [(i, [float(x) for x in center]) for i, center in enumerate(model.clusterCenters())]
    centers = spark.createDataFrame(rows, "cell_id long, cv array<double>")
    return centers.select("cell_id", "cv", l2_norm(F.col("cv")).alias("cvn"))


def ivf_candidate_ids(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: str = "sample",
) -> DataFrame:
    """Thin IVF (inverted-file) candidate generation — the coarse-quantizer
    scale path complementing :func:`lsh_candidate_ids`.

    ``centroids="sample"`` (default, oracle path): the ``n_cells``
    centroids are the corpus vectors with the lexicographically smallest
    ``md5(neighbor_id)`` — a seeded sample that is byte-reproducible in any
    engine (SURVEY §7.2 bans nondeterminism in oracle paths).
    ``centroids="kmeans"``: real ``spark.ml`` KMeans training
    (:func:`kmeans_centroids`) — better-shaped cells, deterministic per
    dataset via a fixed seed but not SQL-mirrorable, so it's covered by the
    recall unit test rather than the hash oracle.

    Every corpus vector is assigned to its nearest centroid (one broadcast
    join against ``n_cells`` rows); each query probes its ``n_probe``
    nearest cells.  Candidates = cell equi-join, distinct by construction
    (corpus keep=1 × disjoint probed cells).  Cost: O(|C|·n_cells)
    assignment + O(|Q|·|C|·n_probe/n_cells) candidate pairs — the quadratic
    join shrinks by ~n_cells/n_probe with recall controlled by n_probe.
    Only (id, cell_id) rides the cell join; callers re-attach payloads on
    the thin candidate set."""
    c = _with_norm(spread(corpus), "cn")
    if centroids == "kmeans":
        cent = kmeans_centroids(corpus, n_cells)
    elif centroids == "sample":
        cent = (
            c.withColumn("ck", F.md5(F.col("neighbor_id").cast("string")))
            .orderBy("ck")
            .limit(n_cells)
            .select(
                F.col("neighbor_id").alias("cell_id"),
                F.col("v").alias("cv"),
                F.col("cn").alias("cvn"),
            )
        )
    else:
        raise ValueError(f"unknown centroids mode {centroids!r}")
    centroids_df = cent
    cent_cos = F.when(
        (F.col("n") > 0) & (F.col("cvn") > 0),
        dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cvn")),
    ).otherwise(F.lit(0.0))

    def assign(df: DataFrame, id_col: str, norm_col: str, keep: int) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cell_id"))
        return (
            df.withColumnRenamed(norm_col, "n")
            .join(F.broadcast(centroids_df), how="cross")
            .withColumn("ccos", cent_cos)
            .withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") <= keep)
            .select(id_col, "cell_id")
        )

    cb = assign(c, "neighbor_id", "cn", 1).alias("c")
    qb = assign(_with_norm(queries, "qn"), "query_id", "qn", n_probe).alias("q")
    return qb.join(
        cb,
        (F.col("q.cell_id") == F.col("c.cell_id"))
        & (F.col("q.query_id") != F.col("c.neighbor_id")),
    ).select("q.query_id", "c.neighbor_id")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF cells: :func:`ivf_candidate_ids` → payload
    re-attach → exact cosine re-rank inside probed cells.  Same output
    contract as :func:`topk_cosine`; recall vs the exact baseline is under
    the q43 audit oracle and asserted in tests."""
    cand = ivf_candidate_ids(queries, corpus, n_cells=n_cells, n_probe=n_probe)
    pairs = _score_candidates(cand, queries, corpus)
    return _ranked(pairs, k).select(
        "query_id", "neighbor_id", "rank", trunc4(F.col("cos")).alias("sim")
    )


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 quantization: q[i] = floor(v[i]/max|v|·127),
    values in [-127, 127].  ``floor`` (not round) because floor is
    bit-identical across Spark and DuckDB, keeping the quantized tier
    SQL-oracle-mirrorable; an all-zero vector quantizes to zeros.  Cosine
    is scale-invariant, so the per-vector scale needs no storage for
    ranking use — at 100 TB the resident ANN corpus shrinks 8× (float64
    arrays → int8) with recall recovered by exact re-rank."""
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(
        mx > 0, F.transform(v, lambda x: F.floor(x / mx * 127).cast("double"))
    ).otherwise(F.transform(v, lambda x: F.lit(0.0)))


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate top-k via int8 scalar quantization + exact re-rank: the
    candidate scan scores QUANTIZED vectors (8× smaller resident set /
    shuffle payload at scale), keeps ``k·rerank_factor`` candidates per
    query, then re-ranks only those with full-precision cosine.

    Plan discipline mirrors the LSH/IVF tiers: the candidate join carries
    only quantized vectors + norms; full-precision vectors are re-attached
    to the THIN candidate id set by two equi-joins (``_score_candidates``).
    Same output contract as :func:`topk_cosine`.  Complementary to LSH/IVF:
    quantization cuts bytes-per-vector, bucketing cuts pairs — at 100 TB
    the two compose (quantized vectors inside IVF cells)."""
    q8 = queries.select("query_id", quantize_int8(F.col("v")).alias("v"))
    c8 = corpus.select("neighbor_id", quantize_int8(F.col("v")).alias("v"))
    qq = _with_norm(q8, "qn").alias("q")
    cc = _with_norm(spread(c8), "cn").alias("c")
    pairs8 = qq.join(
        cc, F.col("q.query_id") != F.col("c.neighbor_id")
    ).select("q.query_id", "c.neighbor_id", _pair_cos().alias("cos"))
    cand = _ranked(pairs8, k * rerank_factor).select("query_id", "neighbor_id")
    exact_pairs = _score_candidates(cand, queries, corpus)
    return _ranked(exact_pairs, k).select(
        "query_id", "neighbor_id", "rank", trunc4(F.col("cos")).alias("sim")
    )


def contrastive_pairs(
    anchors: DataFrame,
    corpus: DataFrame,
    *,
    neg_lo: int = 6,
    neg_hi: int = 10,
) -> DataFrame:
    """Training-pair mining for embedding models: for every anchor, the
    positive is its nearest neighbor (rank 1) and the hard negatives are
    the mid-ranked neighbors (ranks ``neg_lo``..``neg_hi``) — close enough
    to be informative, far enough to be wrong (the standard in-batch
    hard-negative recipe).  Returns one row per (anchor, negative):
    (anchor_id, pos_id, neg_id, pos_sim, neg_sim, margin).

    ONE ranking pass: a single top-``neg_hi`` ranking per anchor feeds
    both roles via a conditional aggregation (max over the rank-1 struct)
    joined back — no second scoring stage.  At 100 TB swap
    :func:`topk_cosine` for an approximate tier (:func:`lsh_topk` /
    :func:`quantized_topk`) — the pair-selection window is unchanged."""
    ranked = topk_cosine(anchors, corpus, k=neg_hi)
    w = Window.partitionBy("query_id")
    pos = F.max(F.when(F.col("rank") == 1, F.struct("sim", "neighbor_id"))).over(w)
    return (
        ranked.withColumn("pos", pos)
        .filter((F.col("rank") >= neg_lo) & (F.col("rank") <= neg_hi))
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("pos.neighbor_id").alias("pos_id"),
            F.col("neighbor_id").alias("neg_id"),
            F.col("pos.sim").alias("pos_sim"),
            F.col("sim").alias("neg_sim"),
            (F.col("pos.sim") - F.col("sim")).alias("margin"),
        )
    )


def ann_recall_audit(
    approx: DataFrame, exact: DataFrame, queries: DataFrame, *, k: int, floor: float
) -> DataFrame:
    """Deterministic recall gate for an approximate ANN result — the bridge
    that puts LSH/IVF under the SQL-oracle hash check even though their
    output can't match an exact oracle row-for-row.

    Emits (qid, metric, ok):
      - one ``topk_complete`` row per query in ``exact``: did the approximate
        tier return exactly ``k`` neighbors for it,
      - one ``mean_recall_floor`` summary row (qid = -1): is the mean
        recall@k vs the exact baseline ≥ ``floor``.

    The oracle side asserts the *expected* outcome — ``ok = true`` for every
    row — so the driver's value-hash matches iff every invariant actually
    holds.  Recall itself can't be a per-query assertion: on unstructured
    (random) vectors single queries legitimately hit recall 0 (measured at
    every SF), so the per-query rows check shape and the floor is aggregate.
    Both inputs use the same (score desc, neighbor_id asc) tiebreak, making
    the intersection deterministic.  Cost: one equi-join on
    (query_id, neighbor_id) + one rollup aggregation — scale-safe.

    Single-pass plan discipline: ``approx`` and ``exact`` are each consumed
    exactly ONCE (their lineages are the expensive ANN/baseline jobs —
    referencing them from two plan branches would recompute them), the query
    list comes from the cheap ``queries`` input scan, and both output
    granularities (per-query + global) fall out of one ``rollup``
    aggregation instead of two branches over the joined set.
    """
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    per_q = (
        a.join(e, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    rows = (
        queries.select("query_id")
        .distinct()
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n"), F.lit(0)) == k).alias("ok_shape"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k))).alias("recall"),
        )
    )
    return rows.rollup("query_id").agg(
        F.min("ok_shape").alias("all_ok"), F.avg("recall").alias("mean_recall")
    ).select(
        F.coalesce(F.col("query_id"), F.lit(-1)).cast("long").alias("qid"),
        F.when(F.col("query_id").isNull(), F.lit("mean_recall_floor"))
        .otherwise(F.lit("topk_complete"))
        .alias("metric"),
        F.when(F.col("query_id").isNull(), F.col("mean_recall") >= floor)
        .otherwise(F.col("all_ok"))
        .alias("ok"),
    )


# ---------------------------------------------------------------------------
# reference related-articles semantics
# ---------------------------------------------------------------------------
def related_topk(
    queries: DataFrame,
    corpus: DataFrame,
    scores: DataFrame,
    *,
    k_candidates: int = 6,
    k_final: int = 5,
    sim_weight: float = 0.7,
    score_weight: float = 0.3,
    default_score: int = 5,
    tier: str = "exact",
    exact_max_pairs: int = 25_000_000,
    dims: int | None = None,
    bits: int | None = None,
    tables: int = 4,
    n_cells: int = 16,
    n_probe: int = 4,
    corpus_n: int | None = None,
    queries_n: int | None = None,
) -> DataFrame:
    """Two-tier similarity with fallback fill + weighted re-rank — the full
    reference pipeline (get_relevant_articles.py) as ONE set-oriented job:

    tier 0: same-topic top-``k_candidates`` (Qdrant filtered search, :62-88)
    tier 1: cross-topic candidates filling remaining slots, excluding tier-0
            hits and self (fallback search, :90-113)
    hydrate: join validation_score, deterministic default when missing
            (:119-127 — reference used random.randint(3,6); SURVEY §7.2)
    re-rank: 0.7·(sim·10) + 0.3·validation_score, top-``k_final`` (:129-139)

    Inputs: queries(query_id, topic, v), corpus(neighbor_id, topic, v),
    scores(neighbor_id, validation_score).  Output: (query_id, neighbor_id,
    rank, sim, combined_score).  The per-article N+1 lookup pattern of the
    reference becomes two joins + two windows.

    Candidate generation is pluggable (``tier``): ``"exact"`` scores every
    (query, corpus) pair — the correctness baseline; ``"lsh"`` / ``"ivf"``
    reuse :func:`lsh_candidate_ids` / :func:`ivf_candidate_ids` so the
    candidate set is bucket-bounded — the 100 TB path, identical
    downstream semantics applied to the candidate subset.  ``"auto"``
    picks exact below ``exact_max_pairs`` (|queries|·|corpus| — two cheap
    count jobs) and LSH above — the production default: small workloads
    get exact results, large ones get the scale-safe plan without a code
    change.  The gate is the PAIR PRODUCT, not corpus size alone (r14:
    jobs.relate_batch drains corpus-sized query batches, so a
    corpus-only bound kept the exact tier at q·n ≈ 5·10⁸ pairs in the
    ×32 weak-scaling cell — q128's one super-linear span; every
    gate-swept SF stays orders of magnitude below this bound, so gated
    values are unchanged).

    ``corpus_n`` / ``queries_n`` (VERDICT r14 #4): trusted
    exact-or-UPPER-BOUND row counts a caller already knows — each one
    provided replaces the corresponding eager ``count()`` probe job.
    The corpus count prunes to parquet metadata on raw scans, but the
    queries side is a DERIVED frame in every in-repo caller, so its
    count evaluates real lineage; ``jobs.relate_batch`` passes its
    ``batch_size`` limit as ``queries_n``.  An over-estimate can only
    shift the gate toward LSH — the scale-safe direction; pass exact
    counts where the exact/LSH boundary matters to results."""
    if tier == "auto":
        # corpus.count() prunes to a parquet-metadata rowcount on raw
        # scans; queries is a DERIVED frame in every in-repo caller
        # (relate_batch joins, q41 filters), so its count evaluates real
        # lineage — run it only when the corpus alone doesn't already
        # decide (|queries| >= 1 ⇒ corpus_n > bound is decisive), and
        # skip the whole probe when the caller forced a tier (review
        # r14).
        if corpus_n is None:
            corpus_n = corpus.count()
        if corpus_n > exact_max_pairs:
            # The corpus-only short-circuit assumes >=1 query makes the
            # pair product decisive.  With dims=None an LSH routing would
            # raise where exact would have returned empty, so for those
            # callers pay the queries count and send an EMPTY batch to
            # the exact tier (0 pairs <= bound — the stated pair-product
            # contract; ADVICE r14 #2).  dims-providing callers keep the
            # one-count fast path: LSH on an empty batch is a cheap
            # empty result, not an error.
            if dims is None and (
                queries_n == 0 or (queries_n is None and queries.count() == 0)
            ):
                tier = "exact"
            else:
                tier = "lsh"
        else:
            if queries_n is None:
                queries_n = queries.count()
            tier = "exact" if queries_n * corpus_n <= exact_max_pairs else "lsh"
        # auto-routed LSH scales its bucket count with the corpus unless
        # the caller pinned bits — constant occupancy, candidate pairs
        # linear in |Q| (see lsh_bits_for; engages only above
        # exact_max_pairs, so gated hashes are untouched by design)
        if tier == "lsh" and bits is None:
            bits = lsh_bits_for(corpus_n)
    if bits is None:
        bits = 8  # explicit-tier legacy default (q44's gated hash predates this)
    q = _with_norm(queries, "qn").alias("q")
    # same BNLJ-parallelism fix as topk_cosine: stream side must be spread
    c = _with_norm(spread(corpus), "cn").alias("c")
    if tier == "exact":
        pairs = q.join(c, F.col("q.query_id") != F.col("c.neighbor_id"))
    elif tier in ("lsh", "ivf"):
        if tier == "lsh":
            if dims is None:
                raise ValueError("tier='lsh' requires dims")
            cand = lsh_candidate_ids(queries, corpus, dims=dims, bits=bits, tables=tables)
        else:
            cand = ivf_candidate_ids(queries, corpus, n_cells=n_cells, n_probe=n_probe)
        pairs = (
            cand.withColumnRenamed("query_id", "cand_qid")
            .withColumnRenamed("neighbor_id", "cand_nid")
            .join(q, F.col("cand_qid") == F.col("q.query_id"))
            .join(c, F.col("cand_nid") == F.col("c.neighbor_id"))
        )
    else:
        raise ValueError(f"unknown tier {tier!r}")
    pairs = pairs.select(
        "q.query_id",
        F.col("q.topic").alias("q_topic"),
        "c.neighbor_id",
        F.col("c.topic").alias("c_topic"),
        _pair_cos().alias("cos"),
    )
    # Tier selection as ONE linear pass over the scored pairs.  The naive
    # form (filter→window for tier 0, then anti-join + count-join for the
    # tier-1 fill) consumes `pairs` from three plan branches, so the
    # quadratic scoring stage is recomputed per branch (the r02 q41 plan
    # showed 9 FileScans / 0 ReusedExchange).  Instead, every tier decision
    # is a window function over one shared spec — one shuffle + sort of the
    # scored pairs, scanned exactly once:
    #   run_same  running count of same-topic rows  == rank among tier-0
    #             eligibles (the reference's filtered-search rank, :62-88)
    #   cnt_same  partition total of same-topic rows → n_found = min(k, cnt)
    #   rest_rk   rn_all − running tier-0 count == rank among non-tier-0
    #             rows, i.e. the fallback-search rank (:90-113) without the
    #             anti-join
    w_ord = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    annotated = (
        # NULL-safe: a NULL topic on either side means NOT same-topic (the
        # branched form's filter dropped NULL-equality rows into tier 1; a
        # bare cast would make `same` NULL and poison the running sums,
        # silently dropping every candidate of a NULL-topic query)
        pairs.withColumn(
            "same",
            F.coalesce((F.col("q_topic") == F.col("c_topic")).cast("int"), F.lit(0)),
        )
        .withColumn("rn_all", F.row_number().over(w_ord))
        .withColumn("run_same", F.sum("same").over(w_run))
        .withColumn("cnt_same", F.sum("same").over(w_full))
        .withColumn("is_t0", (F.col("same") == 1) & (F.col("run_same") <= k_candidates))
    )
    # run_t0 reads is_t0 (itself a window result) — same spec, so Spark
    # appends a second Window over the already-shuffled/sorted partitions.
    n_found = F.least(F.lit(k_candidates), F.col("cnt_same"))
    candidates = (
        annotated.withColumn("run_t0", F.sum(F.col("is_t0").cast("int")).over(w_run))
        .withColumn("rest_rk", F.col("rn_all") - F.col("run_t0"))
        .filter(F.col("is_t0") | (F.col("rest_rk") <= F.lit(k_candidates) - n_found))
        .select(
            "query_id",
            "neighbor_id",
            "cos",
            F.when(F.col("is_t0"), F.lit(0)).otherwise(F.lit(1)).alias("tier"),
        )
    )
    # hydration + weighted score + final top-k
    # no forced broadcast (review r12): scores is corpus-sized here (one
    # row per scorable article), so the hint meant a full-corpus driver
    # broadcast at scale; AQE broadcasts small sides at runtime anyway,
    # and the candidate side must not be consumed twice for a semi-join
    # bound (its lineage is the expensive scored pairs)
    hydrated = candidates.join(scores, "neighbor_id", "left").withColumn(
        "vscore", F.coalesce(F.col("validation_score"), F.lit(default_score))
    )
    combined = F.lit(sim_weight) * (F.col("cos") * 10) + F.lit(score_weight) * F.col("vscore")
    w_final = Window.partitionBy("query_id").orderBy(F.desc("combined"), F.asc("neighbor_id"))
    return (
        hydrated.withColumn("combined", combined)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k_final)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            trunc4(F.col("cos")).alias("sim"),
            trunc4(F.col("combined")).alias("combined_score"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking
# ---------------------------------------------------------------------------
def mmr_rerank(cand: DataFrame, sims: DataFrame, *, k: int = 3) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    with λ = 1/2, the diversity pass AFTER candidate retrieval: greedily
    select ``k`` results, each maximizing relevance minus its worst
    redundancy against the already-selected set.

    ``cand``: (query_id, cid, rel_fp) — the retrieval shortlist, integer
    fixed-point relevance.  ``sims``: (query_id, cid_a, cid_b, sim_fp) —
    pairwise candidate similarities within each query's shortlist, BOTH
    directions.  Returns (query_id, sel_rank, cid, mmr_fp) where
    ``mmr_fp`` is rel − max-sim-to-selected (λ=1/2 up to the constant
    factor 2, which cannot change any argmax).

    All scores are integers and every argmax tie-breaks
    (score DESC, cid ASC) via min(struct(−score, cid)) — the greedy
    trajectory, not just the final set, is engine-exact.  The selection
    rounds run over the per-query shortlist (m·|queries| rows, m ~ 10):
    after the retrieval stage everything here is shortlist-sized, and the
    round count is the FIXED k — the plan composes lazily, no driver
    loop.

    ``sims`` may be SPARSE (a thresholded pair table): a missing
    (cid, sel_cid) row means "no measurable redundancy" and contributes
    penalty 0 — the redundancy probe is a LEFT join with a coalesced max,
    so a candidate fully dissimilar to everything selected (exactly the
    one MMR should promote) stays in contention instead of dropping out
    of the argmax."""

    def _argmax(df: DataFrame, score: str, rank: int) -> DataFrame:
        return (
            df.groupBy("query_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col(score)).alias("ns"), F.col("cid").alias("c")
                    )
                ).alias("b")
            )
            .select(
                "query_id",
                F.lit(rank).cast("int").alias("sel_rank"),
                F.col("b.c").alias("cid"),
                (-F.col("b.ns")).alias("mmr_fp"),
            )
        )

    picked = _argmax(cand.withColumn("score", F.col("rel_fp")), "score", 1)
    for r in range(2, k + 1):
        remaining = cand.join(
            picked.select("query_id", "cid"), ["query_id", "cid"], "left_anti"
        )
        pen = (
            remaining.join(
                picked.select("query_id", F.col("cid").alias("sel_cid")),
                "query_id",
            )
            .join(
                sims.select(
                    "query_id",
                    F.col("cid_a").alias("cid"),
                    F.col("cid_b").alias("sel_cid"),
                    "sim_fp",
                ),
                ["query_id", "cid", "sel_cid"],
                "left",
            )
            .groupBy("query_id", "cid", "rel_fp")
            .agg(F.coalesce(F.max("sim_fp"), F.lit(0)).alias("pen_fp"))
        )
        scored = pen.withColumn("score", F.col("rel_fp") - F.col("pen_fp"))
        picked = picked.unionByName(_argmax(scored, "score", r))
    return picked
