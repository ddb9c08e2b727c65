"""Product quantization (PQ) for approximate nearest neighbor — Jégou et
al. 2011, the codebook compression behind FAISS's IVF-PQ indexes.

Completes the engine's ANN ladder (operators/similarity.py): brute-force
(q40) → hyperplane LSH (q42) → IVF (q43) → int8 scalar quantization
(q45) → PQ (q118).  Where SQ compresses each coordinate independently
(8× smaller), PQ compresses SUBVECTORS against learned codebooks: with 4
subspaces × 8 centroids a 64-dim float vector becomes 4 small ints —
64× smaller resident data — and query-time distances collapse to
distance-TABLE lookups (asymmetric distance computation, ADC) instead of
64-dimension dot products.

Determinism — everything stays on the oracle surface:

- coordinates quantize to floor(x·2²⁰) (exact power-of-two multiply);
- each subspace codebook is the q96 integer Lloyd's loop verbatim
  (operators/curation.py:kmeans_refine discipline): k smallest ids seed,
  INTEGER squared-L2 argmin with ties to the smallest cell, centroid
  update by integer floor division;
- ADC distances are integer sums of integer subspace distances.

Scale shape: codebook training shuffles only (cell, dim) partial sums
per round (k·d groups, corpus-size-independent); encoding is map-only
against broadcast codebooks; ADC scoring joins the 4-int code table
against a broadcast |queries|·S·k distance table — the corpus's FULL
vectors never enter the query path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 2**20


def quantized(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, q): floor(x·2²⁰) integer coordinates."""
    return vectors.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(QSCALE))).cast("long"),
        ).alias("q"),
    )


def _sq_dist(a: str = "q", b: str = "cv") -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_fit_encode(
    vectors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    subspaces: int = 4,
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns (codes, codebooks): ``codes`` = (id, s, code) — ``subspaces``
    rows per vector; ``codebooks`` = (s, cell, cv).  The input dimension
    must divide evenly into ``subspaces``."""
    qv = quantized(vectors, id_col, vec_col)
    width = dim // subspaces
    assert width * subspaces == dim, "subspaces must divide the dimension"
    # ALL subspaces train in one fused (id, s, q) frame: each Lloyd round
    # is ONE broadcast assignment + ONE (s, cell, dim) partial-agg shuffle
    # however many subspaces there are — per-subspace loops would multiply
    # the stage count by S for identical results (subspaces are
    # independent, so the fused argmins/updates match the loop exactly,
    # which is why the per-subspace oracle still hashes this).
    subs = qv.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("s"),
                        F.slice("q", s * width + 1, width).alias("q"),
                    )
                    for s in range(subspaces)
                ]
            )
        ).alias("p"),
    ).select("id", "p.s", "p.q").persist()
    seed_ids = subs.select("id").distinct().orderBy("id").limit(k)
    cent = subs.join(F.broadcast(seed_ids), "id").select(
        "s", F.col("id").alias("cell"), F.col("q").alias("cv")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        return (
            subs.join(F.broadcast(centroids), "s")
            .select("id", "s", "q", _sq_dist().alias("sq_dist"), "cell")
            .groupBy("id", "s")
            .agg(
                F.min(F.struct("sq_dist", "cell")).alias("best"),
                F.first("q").alias("q"),
            )
            .select("id", "s", "q", F.col("best.cell").alias("cell"))
        )

    for _ in range(iters):
        assigned = assign(cent)
        sums = assigned.select(
            "s", "cell", F.posexplode("q").alias("dim", "val")
        ).groupBy("s", "cell", "dim").agg(
            F.sum("val").alias("sv"), F.count(F.lit(1)).alias("cnt")
        )
        cent = (
            sums.select("s", "cell", "dim", F.expr("sv div cnt").alias("cval"))
            .groupBy("s", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                    lambda st: st["cval"],
                ).alias("cv")
            )
        )
    cent = cent.persist()
    codes = assign(cent).select("id", "s", F.col("cell").alias("code"))
    return codes, cent.select("s", "cell", "cv")


def _query_distance_table(
    queries: DataFrame, codebooks: DataFrame, *, dim: int, subspaces: int
) -> DataFrame:
    """(query_id, s, code, d) — the ADC distance table, |queries|·S·k
    rows, broadcast-sized by construction.  ONE definition shared by the
    flat and IVF-pruned searchers: the gated n_probe=n_cells byte-
    identity between them (tests/test_similarity.py) rests on the table
    construction being THE SAME CODE, not a kept-in-sync copy (review
    r14)."""
    width = dim // subspaces
    sub_q = queries.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("s"),
                        F.slice("q", s * width + 1, width).alias("q"),
                    )
                    for s in range(subspaces)
                ]
            )
        ).alias("p"),
    ).select("query_id", "p.s", "p.q")
    return sub_q.join(codebooks, "s").select(
        "query_id", "s", F.col("cell").alias("code"), _sq_dist().alias("d")
    )


def _exact_rerank(
    shortlist: DataFrame, queries: DataFrame, corpus_q: DataFrame, k_final: int
) -> DataFrame:
    """Hydrate a thin (query_id, neighbor_id) shortlist with full-width
    quantized vectors (id equi-joins — only shortlist rows are touched)
    and re-rank by EXACT integer squared-L2, smallest-id ties.  Shared by
    pq_search and ivfpq_search for the same identity reason as
    :func:`_query_distance_table`."""
    from pyspark.sql import Window

    hydrated = (
        shortlist.join(
            corpus_q.select(F.col("id").alias("neighbor_id"), F.col("q").alias("cq")),
            "neighbor_id",
        )
        .join(queries, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("sq_dist"), F.asc("neighbor_id"))
    return (
        hydrated.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_final)
        .select("query_id", "neighbor_id", "rank", "sq_dist")
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    *,
    dim: int,
    subspaces: int = 4,
    k_final: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: exact (quantized) queries against
    PQ-encoded corpus.  ``queries`` = (query_id, q) full-width integer
    vectors.  Returns (query_id, neighbor_id, rank, adc_dist).

    The distance table (query_id, s, cell, d) has |queries|·S·k rows —
    broadcast-sized by construction — and the corpus contributes ONLY its
    (id, s, code) rows: at 100 TB the scored frame is 4 ints per corpus
    vector fanned against a broadcast, with the per-(query, id) sum a
    partial-aggregable integer."""
    dt = _query_distance_table(queries, codebooks, dim=dim, subspaces=subspaces)
    scored = (
        codes.join(F.broadcast(dt), ["s", "code"])
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_final)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivf_coarse_cells(corpus_q: DataFrame, *, n_cells: int = 16) -> DataFrame:
    """Deterministic coarse centroids over quantized vectors: the
    ``n_cells`` corpus vectors with lexicographically smallest
    ``md5(id)`` — the seeded-sample discipline of
    :func:`briefly_spark.operators.similarity.ivf_candidate_ids`, kept
    byte-reproducible so an IVF-PQ surface can sit under a SQL oracle.
    Returns (cell_id, cv) with full-width integer coordinates."""
    return (
        corpus_q.withColumn("ck", F.md5(F.col("id").cast("string")))
        .orderBy("ck")
        .limit(n_cells)
        .select(F.col("id").alias("cell_id"), F.col("q").alias("cv"))
    )


def ivfpq_search(
    queries: DataFrame,
    corpus_q: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    *,
    dim: int,
    subspaces: int,
    n_cells: int = 16,
    n_probe: int = 4,
    shortlist: int = 32,
    k_final: int = 5,
) -> DataFrame:
    """IVF-PQ: coarse inverted-file pruning in front of the ADC scorer —
    the composition FAISS ships as its at-scale default and the fix for
    flat PQ's one super-linear term (X150; r14 ×32 weak-scaling sweep:
    :func:`pq_search` scores every (query, corpus-code) pair, so a probe
    panel that grows WITH the corpus makes ADC work q·n ~ K², measured
    exp 1.35 at documents ×32).  Here each corpus vector is assigned to
    its nearest coarse cell (one broadcast join against ``n_cells``
    rows, integer L2, ties to the smallest cell id), each query probes
    its ``n_probe`` nearest cells, and ADC scoring runs ONLY inside
    probed cells: per-query candidates shrink by ~n_probe/n_cells, and
    growing n_cells with the corpus (the FAISS sqrt(n) rule) keeps
    per-query ADC work ~ n_probe·n/n_cells — sub-linear in K when the
    panel is fixed, linear when it grows with the corpus.  The shortlist
    is exact-re-ranked like :func:`pq_search` (same shared helper), so
    output contract and determinism discipline (integer distances,
    smallest-id ties) are identical; recall vs flat PQ is
    n_probe-controlled and pinned in tests/test_similarity.py.

    Scale shape: corpus coarse assignment is one broadcast fan-out with a
    MAP-SIDE-COMBINABLE min-struct aggregation (~|corpus| combined rows —
    not a window sort over |corpus|·n_cells, which is n^1.5 under the
    sqrt(n)-cells rule; review r14); the query side keeps a per-query
    window because it needs the n_probe-head, and queries are the small
    side.  Candidates are a thin (query_id, neighbor_id) cell equi-join;
    the ADC join keys the broadcast distance table on (query_id, s,
    code) so only candidate pairs are ever scored."""
    from pyspark.sql import Window

    cells = ivf_coarse_cells(corpus_q, n_cells=n_cells)
    # corpus → nearest cell: the pq_fit_encode.assign idiom (min over a
    # (dist, cell) struct — integer dist, smallest-cell ties), reduced
    # map-side instead of sorted per partition
    corpus_cells = (
        corpus_q.join(F.broadcast(cells), how="cross")
        .select("id", F.struct(_sq_dist("q", "cv").alias("cd"), "cell_id").alias("dc"))
        .groupBy("id")
        .agg(F.min("dc").alias("best"))
        .select("id", F.col("best.cell_id").alias("cell_id"))
    )
    # queries → n_probe nearest cells: per-query head, queries are small
    wq = Window.partitionBy("query_id").orderBy(F.asc("cd"), F.asc("cell_id"))
    query_cells = (
        queries.join(F.broadcast(cells), how="cross")
        .select("query_id", "cell_id", _sq_dist("q", "cv").alias("cd"))
        .withColumn("crk", F.row_number().over(wq))
        .filter(F.col("crk") <= n_probe)
        .select("query_id", "cell_id")
    )
    cand = (
        query_cells.join(corpus_cells, "cell_id")
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    dt = _query_distance_table(queries, codebooks, dim=dim, subspaces=subspaces)
    scored = (
        cand.join(codes.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(dt), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, queries, corpus_q, k_final)


def pq_search(
    queries: DataFrame,
    corpus_q: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    *,
    dim: int,
    subspaces: int,
    shortlist: int = 32,
    k_final: int = 5,
) -> DataFrame:
    """Full PQ search: ADC shortlist, then EXACT integer re-rank — the
    production IVF-PQ usage (coarse codes prune, full precision decides).
    ``corpus_q`` = (id, q) quantized full-width corpus for the re-rank
    hydration (an id equi-join against the shortlist — only shortlist
    vectors are ever touched).  Returns (query_id, neighbor_id, rank,
    sq_dist) with the exact quantized distance."""
    cand = pq_adc_topk(
        queries, codes, codebooks, dim=dim, subspaces=subspaces, k_final=shortlist
    ).select("query_id", "neighbor_id")
    return _exact_rerank(cand, queries, corpus_q, k_final)
