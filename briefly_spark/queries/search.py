"""Lexical-retrieval pack — TF-IDF term weighting and BM25 ranked search
over the ``documents`` table (operators/search.py).

Covers the retrieval shapes the reference reaches for implicitly (fallback
related-content fill, fact-check search sub-queries —
get_relevant_articles.py:101-139, summarize_validate.py) as first-class
set-oriented operators: corpus-wide inverted index, no per-query loops.

Oracle determinism: every ln-derived score is fixed-pointed per term
BEFORE aggregation (ln differs from DuckDB by 1 ulp on ~3% of inputs —
measured; integer sums are order- and engine-independent), and emitted
values are integers or exact rescalings.  See operators/search.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread, table_rows
from briefly_spark.numerics import det_ln_items
from briefly_spark.operators.search import (
    bm25_score_items,
    bm25_topk,
    term_postings,
    tfidf_score_items,
    tfidf_topterms,
)
from briefly_spark.queries import register

_TOKS_SQL = """
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS term
  FROM documents
),
postings AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')))
              AS DOUBLE) / count(*) AS avgdl
  FROM documents
)
"""


# --------------------------------------------------------------------------
# q46 — TF-IDF top terms per document.
# --------------------------------------------------------------------------
@register(
    "q46_tfidf_topterms",
    covers=("A3", "W4"),
    oracle=f"""
WITH {_TOKS_SQL},
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         {', '.join(tfidf_score_items('p.tf', 's.n_docs', 'd.df', 'duckdb'))}
  FROM postings p JOIN dfreq d USING (term), stats s
)
SELECT doc_id, term, tf, df, rank, score_fp / 10000.0 AS tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rank
      FROM scored)
WHERE rank <= 5
""",
)
def q46_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the standard document-keyword
    profile (topic tagging, dedup-cluster naming, quality probes).  Plan:
    ONE postings shuffle, df and the N/avgdl stats row broadcast back onto
    it, per-doc ranking window.  The per-term score is fixed-pointed so
    the emitted value is exact in both engines."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return tfidf_topterms(docs, "doc_id", "text", k=5)


# --------------------------------------------------------------------------
# q47 — BM25 more-like-this retrieval from seed documents.
# --------------------------------------------------------------------------
@register(
    "q47_bm25_search",
    covers=("J4", "W1"),
    oracle=f"""
WITH {_TOKS_SQL},
qterms AS (
  SELECT qid, term FROM (
    SELECT doc_id AS qid, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk
    FROM postings WHERE doc_id % 100 = 0
  ) WHERE rk <= 3
),
scored AS (
  SELECT q.qid, p.doc_id,
         {', '.join(bm25_score_items('p.tf', 'd.df', 'l.dl', 's.n_docs', 's.avgdl', 'duckdb'))}
  FROM qterms q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
  WHERE q.qid <> p.doc_id
),
agg AS (
  SELECT qid, doc_id, sum(score_fp) AS sum_fp, count(*) AS n_terms_matched
  FROM scored GROUP BY qid, doc_id
)
SELECT qid, doc_id, rank, n_terms_matched, sum_fp / 10000.0 AS bm25
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sum_fp DESC, doc_id) AS rank
      FROM agg)
WHERE rank <= 5
""",
)
def q47_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 more-like-this: every doc_id % 100 == 0 seeds a query from its
    own top-3 tf terms; retrieval is the inverted-index equi-join on term
    (cost O(matching postings), never O(|Q|·|docs|)), per-(query, doc)
    integer score sum, top-5 per query.  k1 = 1.2, b = 0.75.  The lexical
    twin of q41's related-articles — the fallback path when no embedding
    exists yet."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    postings = term_postings(docs, "doc_id", "text")
    from pyspark.sql import Window

    rk = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    qterms = (
        postings.filter(F.col("doc_id") % 100 == 0)
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select(F.col("doc_id").alias("qid"), "term")
    )
    return bm25_topk(docs, qterms, "doc_id", "text", k=5)


# --------------------------------------------------------------------------
# q48 — bigram-LM perplexity scoring (CCNet-style quality signal).
# --------------------------------------------------------------------------
_LM_CTES = f"""toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents
),
big AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
  FROM toks, unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                    i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS t(u)
),
grouped AS (SELECT doc_id, w1, w2, count(*) AS n FROM big GROUP BY doc_id, w1, w2),
c12 AS (SELECT *, sum(n) OVER (PARTITION BY w1, w2) AS c12 FROM grouped),
uni AS (
  SELECT term, count(*) AS c1, (SELECT count(DISTINCT term) FROM (
           SELECT unnest(w) AS term FROM toks)) AS vocab
  FROM (SELECT unnest(w) AS term FROM toks) GROUP BY term
),
scored AS (
  -- CAST to BIGINT: DuckDB floor() keeps DOUBLE, and // on DOUBLE is
  -- plain division — integer types are required for true int division.
  -- The log is numerics.det_ln_items (bit-reproducible, staged),
  -- mirroring the Spark plan's expression op-for-op.
  SELECT g.doc_id, g.n,
         {', '.join(det_ln_items('u.c1 + u.vocab', '__ln_a', 'duckdb'))},
         {', '.join(det_ln_items('g.c12 + 1', '__ln_b', 'duckdb'))},
         CAST(floor(((__ln_a - __ln_b) * 10000.0)) AS BIGINT) AS nll_fp
  FROM c12 g JOIN uni u ON u.term = g.w1
)"""


@register(
    "q48_lm_perplexity",
    covers=("A3", "A4"),
    oracle=f"""
WITH {_LM_CTES}
SELECT doc_id,
       -- CAST: sum(BIGINT) widens to HUGEINT in DuckDB, which fetches as
       -- Decimal/float64 through Arrow/pandas and breaks the value-hash
       -- against Spark's long (the r04/r05 q48 red — NOT ln determinism).
       CAST(sum(n) AS BIGINT) AS n_bigrams,
       (CAST(sum(n * nll_fp) AS BIGINT) // CAST(sum(n) AS BIGINT)) / 10000.0 AS avg_nll
FROM scored GROUP BY doc_id
""",
)
def q48_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: add-one-smoothed bigram model
    trained on the corpus, every document scored by average bigram
    negative log-likelihood (perplexity = e^avg_nll) — the distributional
    quality signal next to the rule-based rubrics (q52/q55): boilerplate,
    gibberish and off-language docs sit far from the corpus model.  Two
    scans, one broadcast of the vocab-sized unigram table, integer-exact
    aggregation (operators/lm.py)."""
    from briefly_spark.operators.lm import lm_doc_scores

    docs = spread(load_table(spark, sf_dir, "documents"))
    return lm_doc_scores(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# q48a — driver-gate diagnostic for the r04/r05 q48 hash red (VERDICT.md
# r05 next-round #1).  The r05 evidence: the 7 hash-reds were EXACTLY the 7
# registry oracles whose output surface carried a DuckDB HUGEINT column
# (sum(BIGINT) widens; HUGEINT fetches as Decimal via Arrow and float64 via
# pandas, so any driver-side fetch that is not the native fetchall()
# renders e.g. 123 as Decimal('123')/123.0 and the value-hash diverges from
# Spark's long) — and NO green oracle carried one.  The r06 gate confirmed
# it: q48 (CAST-fixed) GREEN, q48a (int-only surface) GREEN, and the
# deliberately-unfixed control q48c_lm_hugeint_control RED — exactly the
# predicted {G, G, R} pattern (CORRECTNESS_r06.json).  The control was
# retired after serving its purpose; its oracle survives below as
# HUGEINT_CONTROL_ORACLE so the local Arrow-fetch reproduction test
# (tests/test_queries_oracle.py) keeps pinning the mechanism without a
# permanently-red registry entry.
#
# RETIRED (r12, per the registry capacity policy in queries/__init__.py and
# VERDICT r11 next-round #3): q48a_lm_nll_int_surface — the green half of
# the same r05/r06 mechanism experiment (last green row: CORRECTNESS_r11).
# The mechanism it proved (hashed surfaces must be engine-primitive) is now
# enforced by check_oracle's output-surface type audit on EVERY query, so a
# standing green control re-gates nothing; its operator (lm_doc_nll_sums)
# stays covered by q48's gated NLL surface and the suite.  The function
# survives unregistered below for the type-audit reproduction tests.
# --------------------------------------------------------------------------
def q48a_lm_nll_int_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48 with an all-BIGINT hashed surface: the undivided fixed-point nll
    mass per document (avg_nll = (nll_sum_fp div n_bigrams)/10⁴).  Retired
    registry diagnostic — see the block comment above."""
    from briefly_spark.operators.lm import lm_doc_nll_sums

    docs = spread(load_table(spark, sf_dir, "documents"))
    return lm_doc_nll_sums(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# q121 — per-document token surprisal under the corpus unigram LM.
# --------------------------------------------------------------------------
def _surprisal_items(dialect: str) -> list[str]:
    """Staged per-term surprisal as lateral-alias SELECT items ending in
    ``… AS s_fp``: floor((det_ln(N) − det_ln(c_w))·10⁴) as BIGINT.  One
    generator for BOTH dialects so the rounding-sequence spelling cannot
    drift between the Spark plan and the DuckDB oracle."""
    return [
        *det_ln_items("n_total", "__ln_t", dialect),
        *det_ln_items("c", "__ln_c", dialect),
        "CAST(floor(((__ln_t - __ln_c) * 10000.0)) AS BIGINT) AS s_fp",
    ]


@register(
    "q121_token_surprisal",
    covers=("A3", "A4"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS term
  FROM documents
),
dt AS (SELECT doc_id, term, count(*) AS n FROM toks GROUP BY doc_id, term),
cw AS (SELECT term, CAST(sum(n) AS BIGINT) AS c FROM dt GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cw),
scored AS (
  SELECT dt.doc_id, dt.n, {', '.join(_surprisal_items('duckdb'))}
  FROM dt JOIN cw USING (term) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
       CAST(sum(n * s_fp) AS BIGINT) AS surp_sum_fp
FROM scored GROUP BY doc_id
""",
)
def q121_token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-surprisal quality signal under the corpus UNIGRAM model — the
    rare-token-density complement to q48's bigram perplexity (CCNet keeps
    both: bigram NLL catches broken word ORDER, unigram surprisal catches
    vocabulary outliers — gibberish, code, off-language fragments — even
    when locally fluent).  s(w) = ln N − ln c_w, fixed-pointed per term
    BEFORE the per-doc weighted sum; the surface is the undivided
    integers (n_toks, surp_sum_fp — mean = (surp_sum_fp div n_toks)/10⁴),
    following the engine-primitive convention.

    Plan: ONE (doc, term) postings shuffle; corpus term counts
    partial-agg off that frame (vocab-sized) and broadcast back with the
    1-row total; the scoring join + per-doc agg never rescan the corpus.
    Every log is the staged bit-reproducible det_ln."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    from briefly_spark.operators.search import term_postings

    dt = term_postings(docs, "doc_id", "text").withColumnRenamed("tf", "n")
    cw = dt.groupBy("term").agg(F.sum("n").cast("long").alias("c"))
    tot = cw.agg(F.sum("c").cast("long").alias("n_total"))
    scored = (
        dt.join(F.broadcast(cw), "term")
        .crossJoin(F.broadcast(tot))
        .selectExpr("doc_id", "n", *_surprisal_items("spark"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_toks"),
        F.sum(F.col("n") * F.col("s_fp")).cast("long").alias("surp_sum_fp"),
    )


#: The retired q48c control's oracle, byte-identical to the r05 q48 oracle
#: (n_bigrams is a raw DuckDB HUGEINT).  Proven RED at the driver in
#: CORRECTNESS_r06 while q48/q48a were green; kept (unregistered) so the
#: local Arrow-fetch reproduction test can keep pinning the mechanism.
#: The matching Spark side is q48's own plan (lm_doc_scores).
HUGEINT_CONTROL_ORACLE = f"""
WITH {_LM_CTES}
SELECT doc_id, sum(n) AS n_bigrams,
       (sum(n * nll_fp) // sum(n)) / 10000.0 AS avg_nll
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q129 — hybrid retrieval: BM25 ∪ dense cosine, reciprocal-rank fusion.
# --------------------------------------------------------------------------
_RRF_K = 60           # the standard RRF damping constant (Cormack et al.)
_RRF_SCALE = 1_000_000  # integer fixed point: each vote = SCALE // (K + rank)
_HYB_BRANCH_K = 10    # per-branch candidate depth before fusion
_HYB_K = 5            # fused top-k
#: pair-product bound for the dense branch's exact tier (the
#: relate/auto-tier discipline, VERDICT r14): exact cosine scores
#: |Q|·|corpus| pairs with BOTH sides growing with the corpus (queries
#: are vec_id % 100) — a K² term.  The r15 ×32 gate rung read q129 at
#: overall exp 0.95 with the cosine branch's coefficient still small;
#: above this bound the branch routes to LSH candidates + exact re-rank
#: instead.  Every gate-swept SF stays far inside the bound (sf0.1:
#: 21·2000 = 42k pairs), so gated values are unchanged.
_HYB_EXACT_MAX_PAIRS = 25_000_000


def _q129_oracle() -> str:
    from briefly_spark.queries.similarity import _cos_sql

    return f"""WITH {_TOKS_SQL},
qterms AS (
  SELECT qid, term FROM (
    SELECT doc_id AS qid, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk
    FROM postings WHERE doc_id % 100 = 0
  ) WHERE rk <= 3
),
bscored AS (
  SELECT q.qid, p.doc_id,
         {', '.join(bm25_score_items('p.tf', 'd.df', 'l.dl', 's.n_docs', 's.avgdl', 'duckdb'))}
  FROM qterms q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
  WHERE q.qid <> p.doc_id
),
bagg AS (
  SELECT qid, doc_id, sum(score_fp) AS sum_fp FROM bscored GROUP BY qid, doc_id
),
lex AS (
  SELECT qid, doc_id AS id, brank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sum_fp DESC, doc_id) AS brank
    FROM bagg
  ) WHERE brank <= {_HYB_BRANCH_K}
),
emb AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
vq AS (SELECT * FROM emb WHERE id % 100 = 0),
vpairs AS (
  SELECT vq.id AS qid, c.id, {_cos_sql('vq.v', 'c.v')} AS cos
  FROM vq JOIN emb c ON vq.id <> c.id
),
vec AS (
  SELECT qid, id, brank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS brank
    FROM vpairs
  ) WHERE brank <= {_HYB_BRANCH_K}
),
fused AS (
  SELECT qid, id,
         CAST(sum({_RRF_SCALE} // ({_RRF_K} + brank)) AS BIGINT) AS fused_fp,
         CAST(count(*) AS BIGINT) AS n_branches
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
  GROUP BY qid, id
)
SELECT qid, id, rank, fused_fp, n_branches
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY fused_fp DESC, id) AS rank
      FROM fused)
WHERE rank <= {_HYB_K}"""


@register("q129_hybrid_rrf", covers=("J4", "U2", "W1", "W5"), oracle=_q129_oracle())
def q129_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the RAG-stack standard the lexical (q47) and
    dense (q40) rungs exist to feed: each seed query (doc_id % 100 == 0,
    its own top-3 tf terms; embeddings keyed by the same id space per the
    testdata convention q41 uses) retrieves top-10 candidates from BOTH
    the BM25 inverted index and exact cosine over the embedding corpus,
    and the two lists merge by reciprocal-rank fusion
    (Cormack/Clarke/Buettcher 2009): score = Σ_branches SCALE//(60+rank),
    an INTEGER vote so the fused surface is engine-exact; fused top-5 per
    query, ties to the lower id.

    Scale: the branches are q47's postings equi-join and q40's
    broadcast-queries/streamed-corpus scoring — both bounded by their own
    plans; fusion itself touches only |Q|·20 candidate rows (a
    union + one partial-agg + a per-query window over ≤20 rows/query) —
    at 100 TB the corpus cost lives entirely in the branch indexes, and
    swapping the exact cosine branch for the LSH/IVF/PQ rungs
    (q42/q43/q118) changes nothing downstream of the rank columns.

    r15: that swap is now the AUTOMATIC scale path — the dense branch
    gates on the |Q|·|corpus| pair product (zero-job parquet-footer
    counts via catalog.table_rows) and routes to lsh_topk above
    ``_HYB_EXACT_MAX_PAIRS``; the BM25 branch needs no gate (postings
    equi-join, per-term df constant under a growing corpus of new
    terms)."""
    from pyspark.sql import Window

    from briefly_spark.operators.search import bm25_topk, term_postings
    from briefly_spark.operators.similarity import lsh_bits_for, lsh_topk, topk_cosine

    docs = spread(load_table(spark, sf_dir, "documents"))
    postings = term_postings(docs, "doc_id", "text")
    rk = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    qterms = (
        postings.filter(F.col("doc_id") % 100 == 0)
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select(F.col("doc_id").alias("qid"), "term")
    )
    lex = bm25_topk(docs, qterms, "doc_id", "text", k=_HYB_BRANCH_K).select(
        "qid", F.col("doc_id").alias("id"), F.col("rank").alias("brank")
    )
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    vq = emb.filter(F.col("id") % 100 == 0).select(F.col("id").alias("query_id"), "v")
    corpus = emb.select(F.col("id").alias("neighbor_id"), "v")
    n_emb = table_rows(sf_dir, "embeddings")
    if (n_emb // 100 + 1) * n_emb <= _HYB_EXACT_MAX_PAIRS:
        vec = topk_cosine(vq, corpus, k=_HYB_BRANCH_K)
    else:
        # adaptive bits: fixed-bit LSH keeps a constant bucket count, so
        # occupancy (⇒ candidate pairs) grows q·n/2^bits ~ K² — the r15
        # ×32 gate rung measured this branch at exp ~1 on the 8→32 span.
        # bits ~ log2(n/64) holds occupancy constant: pairs ~ |Q|·64·L.
        vec = lsh_topk(vq, corpus, dims=64, k=_HYB_BRANCH_K, bits=lsh_bits_for(n_emb))
    vec = vec.select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("id"),
        F.col("rank").alias("brank"),
    )
    fused = (
        lex.unionByName(vec)
        .groupBy("qid", "id")
        .agg(
            F.sum(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + brank)"))
            .cast("long")
            .alias("fused_fp"),
            F.count(F.lit(1)).cast("long").alias("n_branches"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("fused_fp"), F.asc("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HYB_K)
        .select("qid", "id", "rank", "fused_fp", "n_branches")
    )


# --------------------------------------------------------------------------
# q140 — CCNet head/middle/tail perplexity buckets (per-language terciles).
# --------------------------------------------------------------------------
@register(
    "q140_ccnet_ppl_buckets",
    covers=("A3", "A4", "P7"),
    oracle=f"""
WITH {_LM_CTES},
nll AS (
  SELECT doc_id,
         (CAST(sum(n * nll_fp) AS BIGINT) // CAST(sum(n) AS BIGINT)) AS avg_fp
  FROM scored GROUP BY doc_id
),
sc AS (
  SELECT n.doc_id, d.lang, n.avg_fp
  FROM nll n JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)
),
h AS (SELECT lang, avg_fp AS v, count(*) AS c FROM sc GROUP BY 1, 2),
tots AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM h GROUP BY lang),
r AS (
  SELECT h.lang, h.v,
         sum(h.c) OVER (PARTITION BY h.lang ORDER BY h.v) AS run, t.tot
  FROM h JOIN tots t USING (lang)
),
cuts AS (
  SELECT lang,
         min(CASE WHEN run * 3 >= tot THEN v END) AS c1,
         min(CASE WHEN run * 3 >= 2 * tot THEN v END) AS c2
  FROM r GROUP BY lang
)
SELECT sc.doc_id, sc.lang, CAST(sc.avg_fp AS BIGINT) AS avg_nll_fp,
       CASE WHEN sc.avg_fp <= cu.c1 THEN 'head'
            WHEN sc.avg_fp <= cu.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sc JOIN cuts cu USING (lang)
""",
)
def q140_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's defining partition (Wenzek et al. 2020 §4.4): within each
    language, split the corpus into head / middle / tail TERCILES of the
    bigram-LM perplexity score (q48's avg NLL) — 'head' is the third
    closest to the corpus model, the slice CCNet-style pipelines keep or
    upsample.  Cuts are DISCRETE per-language percentiles computed on the
    value histogram (q101's winsorize pattern): cut_k = min score v such
    that 3·cumcount(≤v) ≥ k·total — integer-exact, no quantile
    interpolation, no per-doc sort, so the whole assignment hash-matches
    any engine.

    Scale: the LM score is q48's two-scan plan; bucketing adds one keyed
    join to attach lang, one groupBy(lang, avg_fp) histogram, a
    cumulative window over the HISTOGRAM (per-lang partitions whose size
    is bounded by the fixed-point score RANGE — avg_fp ∈ [0, ~2·10⁵] by
    construction (ln(N+V)·10⁴), corpus-size-independent), and a 5-row
    broadcast of the cuts back onto the scored frame.  No corpus-sized
    sort anywhere.  The (doc_id, lang, avg_fp) frame feeds BOTH the cuts
    branch and the returned projection; Spark has no cross-branch CSE, so
    the LM lineage plans twice — measured at sf0.1 a persist() is a wash
    against the recompute (4.6 s vs 4.7 s cold: the LM is two cheap
    scans), so the plan stays cache-free here.  At 100 TB, persist the
    ~16 B/doc projection before bucketing (the q125 cache contract) and
    the LM runs once."""
    from pyspark.sql import Window

    from briefly_spark.operators.lm import lm_doc_nll_sums

    docs = spread(load_table(spark, sf_dir, "documents"))
    avg = lm_doc_nll_sums(docs, "doc_id", "text").select(
        "doc_id", F.expr("nll_sum_fp div n_bigrams").alias("avg_fp")
    )
    sc = avg.join(docs.select("doc_id", "lang"), "doc_id")
    h = sc.groupBy("lang", F.col("avg_fp").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tots = h.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    cum = Window.partitionBy("lang").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = h.join(F.broadcast(tots), "lang").withColumn("run", F.sum("c").over(cum))
    cuts = r.groupBy("lang").agg(
        F.min(F.when(F.col("run") * 3 >= F.col("tot"), F.col("v"))).alias("c1"),
        F.min(F.when(F.col("run") * 3 >= 2 * F.col("tot"), F.col("v"))).alias("c2"),
    )
    return sc.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        F.col("avg_fp").cast("long").alias("avg_nll_fp"),
        F.when(F.col("avg_fp") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_fp") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# --------------------------------------------------------------------------
# q142 — positional phrase search over the inverted index.
# --------------------------------------------------------------------------
@register(
    "q142_phrase_search",
    covers=("J4", "W1"),
    oracle="""
WITH wlists AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents
),
ptoks AS (
  SELECT doc_id, u.term AS term, u.pos AS pos
  FROM wlists, unnest(list_transform(range(1, len(w) + 1),
                      i -> struct_pack(term := w[i], pos := i))) AS t(u)
),
qphr AS (
  SELECT doc_id AS qid, w[1] AS w1, w[2] AS w2
  FROM wlists WHERE doc_id % 97 = 0 AND len(w) >= 2
),
hits AS (
  SELECT q.qid, a.doc_id, count(*) AS n_hits
  FROM qphr q
  JOIN ptoks a ON a.term = q.w1
  JOIN ptoks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = q.w2
  GROUP BY q.qid, a.doc_id
),
rk AS (
  SELECT qid, doc_id, CAST(n_hits AS BIGINT) AS n_hits,
         CAST(row_number() OVER (PARTITION BY qid
                                 ORDER BY n_hits DESC, doc_id) AS BIGINT) AS rank
  FROM hits
)
SELECT qid, doc_id, n_hits, rank FROM rk WHERE rank <= 5
""",
)
def q142_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval — the positional-index capability BM25 bags
    of words (q47) cannot express: each seed query (doc_id % 97 == 0, its
    own leading bigram as the phrase) finds every document where the two
    words occur ADJACENT in order, ranked by occurrence count, top-5 per
    query (ties to the lower doc_id).  The standard two-term
    positional-intersection plan (Manning/Raghavan/Schütze IR §2.4).

    Scale: one posexplode builds the positional postings; the phrase
    table is query-sized (broadcast), so leg A is an index lookup
    bounded by the postings of the phrase's FIRST word; the adjacency
    check is an equi-join on (doc, pos+1, term) — AQE-skew-splittable,
    never an inequality scan — and the final window sees only the
    matched doc counts per query."""
    from briefly_spark.operators.search import phrase_topk, tokens_of

    docs = spread(load_table(spark, sf_dir, "documents"))
    qphr = (
        docs.select("doc_id", tokens_of(F.col("text")).alias("w"))
        .filter((F.col("doc_id") % 97 == 0) & (F.size("w") >= 2))
        .select(
            F.col("doc_id").alias("qid"),
            F.element_at("w", 1).alias("w1"),
            F.element_at("w", 2).alias("w2"),
        )
    )
    return phrase_topk(docs, qphr, "doc_id", "text", k=5)


# --------------------------------------------------------------------------
# q143 — intra-document token-distribution entropy (repetition detector).
# --------------------------------------------------------------------------
def _entropy_items(dialect: str) -> list[str]:
    """Staged per-term self-information under the DOCUMENT's own unigram
    distribution, as lateral-alias items ending in ``… AS e_fp``:
    floor((det_ln(dl) − det_ln(n))·10⁴) — p = n/dl, −ln p = ln dl − ln n.
    One generator for both dialects (the q121 discipline)."""
    return [
        *det_ln_items("dl", "__ln_dl", dialect),
        *det_ln_items("n", "__ln_n", dialect),
        "CAST(floor(((__ln_dl - __ln_n) * 10000.0)) AS BIGINT) AS e_fp",
    ]


@register(
    "q143_doc_entropy",
    covers=("A3", "A4"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS term
  FROM documents
),
dt AS (SELECT doc_id, term, count(*) AS n FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS dl,
              CAST(count(*) AS BIGINT) AS n_types
       FROM dt GROUP BY doc_id),
scored AS (
  SELECT dt.doc_id, dt.n, l.dl, l.n_types, {', '.join(_entropy_items('duckdb'))}
  FROM dt JOIN dl l USING (doc_id)
)
SELECT doc_id, max(dl) AS n_toks, max(n_types) AS n_types,
       CAST(sum(n * e_fp) AS BIGINT) AS ent_sum_fp
FROM scored GROUP BY doc_id
""",
)
def q143_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document unigram entropy — the third leg of the LM-signal
    family: q48 scores word ORDER against the corpus model, q121 scores
    vocabulary RARITY against the corpus, this scores the document's OWN
    token distribution: H = Σ_w (n_w/dl)·(ln dl − ln n_w).  Low mean
    entropy = repetitive/boilerplate text (a handful of tokens dominate —
    the distributional generalization of Gopher's repeated-line rules,
    q55), maximal entropy = all-unique tokens.  Emitted as the undivided
    integers (n_toks, n_types, ent_sum_fp; mean-per-token =
    (ent_sum_fp div n_toks)/10⁴), the engine-primitive convention; every
    log is the staged det_ln, fixed-pointed per TERM before the sum.

    Plan: ONE (doc, term) postings shuffle; doc length and type count
    partial-agg off that frame and rejoin co-keyed on doc_id (no second
    corpus scan, no broadcast needed — both sides share the doc_id
    shuffle); per-doc weighted sum.  Map-only after the postings
    aggregate — corpus-size-independent state everywhere."""
    from briefly_spark.operators.search import term_postings

    docs = spread(load_table(spark, sf_dir, "documents"))
    dt = term_postings(docs, "doc_id", "text").withColumnRenamed("tf", "n")
    dl = dt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("dl"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    scored = dt.join(dl, "doc_id").selectExpr(
        "doc_id", "n", "dl", "n_types", *_entropy_items("spark")
    )
    return scored.groupBy("doc_id").agg(
        F.max("dl").alias("n_toks"),
        F.max("n_types").alias("n_types"),
        F.sum(F.col("n") * F.col("e_fp")).cast("long").alias("ent_sum_fp"),
    )


# --------------------------------------------------------------------------
# q145 — held-out LM perplexity: train on the hash-split train slice,
# score the val slice (the real CCNet configuration; q48 is leave-in).
# --------------------------------------------------------------------------
def _q145_oracle() -> str:
    from briefly_spark.queries.textstats import _sql_hash16

    split = f"{_sql_hash16('CAST(doc_id AS VARCHAR)')} % 100"
    return f"""
WITH tdocs AS (SELECT doc_id, text FROM documents WHERE {split} >= 10),
edocs AS (SELECT doc_id, text FROM documents WHERE {split} < 5),
twl AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM tdocs
),
tbig AS (
  SELECT u.w1 AS w1, u.w2 AS w2
  FROM twl, unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                   i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS t(u)
),
tglob AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tbig GROUP BY 1, 2),
tuni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(w) AS term FROM twl) GROUP BY term
),
tv AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM tuni),
ewl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM edocs
),
ebig AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
  FROM ewl, unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                   i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS t(u)
),
egrp AS (SELECT doc_id, w1, w2, count(*) AS n FROM ebig GROUP BY 1, 2, 3),
scored AS (
  SELECT e.doc_id, e.n,
         {', '.join(det_ln_items('coalesce(u.c1, 0) + v.vocab', '__ln_a', 'duckdb'))},
         {', '.join(det_ln_items('coalesce(g.c12, 0) + 1', '__ln_b', 'duckdb'))},
         CAST(floor(((__ln_a - __ln_b) * 10000.0)) AS BIGINT) AS nll_fp
  FROM egrp e
  LEFT JOIN tglob g ON g.w1 = e.w1 AND g.w2 = e.w2
  LEFT JOIN tuni u ON u.term = e.w1
  CROSS JOIN tv v
)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
       CAST(sum(n * nll_fp) AS BIGINT) AS nll_sum_fp
FROM scored GROUP BY doc_id
"""


@register("q145_lm_holdout_ppl", covers=("A3", "A4", "P7"), oracle=_q145_oracle())
def q145_lm_holdout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity — the evaluation configuration q48's leave-in
    self-scoring can't provide: the add-one bigram LM trains on the
    deterministic hash-split TRAIN slice (q57's buckets ≥ 10) and scores
    the disjoint VAL slice (< 5).  Unseen heads/bigrams score through
    coalesce(0) under the same smoothing (a fully-novel head costs ln V),
    so out-of-domain text scores high instead of vanishing — this is the
    CCNet deployment shape: reference model from a target corpus, scores
    for a disjoint slice, and the number that detects train/val drift.

    Scale (operators/lm.py:lm_holdout_nll_sums): bigram + unigram
    partial-agg shuffles bounded by each slice's token mass; the model
    returns as one AQE-splittable (w1, w2) equi-join + a vocab broadcast;
    integer surface (n_bigrams, nll_sum_fp)."""
    from briefly_spark.operators.lm import lm_holdout_nll_sums
    from briefly_spark.operators.textstats import _hash16

    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = _hash16(F.col("doc_id")) % 100
    return lm_holdout_nll_sums(
        docs.filter(bucket >= 10), docs.filter(bucket < 5), "doc_id", "text"
    )
