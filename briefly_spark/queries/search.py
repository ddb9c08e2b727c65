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

from briefly_spark.catalog import load_table, spread
from briefly_spark.numerics import det_ln_sql
from briefly_spark.operators.search import (
    bm25_score_fp_sql,
    bm25_topk,
    term_postings,
    tfidf_score_fp_sql,
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
         {tfidf_score_fp_sql('p.tf', 's.n_docs', 'd.df', 'duckdb')} AS score_fp
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
         {bm25_score_fp_sql('p.tf', 'd.df', 'l.dl', 's.n_docs', 's.avgdl', 'duckdb')} AS score_fp
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
@register(
    "q48_lm_perplexity",
    covers=("A3", "A4"),
    oracle=f"""
WITH toks AS (
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
  -- The log is numerics.det_ln_sql (bit-reproducible), mirroring the
  -- Spark plan's expression op-for-op.
  SELECT g.doc_id, g.n,
         CAST(floor((({det_ln_sql('u.c1 + u.vocab', 'duckdb')} - {det_ln_sql('g.c12 + 1', 'duckdb')}) * 10000.0)) AS BIGINT) AS nll_fp
  FROM c12 g JOIN uni u ON u.term = g.w1
)
SELECT doc_id, sum(n) AS n_bigrams,
       (sum(n * nll_fp) // sum(n)) / 10000.0 AS avg_nll
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
