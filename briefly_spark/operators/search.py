"""Lexical retrieval operators — TF-IDF term weighting and BM25 ranked
search over an inverted index, the text-side complement to the vector ANN
tiers (operators/similarity.py).

A training-data pipeline needs lexical retrieval in several places the
reference touches only implicitly (get_relevant_articles.py's fallback
"related" fill, fact-check search sub-queries): benchmark-contamination
checks by keyword, quality-probe queries against the corpus, and
more-like-this expansion where no embedding exists yet.

Plan shapes (the point — NO doc×query pair join anywhere):

- :func:`term_postings` — ONE explode + groupBy: the inverted index
  (term → doc, tf).  At 100 TB this is the classic build: shuffle carries
  (term, doc_id, tf) only, partitioned by term.
- :func:`tfidf_topterms` — postings ⋈ broadcast(df/N stats) → per-doc
  window.  Map-side after the one postings shuffle.
- :func:`bm25_topk` — query terms ⋈ postings on TERM (the inverted-index
  equi-join: fan-out only where a term actually matches), then one
  (qid, doc) aggregation and one per-qid ranking window.

Cross-engine determinism: library ``ln`` differs from DuckDB's by 1 ulp on
~3% of inputs (measured), and flooring a transcendental flips at floor
boundaries per environment — so the scores here never call it.  Each
per-term score is built from numerics.det_ln_sql (bit-reproducible log:
integer bit-length exponent + fixed-order polynomial, IEEE-exact ops only)
through a SINGLE dialect-parameterized SQL generator used verbatim by both
the Spark plan and the DuckDB oracle, fixed-pointed (``floor(x·10⁴)``)
before aggregation sums exact integers; ranking ties break on the
term/doc key.  BM25's idf keeps integral log arguments via
ln(1 + (N−df+0.5)/(df+0.5)) = ln((2N+2)/(2df+1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from briefly_spark.numerics import RATIO_SCALE, det_ln_items


def tfidf_score_items(tf: str, n_docs: str, df: str, dialect: str) -> list[str]:
    """Fixed-point TF-IDF term score as staged lateral-alias SELECT items
    ending in ``… AS score_fp``: floor((tf · (det_ln N − det_ln df)) · 10⁴),
    deterministic in any IEEE engine.  Emitted for BOTH dialects from this
    one generator so the rounding sequence matches exactly; the staged form
    (numerics.det_ln_items) keeps the per-row tree ~10× smaller than the
    inline det_ln expansion with bit-identical results."""
    return [
        *det_ln_items(n_docs, "__ln_nd", dialect),
        *det_ln_items(df, "__ln_df", dialect),
        f"floor(((CAST(({tf}) AS DOUBLE) * (__ln_nd - __ln_df)) * 10000.0))"
        " AS score_fp",
    ]


def bm25_score_items(
    tf: str,
    df: str,
    dl: str,
    n_docs: str,
    avgdl: str,
    dialect: str,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[str]:
    """Fixed-point per-term BM25 contribution as staged lateral-alias SELECT
    items ending in ``… AS score_fp``, deterministic in any IEEE engine.
    idf = det_ln(2N+2) − det_ln(2df+1) (integral log arguments); the k1/b
    constants are emitted as shortest-repr literals, which every SQL parser
    rounds to the same double."""
    num = f"(CAST(({tf}) AS DOUBLE) * {k1 + 1.0!r})"
    den = (
        f"(CAST(({tf}) AS DOUBLE) + ({k1!r} * ({1.0 - b!r}"
        f" + (({b!r} * CAST(({dl}) AS DOUBLE)) / ({avgdl})))))"
    )
    return [
        *det_ln_items(f"(2 * ({n_docs})) + 2", "__ln_n2", dialect),
        *det_ln_items(f"(2 * ({df})) + 1", "__ln_d2", dialect),
        f"floor((((__ln_n2 - __ln_d2) * ({num} / {den})) * 10000.0))"
        " AS score_fp",
    ]


def tokens_of(text) -> F.Column:
    """Whitespace tokens, lowercased, empty strings dropped — the same
    tokenizer the textstats pack uses (cross-engine: string_split_regex)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def term_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index postings: one row per (doc, term) with the term
    frequency.  Returns (doc_id, term, tf)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_of(F.col(text_col))).alias("term")
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def corpus_stats(docs: DataFrame, text_col: str) -> DataFrame:
    """One-row corpus stats (N, avgdl) straight off the documents scan —
    deliberately NOT derived from the postings branch: Spark has no
    cross-branch common-subexpression reuse, so a postings-derived stats
    row would re-scan and re-explode the whole corpus (verified: the
    groupBy-based formulation planned 3 parquet scans for TF-IDF, 5 for
    BM25).  This branch is map-only (tokenize + count, no explode, no
    shuffle beyond the 1-row agg) and avgdl = exact-int-sum / count, so
    it is order-independent.  N counts ALL docs, token-less ones
    included."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(tokens_of(F.col(text_col)))).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )


def tfidf_topterms(
    docs: DataFrame, id_col: str, text_col: str, *, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf · ln(N/df), fixed-pointed per
    term, ranked (score desc, term asc).  Returns (doc_id, term, tf, df,
    rank, tfidf).

    Single-postings-branch plan: df is a COUNT window over the term
    partition of the one postings frame (postings are unique per
    (doc, term), so the window count IS the document frequency) — no
    second scan+explode for a df aggregate, no join.  N comes from a
    metadata-only count on the documents scan.  Two thin shuffles total
    (by term, then by doc for the ranking window)."""
    postings = term_postings(docs, id_col, text_col)
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (
        postings.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(n_docs)
        .selectExpr("*", *tfidf_score_items("tf", "n_docs", "df", "spark"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_fp"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "rank",
            (F.col("score_fp") / float(RATIO_SCALE)).alias("tfidf"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = True,
) -> DataFrame:
    """BM25 ranked retrieval.  ``queries`` is (qid, term) — one row per
    query term.  Returns (qid, doc_id, rank, n_terms_matched, bm25).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) = det_ln(2N+2) − det_ln(2df+1)
    (numerics.det_ln_sql — bit-reproducible, no library transcendental) —
    each term's contribution is fixed-pointed before the (qid, doc) sum so
    the aggregate is an exact integer sum (order-independent,
    engine-independent).

    Join discipline: queries meet the corpus ONLY through the term
    equi-join against the postings index — cost is O(matching postings),
    never O(|Q|·|docs|).  df and dl are window aggregates over the ONE
    postings frame (dl over the doc partition first, df over the term
    partition second — the frame ends hash-partitioned by term, and
    postings are unique per (doc, term) so the term-window COUNT is the
    document frequency); stats broadcast from a map-only documents pass
    (see :func:`corpus_stats`).  No scan is repeated.  At warehouse scale,
    persist the enriched postings bucketed by term (storage.py K6) and
    this whole prefix disappears from the per-query cost."""
    postings = term_postings(docs, id_col, text_col)
    stats = corpus_stats(docs, text_col)
    enriched = postings.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    ).withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    matched = queries.join(enriched, "term").crossJoin(F.broadcast(stats))
    if exclude_self:
        # Self-exclusion only makes sense when qids ARE doc ids; comparing
        # mismatched types (string qid vs long doc_id) coerces to NULL and
        # silently drops every match, so skip the filter on type mismatch.
        qid_t = dict(queries.dtypes).get("qid")
        doc_t = dict(enriched.dtypes).get("doc_id")
        if qid_t == doc_t:
            matched = matched.filter(F.col("qid") != F.col("doc_id"))
    scored = matched.selectExpr(
        "*", *bm25_score_items("tf", "df", "dl", "n_docs", "avgdl", "spark", k1=k1, b=b)
    )
    per_doc = scored.groupBy("qid", "doc_id").agg(
        F.sum("score_fp").alias("sum_fp"), F.count(F.lit(1)).alias("n_terms_matched")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sum_fp"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            "rank",
            "n_terms_matched",
            (F.col("sum_fp") / float(RATIO_SCALE)).alias("bm25"),
        )
    )


def positional_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional inverted-index postings: one row per token OCCURRENCE —
    (doc_id, pos, term), pos 0-based.  The index phrase/proximity queries
    intersect on; tf-only consumers keep using term_postings (smaller)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_of(F.col(text_col))).alias("pos", "term"),
    )


def phrase_topk(
    docs: DataFrame, phrases: DataFrame, id_col: str, text_col: str, *, k: int = 5
) -> DataFrame:
    """Exact two-word-phrase retrieval (positional intersection —
    Manning/Raghavan/Schütze IR §2.4): for each (qid, w1, w2) phrase,
    every document where w2 occurs DIRECTLY AFTER w1, ranked by adjacency
    count, top-k per query, ties to the lower doc_id.  Returns
    (qid, doc_id, n_hits, rank).

    Plan: one posexplode builds the positional postings; ``phrases`` is
    query-sized and broadcast, so leg A costs O(postings of the phrases'
    first words); the adjacency check is an equi-join on
    (doc, pos+1, term) — AQE-skew-splittable, no inequality scan; the
    ranking window sees only matched (query, doc) counts."""
    from pyspark.sql import Window

    ptoks = positional_postings(docs, id_col, text_col)
    cand = ptoks.join(F.broadcast(phrases), ptoks["term"] == phrases["w1"]).select(
        "qid", "doc_id", "pos", "w2"
    )
    nxt = ptoks.select(
        F.col("doc_id").alias("b_doc"),
        F.col("pos").alias("b_pos"),
        F.col("term").alias("b_term"),
    )
    hits = (
        cand.join(
            nxt,
            (F.col("b_doc") == F.col("doc_id"))
            & (F.col("b_pos") == F.col("pos") + 1)
            & (F.col("b_term") == F.col("w2")),
        )
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("n_hits"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "n_hits", "rank")
    )
