"""Corpus language-model scoring — the CCNet-style quality signal: train a
bigram LM on the corpus, score every document by average negative
log-likelihood (perplexity = e^avg_nll).  Documents far from the corpus
distribution (boilerplate, gibberish, wrong-language) score high and can be
bucketed/filtered — the standard third leg next to rule-based quality
(q52/q55) and dedup (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 — public method).

Model: add-one-smoothed bigram,  p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).
Counts and V are exact integers, and the per-bigram negative log-likelihood
is computed with the BIT-REPRODUCIBLE log (numerics.det_ln_sql: integer
bit-length exponent + fixed-order atanh polynomial, IEEE-exact ops only) —
never the library ``ln``, which differs across engines by 1 ulp on ~3% of
inputs and makes ``floor(ln·10⁴)`` flip at floor boundaries per
environment.  nll = det_ln(c1+V) − det_ln(c12+1), fixed-pointed before the
per-doc weighted sum (the same integer-sum discipline as
operators/search.py).

Plan shape (two scans total, no pair joins):

- branch A: one explode → groupBy(doc, w1, w2) bigram frame; the global
  bigram count c(w1,w2) is a window SUM over the (w1,w2) partition of
  that same frame — no second scan.  At 100 TB a boilerplate bigram makes
  that window partition hot (windows can't be skew-split); swap the
  window for a partial-agg + AQE-skew-protected equi-join, or persist the
  grouped frame — the rest of the plan is unchanged.
- branch B: one explode → groupBy(term) unigram counts, V attached by a
  global window over the vocab-sized aggregate; broadcast-joined back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from briefly_spark.numerics import RATIO_SCALE, det_ln_helpers, det_ln_items
from briefly_spark.operators.search import tokens_of

#: auto c12_mode threshold — above this estimated input size the global
#: bigram count switches from a window to an AQE-skew-splittable equi-join.
AUTO_JOIN_BYTES = 4 << 30


def doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document bigram counts: (doc_id, w1, w2, n).  The index range is
    guarded the same way as ngrams_of_words — ``sequence(1, 0)`` DESCENDS
    in Spark, so short docs must yield an empty index list, not a crash."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_of(F.col(text_col)).alias("w")
    )
    last = F.size("w") - 1
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).agg(
        F.count(F.lit(1)).alias("n")
    )


def unigram_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus unigram counts with the vocabulary size attached to every row:
    (term, c1, vocab).  Vocab-sized — a broadcast candidate.  The vocab
    count is a 1-row aggregate over the term frame broadcast back onto it
    (NOT an unpartitioned window, which would drag the whole vocab through
    one task); ReuseExchange serves both consumers from the single term
    shuffle."""
    toks = docs.select(F.explode(tokens_of(F.col(text_col))).alias("term"))
    c1 = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    v = c1.agg(F.count(F.lit(1)).alias("vocab"))
    return c1.crossJoin(F.broadcast(v))


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (file-stat based for parquet
    scans); -1 when unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - py4j surface drift
        return -1


def lm_doc_scores(
    docs: DataFrame, id_col: str, text_col: str, *, c12_mode: str = "auto"
) -> DataFrame:
    """Average bigram negative log-likelihood per document (self-scored on
    the training corpus, the leave-in CCNet setup).  Returns (doc_id,
    n_bigrams, avg_nll) for every doc with ≥ 1 bigram; perplexity is
    e^avg_nll (not emitted — the output carries no library transcendental
    at all: the per-bigram log is numerics.det_ln_sql, bit-identical in
    Spark / DuckDB / CPython by IEEE-exact construction).

    avg_nll = (Σ n·floor((det_ln(c1+V) − det_ln(c12+1))·10⁴)) div Σn / 10⁴
    — integer weighted sum, integer division: every aggregation step is
    exact and order-independent, and the fixed-point projection floors a
    bit-reproducible double, so the result is engine-independent.

    ``c12_mode`` picks the global-bigram-count strategy (identical output,
    unit-asserted):
    - ``"auto"`` (default): window below AUTO_JOIN_BYTES of estimated
      input (Catalyst stats), join above — the skew-safe path engages by
      size, not by caller flag.
    - ``"window"``: SUM over the (w1, w2) partition of the one bigram
      frame — no extra scan, but a boilerplate bigram present in every
      doc makes that window partition hot, and windows cannot be
      skew-split.
    - ``"join"`` (100 TB): partial-agg the counts and equi-join them back
      — one more scan of the bigram lineage, but the join is
      AQE-skew-splittable, so a hot bigram spreads across tasks."""
    scored = scored_bigrams(docs, id_col, text_col, c12_mode=c12_mode)
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        (
            F.expr("sum(n * nll_fp) div sum(n)") / float(RATIO_SCALE)
        ).alias("avg_nll"),
    )


def lm_doc_nll_sums(
    docs: DataFrame, id_col: str, text_col: str, *, c12_mode: str = "auto"
) -> DataFrame:
    """Integer-only twin of :func:`lm_doc_scores`: (doc_id, n_bigrams,
    nll_sum_fp) with NO division anywhere — the total fixed-point nll mass
    per document as an exact long.  avg_nll = (nll_sum_fp div n_bigrams) /
    10⁴ recovers the q48 score; emitting the undivided integers keeps the
    hashed surface free of every cross-engine rendering hazard (no DOUBLE,
    no integer division), which is what the q48a driver diagnostic
    isolates."""
    scored = scored_bigrams(docs, id_col, text_col, c12_mode=c12_mode)
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("nll_fp")).cast("long").alias("nll_sum_fp"),
    )


def scored_bigrams(
    docs: DataFrame, id_col: str, text_col: str, *, c12_mode: str = "auto"
) -> DataFrame:
    """The shared per-(doc, bigram) scored frame: (doc_id, w1, w2, n, c12,
    c1, vocab, nll_fp) with nll_fp = floor((det_ln(c1+V) − det_ln(c12+1))·10⁴)
    an exact long.  See :func:`lm_doc_scores` for the c12_mode contract."""
    if c12_mode not in ("auto", "window", "join"):
        raise ValueError(
            f"c12_mode must be 'auto', 'window' or 'join', got {c12_mode!r}"
        )
    if c12_mode == "auto":
        est = _estimated_bytes(docs)
        c12_mode = "join" if est >= AUTO_JOIN_BYTES else "window"
    big = doc_bigrams(docs, id_col, text_col)
    if c12_mode == "join":
        counts = big.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
        c12 = big.join(counts, ["w1", "w2"])
    else:
        c12 = big.withColumn("c12", F.sum("n").over(Window.partitionBy("w1", "w2")))
    uni = unigram_counts(docs, id_col, text_col)
    return c12.join(
        F.broadcast(uni.select(F.col("term").alias("w1"), "c1", "vocab")), "w1"
    ).selectExpr(
        "*",
        *det_ln_items("c1 + vocab", "__ln_a", "spark"),
        *det_ln_items("c12 + 1", "__ln_b", "spark"),
        f"floor(((__ln_a - __ln_b) * {float(RATIO_SCALE)!r})) AS nll_fp",
    ).drop(
        "__ln_a", "__ln_b", *det_ln_helpers("__ln_a"), *det_ln_helpers("__ln_b")
    )


def lm_holdout_nll_sums(
    train_docs: DataFrame, score_docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Held-out LM scoring — the model trains on ``train_docs`` ONLY and
    scores ``score_docs`` (the real CCNet configuration: the reference
    model comes from a target corpus, the scored slice is disjoint).
    Returns (doc_id, n_bigrams, nll_sum_fp) integers for every scored doc
    with ≥ 1 bigram.

    Unseen-event semantics under the same add-one smoothing: a bigram or
    head word absent from the training counts scores with c12 = 0 /
    c1 = 0 (nll = det_ln(0 + V) − det_ln(0 + 1) = ln V for a fully-novel
    head) — LEFT joins with coalesce(0), never dropped rows, so
    out-of-domain text scores HIGH instead of silently shrinking its own
    denominator.

    Plan: two scans of each corpus slice (bigrams + unigrams, both
    partial-agg shuffles bounded by the slice's token mass); the train
    model joins back as one (w1, w2) equi-join (AQE-splittable — hot
    boilerplate bigrams split, same as the join c12_mode of
    :func:`lm_doc_scores`) plus a vocab-sized broadcast."""
    ebig = doc_bigrams(score_docs, id_col, text_col)
    tglob = (
        doc_bigrams(train_docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.sum("n").cast("long").alias("c12"))
    )
    ttoks = train_docs.select(F.explode(tokens_of(F.col(text_col))).alias("term"))
    tuni = ttoks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    tv = tuni.agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    scored = (
        ebig.join(tglob, ["w1", "w2"], "left")
        .join(
            F.broadcast(tuni.select(F.col("term").alias("w1"), "c1")), "w1", "left"
        )
        .crossJoin(F.broadcast(tv))
        .selectExpr(
            "doc_id",
            "n",
            *det_ln_items("coalesce(c1, 0) + vocab", "__ln_a", "spark"),
            *det_ln_items("coalesce(c12, 0) + 1", "__ln_b", "spark"),
            f"CAST(floor(((__ln_a - __ln_b) * {float(RATIO_SCALE)!r})) AS BIGINT) AS nll_fp",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("nll_fp")).cast("long").alias("nll_sum_fp"),
    )
