"""Text-analysis pack — language-ID, quality scoring, token counting and
winnowing fingerprints over ``documents``.

Every query is a single map stage (native expressions, no UDFs, no
shuffles except the final rollup's groupBy) — at 100 TB this pass runs at
parquet-scan speed with full column pruning (only ``doc_id``/``text``/
grouping columns are read).

The oracles re-state the exact same heuristics in DuckDB list/regex
algebra; deterministic tie-breaks and fixed-point aggregation make the
hash-compare exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.numerics import sql_fixed_avg, trunc4
from briefly_spark.operators.textstats import (
    LEXICONS,
    bpe_token_count,
    kgram_hashes,
    language_id,
    language_scores,
    mean_word_len,
    quality_score,
    window_minima,
    word_count,
)
from briefly_spark.queries import register

# ---- shared DuckDB fragments (exact mirrors of operators/textstats.py) ----
_TOKS = r"list_filter(string_split_regex(text, '\s+'), w -> w <> '')"
_BPE = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"


def _sql_lex(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LEXICONS[lang])
    return f"[{words}]"


def _sql_stopratio(lang: str) -> str:
    return (
        f"CASE WHEN len(list_distinct(toks)) > 0 THEN "
        f"CAST(len(list_intersect(list_distinct(toks), {_sql_lex(lang)})) AS DOUBLE)"
        f" / len(list_distinct(toks)) ELSE 0.0 END"
    )


_SQL_WL = (
    "CASE WHEN len(toks) > 0 THEN "
    "CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE) / len(toks) "
    "ELSE 0.0 END"
)
_SQL_PUNCT = (
    r"CASE WHEN len(text) > 0 THEN "
    r"CAST(len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE) / len(text) "
    r"ELSE 0.0 END"
)
_SQL_DIGIT = (
    "CASE WHEN len(text) > 0 THEN "
    "CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / len(text) "
    "ELSE 0.0 END"
)
_SQL_QUALITY = f"""
  least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 3
  + least(({_sql_stopratio('en')}) * 5.0, 1.0) * 3
  + (CASE WHEN ({_SQL_WL}) >= 3.0 AND ({_SQL_WL}) <= 10.0 THEN 1.0 ELSE 0.0 END) * 2
  + greatest(1.0 - (({_SQL_PUNCT}) + ({_SQL_DIGIT})) * 4.0, 0.0) * 2
"""


# --------------------------------------------------------------------------
# q50 — token counting (whitespace + BPE-ish regex).
# --------------------------------------------------------------------------
@register(
    "q50_token_stats",
    covers=("F5",),
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks) AS n_ws, {_BPE} AS n_bpe, len(text) AS n_chars
FROM t
""",
)
def q50_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-style token counts per document — the cost model
    for LLM pipelines.  Pure codegen map; at 100 TB this reads exactly two
    columns from parquet."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        word_count(F.col("text")).cast("long").alias("n_ws"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# q51 — language identification (stopword-overlap heuristic).
# --------------------------------------------------------------------------
@register(
    "q51_language_id",
    covers=("F1",),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id,
             {_sql_stopratio('de')} AS s_de, {_sql_stopratio('en')} AS s_en,
             {_sql_stopratio('es')} AS s_es, {_sql_stopratio('fr')} AS s_fr
      FROM t)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred,
       floor(greatest(s_de, s_en, s_es, s_fr) * 10000) / 10000.0 AS score
FROM s
""",
)
def q51_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID: per-language lexicon overlap, argmax
    with deterministic alphabetical tie priority, 'und' on zero evidence.
    The lexicons are compile-time literals here; the scale path swaps in a
    broadcast lexicon table without changing the plan shape."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    scores = language_scores(F.col("text"))
    best = F.greatest(*scores.values())
    return docs.select(
        "doc_id",
        language_id(F.col("text")).alias("lang_pred"),
        trunc4(best).alias("score"),
    )


# --------------------------------------------------------------------------
# q52 — document quality scoring.
# --------------------------------------------------------------------------
@register(
    "q52_quality_score",
    covers=("P7",),
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       floor(({_SQL_QUALITY}) * 10000) / 10000.0 AS quality,
       len(toks) AS n_words,
       floor(({_SQL_WL}) * 10000) / 10000.0 AS mean_word_len
FROM t
""",
)
def q52_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style heuristic quality rubric in [0,10]: length,
    stopword density, word-length plausibility, punctuation/digit noise —
    each clamped and weighted.  The filter gate for corpus curation
    (`quality >= threshold`) composes with this as a plain predicate that
    Catalyst pushes into the same map stage."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        trunc4(quality_score(F.col("text"))).alias("quality"),
        word_count(F.col("text")).cast("long").alias("n_words"),
        trunc4(mean_word_len(F.col("text"))).alias("mean_word_len"),
    )


# --------------------------------------------------------------------------
# q53 — winnowing fingerprints (rolling-hash document sketch).
# --------------------------------------------------------------------------
@register(
    "q53_winnow_fingerprints",
    covers=("F9", "U5"),
    oracle="""
WITH h AS (
  SELECT doc_id,
         CASE WHEN len(text) >= 8
              THEN list_transform(range(1, greatest(len(text) - 7, 1) + 1),
                                  i -> md5(substr(text, CAST(i AS INT), 8)))
              ELSE [md5(text)] END AS hashes
  FROM documents
),
m AS (
  SELECT doc_id,
         CASE WHEN len(hashes) >= 4
              THEN list_transform(range(1, greatest(len(hashes) - 3, 1) + 1),
                                  i -> list_min(list_slice(hashes, i, i + 3)))
              ELSE [list_min(hashes)] END AS mins
  FROM h
)
SELECT doc_id, array_to_string(list_sort(list_distinct(mins)), ',') AS fp
FROM m
""",
)
def q53_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint (k=8 char-grams, window w=4): per-window
    minima of the rolling md5 stream, deduped and sorted.  Any shared
    substring of length ≥ 11 chars yields a shared fingerprint — joinable
    for containment/plagiarism detection the same way as q31's bands.

    Staged projections (hashes → minima → fp) keep each stream evaluated
    once per row — higher-order lambdas have no CSE, so inlining the hash
    stream into the window expression would be O(n²) per document."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    hashed = docs.select("doc_id", kgram_hashes(F.col("text"), k=8).alias("hashes"))
    mins = hashed.select("doc_id", window_minima(F.col("hashes"), w=4).alias("mins"))
    return mins.select(
        "doc_id", F.array_join(F.array_sort(F.array_distinct(F.col("mins"))), ",").alias("fp")
    )


# --------------------------------------------------------------------------
# q54 — corpus-curation rollup: quality × language per source.
# --------------------------------------------------------------------------
@register(
    "q54_source_quality_rollup",
    covers=("A3", "A4"),
    oracle=f"""
WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
q AS (SELECT source, ({_SQL_QUALITY}) AS quality FROM t)
SELECT source,
       count(*) AS n_docs,
       {sql_fixed_avg('quality', 10000, 'avg_quality')},
       CAST(sum(CASE WHEN quality < 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM q GROUP BY source
""",
)
def q54_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation report: doc counts, fixed-point average quality
    and low-quality counts — the decision table for dropping/reweighting
    sources.  One partial-agg shuffle on `source`; the quality expression
    fuses into the scan stage ahead of it."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    q = docs.select("source", quality_score(F.col("text")).alias("quality"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.floor(F.col("quality") * 10000)) / F.count(F.lit(1)) / 10000.0).alias(
            "avg_quality"
        ),
        F.sum(F.when(F.col("quality") < 5.0, 1).otherwise(0)).alias("n_low"),
    )
