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


# --------------------------------------------------------------------------
# q55 — Gopher-style composition rules (repetition, symbols, bullets,
# alphabetic fraction) + keep gate.
# --------------------------------------------------------------------------
# Deterministic multi-line synthesis shared by Spark and the oracle: break
# the single-line corpus into 8-word lines, plant a guaranteed duplicate
# line pair, and a bullet line on every 4th doc — so every rule sees
# non-degenerate input.  Spark uses $1 for the backreference, DuckDB \1;
# the pattern itself is alternation-free so both regex engines agree.
_ML_SPARK_PATTERN = r"((\S+\s+){7}\S+)\s+"
_SQL_ML = (
    r"regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g')"
    r" || chr(10) || 'END OF DOC' || chr(10) || 'END OF DOC'"
    r" || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- promoted bullet ...' ELSE '' END"
)
_SQL_LINES = "list_filter(string_split(ml, chr(10)), l -> l <> '')"
_SQL_MLTOKS = r"list_filter(string_split_regex(ml, '\s+'), w -> w <> '')"


@register(
    "q55_gopher_rules",
    covers=("P7", "F5"),
    oracle=f"""
WITH m AS (SELECT doc_id, ({_SQL_ML}) AS ml FROM documents),
s AS (
  SELECT doc_id, ml,
         {_SQL_LINES} AS ls,
         {_SQL_MLTOKS} AS toks,
         CAST(len(ml) - len(replace(ml, '#', '')) AS DOUBLE) AS n_hash,
         CAST(len(ml) - len(replace(ml, '...', '')) AS DOUBLE) / 3 AS n_ell
  FROM m
),
r AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN len(ls) > 0
              THEN 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
              ELSE 0.0 END AS dup_f,
         CASE WHEN len(toks) > 0 THEN (n_hash + n_ell) / len(toks) ELSE 0.0 END AS sym_f,
         CASE WHEN len(ls) > 0
              THEN CAST(len(list_filter(ls, l -> substr(l, 1, 2) = '- ' OR substr(l, 1, 2) = '* ')) AS DOUBLE) / len(ls)
              ELSE 0.0 END AS bullet_f,
         CASE WHEN len(ls) > 0
              THEN CAST(len(list_filter(ls, l -> substr(l, len(l) - 2, 3) = '...')) AS DOUBLE) / len(ls)
              ELSE 0.0 END AS ellipsis_f,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS alpha_f,
         CASE WHEN len(toks) > 0 THEN
           CAST(list_sum(list_transform(toks, w -> CAST(len(w) AS DOUBLE))) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS wl,
         len(list_intersect(list_distinct(toks), {_sql_lex('en')})) AS stop_hits
  FROM s
)
SELECT doc_id, n_words,
       floor(dup_f * 10000) / 10000.0 AS dup_line_frac,
       floor(sym_f * 10000) / 10000.0 AS symbol_ratio,
       floor(bullet_f * 10000) / 10000.0 AS bullet_frac,
       floor(ellipsis_f * 10000) / 10000.0 AS ellipsis_frac,
       floor(alpha_f * 10000) / 10000.0 AS alpha_frac,
       (n_words >= 50 AND n_words <= 100000
        AND wl >= 3.0 AND wl <= 10.0
        AND sym_f < 0.1 AND bullet_f < 0.9 AND ellipsis_f < 0.3
        AND alpha_f > 0.8 AND stop_hits >= 2) AS keep
FROM r
""",
)
def q55_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-composition rules (Rae et al. 2021 A1.1) as one
    native map stage: duplicate-line fraction, symbol-to-word ratio,
    bullet/ellipsis line fractions, alphabetic-word fraction, and the
    combined keep gate.  Multi-line structure is synthesized
    deterministically (8-word lines + a planted duplicate pair + a bullet
    line on every 4th doc) so each rule sees non-degenerate input; at
    100 TB this pass runs at parquet-scan speed (zero shuffles)."""
    from briefly_spark.operators.textstats import (
        alpha_word_fraction,
        bullet_line_fraction,
        duplicate_line_fraction,
        ellipsis_line_fraction,
        gopher_keep,
        symbol_word_ratio,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    ml = F.concat(
        F.regexp_replace(F.col("text"), _ML_SPARK_PATTERN, "$1\n"),
        F.lit("\nEND OF DOC\nEND OF DOC"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("\n- promoted bullet ...")).otherwise(
            F.lit("")
        ),
    )
    staged = docs.select("doc_id", ml.alias("ml"))
    c = F.col("ml")
    return staged.select(
        "doc_id",
        word_count(c).alias("n_words"),
        trunc4(duplicate_line_fraction(c)).alias("dup_line_frac"),
        trunc4(symbol_word_ratio(c)).alias("symbol_ratio"),
        trunc4(bullet_line_fraction(c)).alias("bullet_frac"),
        trunc4(ellipsis_line_fraction(c)).alias("ellipsis_frac"),
        trunc4(alpha_word_fraction(c)).alias("alpha_frac"),
        gopher_keep(c).alias("keep"),
    )


# --------------------------------------------------------------------------
# q26-style PII scrub lives here with the other curation passes: detection
# counts + typed-placeholder redaction, hash-pinned.
# --------------------------------------------------------------------------
@register(
    "q56_pii_scrub",
    covers=("P7", "F5"),
    oracle="""
WITH p AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-1234 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
  FROM documents
),
s AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(t, '\\d{3}[-.]\\d{3}[-.]\\d{4}')) AS n_phone,
         len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\d{3}[-.]\\d{3}[-.]\\d{4}', '<PHONE>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS scrubbed
  FROM p
)
SELECT doc_id, n_email, n_phone, n_ipv4, md5(scrubbed) AS scrubbed_md5
FROM s
""",
)
def q56_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (C4/RefinedWeb-style cleaning): per-kind
    match counts and typed-placeholder scrub, all chained native
    regexp_replace (alternation-free patterns ⇒ Java regex and RE2 agree
    byte-for-byte).  PII is planted deterministically per doc_id so counts
    are non-trivial; the scrubbed text is hash-pinned (md5) to keep the
    whole redaction under the oracle without shipping full text."""
    from briefly_spark.operators.textstats import pii_counts, pii_scrub

    docs = spread(load_table(spark, sf_dir, "documents"))
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-1234 from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    staged = docs.select("doc_id", planted.alias("t"))
    counts = pii_counts(F.col("t"))
    return staged.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(pii_scrub(F.col("t"))).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# q57/q58/q59 — dataset assembly: deterministic split, domain-mixture
# resampling, token-budget sequence packing.
# --------------------------------------------------------------------------
# hash16(x) = first 4 md5 hex digits as int — DuckDB mirror of
# operators/textstats._hash16 (same instr/strpos nibble arithmetic).
def _sql_hash16(expr: str) -> str:
    nib = lambda j: f"(strpos('0123456789abcdef', substr(md5({expr}), {j}, 1)) - 1)"
    return f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"


@register(
    "q57_hash_split",
    covers=("P7", "A3"),
    oracle=f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CASE WHEN {_sql_hash16('CAST(doc_id AS VARCHAR)')} % 100 < 5 THEN 'val'
              WHEN {_sql_hash16('CAST(doc_id AS VARCHAR)')} % 100 < 10 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
""",
)
def q57_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (5/5/90) from a content-stable
    hash bucket: re-runs, reshuffles and incremental appends never migrate
    a row between splits — the reproducibility property a 100 TB training
    corpus needs and `rand()`-based splits lack.  One map stage + one
    partial-agg rollup."""
    from briefly_spark.operators.textstats import hash_split

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(hash_split(F.col("doc_id")).alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q58_mixture_resample",
    covers=("P7", "A4"),
    oracle=f"""
WITH r AS (
  SELECT source,
         0.25 + ({_sql_hash16('source')} % 8) / 16.0 AS rate
  FROM (SELECT DISTINCT source FROM documents)
),
a AS (
  SELECT d.source, r.rate,
         CASE WHEN {_sql_hash16('CAST(d.doc_id AS VARCHAR)')} / 65536.0 < r.rate
              THEN 1 ELSE 0 END AS acc
  FROM documents d JOIN r ON d.source = r.source
)
SELECT source,
       count(*) AS n_total,
       CAST(sum(acc) AS BIGINT) AS n_accepted,
       floor(any_value(rate) * 10000) / 10000.0 AS target_rate
FROM a GROUP BY source
""",
)
def q58_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: a per-source target rate (broadcast
    weights dim — here derived deterministically from the source hash, in
    production the output of a mixture solver) and a reproducible per-row
    accept decision (hash-fraction < rate).  The 100 TB shape: broadcast
    join of the tiny weights table + one map-stage filter; acceptance is
    row-stable so incremental re-runs keep identical samples."""
    from briefly_spark.operators.textstats import _hash16, mixture_accept

    docs = spread(load_table(spark, sf_dir, "documents"))
    rates = (
        docs.select("source")
        .distinct()
        .select("source", (0.25 + (_hash16(F.col("source")) % 8) / 16.0).alias("rate"))
    )
    joined = docs.join(F.broadcast(rates), "source").select(
        "source",
        "rate",
        mixture_accept(F.col("doc_id"), F.col("rate")).cast("int").alias("acc"),
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("acc").alias("n_accepted"),
        trunc4(F.first("rate")).alias("target_rate"),
    )


@register(
    "q59_pack_sequences",
    covers=("W4", "A3"),
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS toks
  FROM documents
),
c AS (
  SELECT source, doc_id, toks,
         sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
b AS (
  SELECT source, CAST(floor((cum - toks) / 512.0) AS BIGINT) AS bin, toks
  FROM c
)
SELECT source, bin, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
FROM b GROUP BY source, bin
""",
)
def q59_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (training-sequence assembly): each
    document lands in bin floor((cumsum − toks)/512) within its source, a
    deterministic first-fit approximation whose bins overflow by < one
    document.  One window per source partition — the shuffle is keyed on
    the group column, no global sort; bins then roll up with a partial
    agg."""
    from briefly_spark.operators.textstats import pack_sequences

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("source", "doc_id", word_count(F.col("text")).alias("toks"))
    packed = pack_sequences(
        t, group_col="source", order_col="doc_id", tokens_col="toks", budget=512
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("bin_tokens")
    )


# --------------------------------------------------------------------------
# q35 — top n-gram repetition (the shuffle-based Gopher repetition rule:
# fraction of the document covered by its most frequent word 2-gram).
# --------------------------------------------------------------------------
@register(
    "q35_top_ngram_repetition",
    covers=("A4", "W4"),
    oracle=r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
),
g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM t WHERE len(ws) >= 2
),
c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
p AS (
  SELECT doc_id, gram, cnt,
         CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS total,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
  FROM c
)
SELECT doc_id, gram AS top_gram, cnt AS top_cnt,
       floor(CAST(cnt AS DOUBLE) / total * 10000) / 10000.0 AS top_frac
FROM p WHERE rn = 1
""",
)
def q35_top_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent word 2-gram per document and the fraction of all
    2-grams it accounts for — the Gopher repetition rule that needs a
    shuffle (unlike the q55 map-only rules): explode grams → partial-agg
    count keyed (doc, gram) → per-doc argmax by window.  At 100 TB the
    shuffle is bounded by distinct (doc, gram) pairs with map-side
    combine; ties break deterministically (cnt desc, gram desc)."""
    from pyspark.sql import Window

    from briefly_spark.operators.textstats import tokens, word_ngrams

    docs = spread(load_table(spark, sf_dir, "documents"))
    # tokens() (empty-filtered split) — a raw F.split would emit an empty
    # first token for leading-whitespace text, diverging from the oracle's
    # list_filter semantics.
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("ws")
    ).filter(F.size("ws") >= 2)
    ex = staged.select("doc_id", F.explode(word_ngrams(F.col("ws"), 2)).alias("gram"))
    counts = ex.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w_tot = Window.partitionBy("doc_id")
    w_rnk = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.desc("gram"))
    return (
        counts.withColumn("total", F.sum("cnt").over(w_tot))
        .withColumn("rn", F.row_number().over(w_rnk))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            F.col("cnt").alias("top_cnt"),
            trunc4(F.col("cnt") / F.col("total")).alias("top_frac"),
        )
    )


# --------------------------------------------------------------------------
# q38 — exact-quota stratified sampling (deterministic within-stratum order).
# --------------------------------------------------------------------------
@register(
    "q38_stratified_quota_sample",
    covers=("P10", "W4"),
    oracle="""
WITH q AS (
  SELECT source, CAST(5 + ord(substr(md5(source), 1, 1)) % 7 AS INT) AS quota
  FROM (SELECT DISTINCT source FROM documents)
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS samp_rank
  FROM documents
)
SELECT r.doc_id, r.source, r.samp_rank, q.quota
FROM r JOIN q USING (source)
WHERE r.samp_rank <= q.quota
""",
)
def q38_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling for training-mixture construction —
    the deterministic-count complement to q58's hash-fraction resample:
    each source contributes exactly min(quota, count) documents, chosen by
    a content-stable md5 order so the sample is uniform within stratum and
    byte-reproducible across runs/engines/partitionings.  Quotas come from
    a broadcast (stratum, quota) spec (derived here from the source hash;
    in production the output of a mixture solver).  ONE shuffle — the
    per-stratum ranking window; quota join is broadcast."""
    from briefly_spark.operators.textstats import stratified_sample

    docs = spread(load_table(spark, sf_dir, "documents"))
    quotas = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.lit(5) + F.ascii(F.substring(F.md5("source"), 1, 1)) % 7)
            .cast("int")
            .alias("quota"),
        )
    )
    samp = stratified_sample(
        docs.select("doc_id", "source"), quotas, stratum_col="source", id_col="doc_id"
    )
    return samp.select("doc_id", "source", "samp_rank", "quota")


# --------------------------------------------------------------------------
# q39 — C4-style line filters + cross-corpus boilerplate line removal.
# --------------------------------------------------------------------------
@register(
    "q39_line_boilerplate_filter",
    covers=("F5", "P7"),
    oracle=r"""
WITH raw AS (
  SELECT doc_id,
         'Intro ' || substr(text, 1, 30) || '.' || chr(10) ||
         'Accept cookies to continue.' || chr(10) ||
         'Body ' || substr(text, 31, 60) || '.' || chr(10) ||
         'OK.' || chr(10) ||
         'tag ' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 2 = 0
              THEN chr(10) || 'Subscribe to our newsletter today.' ELSE '' END AS t
  FROM documents
),
lines AS (
  SELECT doc_id, u['pos'] AS pos, u['line'] AS line
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(t, chr(10)),
                                 (x, i) -> struct_pack(pos := i - 1, line := x))) AS u
    FROM raw
  )
),
cand AS (
  SELECT doc_id, pos, line, md5(line) AS lk
  FROM lines
  WHERE len(list_filter(string_split_regex(line, '\s+'), w -> w <> '')) >= 3
    AND regexp_matches(line, '[.!?]$')
),
boiler AS (
  SELECT lk FROM cand GROUP BY lk HAVING count(DISTINCT doc_id) >= 10
)
SELECT doc_id,
       array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
       count(*) AS n_kept
FROM cand
WHERE lk NOT IN (SELECT lk FROM boiler)
GROUP BY doc_id
""",
)
def q39_line_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-granularity curation (C4 §2.1 / RefinedWeb line filters),
    complementing the document-granularity Gopher rules (q55): per-line
    keep rules (≥3 words, terminal punctuation) run map-side; lines
    surviving the rules but occurring in ≥10 distinct documents are
    corpus-wide boilerplate (the planted cookie banner on every doc and
    the newsletter prompt on evens) and are removed everywhere via a
    broadcast anti-join on md5(line) — line text never rides the counting
    shuffle.  Multi-line text is synthesized deterministically per
    document: two unique content lines (kept), a too-short line and an
    unpunctuated tag line (per-line rules), and the two planted
    boilerplate lines (cross-doc rule)."""
    from briefly_spark.operators.textstats import remove_boilerplate_lines

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.concat(
        F.lit("Intro "), F.substring("text", 1, 30), F.lit(".\n"),
        F.lit("Accept cookies to continue.\n"),
        F.lit("Body "), F.substring("text", 31, 60), F.lit(".\n"),
        F.lit("OK.\n"),
        F.lit("tag "), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("\nSubscribe to our newsletter today."))
        .otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", t.alias("t"))
    out = remove_boilerplate_lines(
        staged, id_col="doc_id", text_col="t", min_words=3, min_docs=10
    )
    return out.select(F.col("id").alias("doc_id"), "clean_text", "n_kept")


# --------------------------------------------------------------------------
# q66 — curriculum bucketing by corpus-wide quality percentiles.
# --------------------------------------------------------------------------
@register(
    "q66_curriculum_buckets",
    covers=("P7", "A3"),
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
q AS (SELECT doc_id, ({_SQL_QUALITY}) AS qual FROM t),
c AS (SELECT quantile_cont(qual, [0.25, 0.5, 0.75]) AS cuts FROM q)
SELECT doc_id,
       floor(qual * 10000) / 10000.0 AS quality,
       CAST(CASE WHEN qual < cuts[1] THEN 0
                 WHEN qual < cuts[2] THEN 1
                 WHEN qual < cuts[3] THEN 2
                 ELSE 3 END AS INT) AS bucket
FROM q, c
""",
)
def q66_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/quality-tier assignment: every document lands in a
    quartile bucket of the CORPUS-WIDE quality distribution — the ordering
    key for curriculum schedules and the partition key for quality-tiered
    mixtures.  Two passes by nature (global cutoffs, then assignment): the
    cutoff aggregate collapses to ONE broadcast row, so assignment is
    map-side; quality is the exact `percentile` here (hash-mirrorable
    against DuckDB quantile_cont — same linear interpolation), and at
    100 TB the cutoff pass swaps to the GK sketch already used by q74
    (identical plan shape, one broadcast row either way)."""
    from briefly_spark.operators.textstats import quality_score

    docs = spread(load_table(spark, sf_dir, "documents"))
    q = docs.select("doc_id", quality_score(F.col("text")).alias("qual"))
    cuts = q.agg(F.expr("percentile(qual, array(0.25D, 0.5D, 0.75D))").alias("cuts"))
    qc = q.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("qual") < F.element_at("cuts", 1), F.lit(0))
        .when(F.col("qual") < F.element_at("cuts", 2), F.lit(1))
        .when(F.col("qual") < F.element_at("cuts", 3), F.lit(2))
        .otherwise(F.lit(3))
    )
    return qc.select(
        "doc_id", trunc4(F.col("qual")).alias("quality"), bucket.cast("int").alias("bucket")
    )


# --------------------------------------------------------------------------
# q67 — exact token-budget packing with document spanning.
# --------------------------------------------------------------------------
@register(
    "q67_pack_exact",
    covers=("W4", "A3"),
    oracle=r"""
WITH t AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS toks
  FROM documents
),
c AS (
  SELECT source, doc_id, toks,
         CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS start
  FROM t WHERE toks > 0
),
s AS (
  SELECT source, doc_id, toks, start,
         unnest(range(start // 512, (start + toks - 1) // 512 + 1)) AS bin
  FROM c
)
SELECT source, doc_id, bin,
       greatest(start, bin * 512) - start AS offset,
       least(start + toks, (bin + 1) * 512) - greatest(start, bin * 512) AS take
FROM s
""",
)
def q67_pack_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence assembly with document spanning: every bin holds
    EXACTLY 512 tokens (except each source's last) because documents
    straddling a boundary are sliced — (doc, bin, offset, take) rows say
    which token range of each document feeds which sequence.  Upgrade of
    q59's whole-document bins (which overflow by up to one document); same
    single per-group running-sum window, plus a bin-band explode bounded
    by corpus tokens / budget."""
    from briefly_spark.operators.textstats import pack_sequences_exact

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("source", "doc_id", word_count(F.col("text")).alias("toks"))
    return pack_sequences_exact(
        t, group_col="source", order_col="doc_id", tokens_col="toks", budget=512
    ).select("source", "doc_id", "bin", "offset", "take")


# --------------------------------------------------------------------------
# q68 — group-leakage-safe splits (whole domains share a split).
# --------------------------------------------------------------------------
@register(
    "q68_group_split",
    covers=("P7", "A4"),
    oracle=f"""
SELECT source,
       CASE WHEN {_sql_hash16('source')} % 100 < 5 THEN 'val'
            WHEN {_sql_hash16('source')} % 100 < 10 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs
FROM documents
GROUP BY source
""",
)
def q68_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split hash is keyed on
    the GROUP (source/domain), not the document, so every document of a
    domain lands in the same split — near-duplicates and templated pages
    within one domain can never straddle train and test (the contamination
    q57's per-document split permits).  Same content-stable hash16 bucket,
    same stability under re-runs/appends; one partial-agg shuffle keyed on
    source, split derived map-side from the grouping key."""
    from briefly_spark.operators.textstats import hash_split

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("source", hash_split(F.col("source")).alias("split"), "n_docs")
    )


# --------------------------------------------------------------------------
# q69 — packed-sequence ASSEMBLY: materialize the actual training sequences.
# --------------------------------------------------------------------------
@register(
    "q69_pack_assemble",
    covers=("W4", "A3", "F8"),
    oracle=r"""
WITH t AS (
  SELECT source, doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
),
c AS (
  SELECT source, doc_id, ws, len(ws) AS toks,
         CAST(sum(len(ws)) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - len(ws) AS BIGINT) AS start
  FROM t WHERE len(ws) > 0
),
s AS (
  SELECT source, doc_id, ws, toks, start,
         unnest(range(start // 512, (start + toks - 1) // 512 + 1)) AS bin
  FROM c
),
j AS (
  SELECT source, doc_id, bin,
         greatest(start, bin * 512) - start AS off,
         least(start + toks, (bin + 1) * 512) - greatest(start, bin * 512) AS take,
         ws
  FROM s
)
SELECT source, bin,
       string_agg(array_to_string(list_slice(ws, off + 1, off + take), ' '), ' ' ORDER BY doc_id) AS seq_text,
       CAST(sum(take) AS BIGINT) AS bin_tokens
FROM j GROUP BY source, bin
""",
)
def q69_pack_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end sequence assembly: q67's (doc, bin, offset, take) slices
    joined back to the tokenized documents and concatenated per bin —
    emitting the ACTUAL training-sequence text, exactly 512 tokens per
    non-final bin, with straddling documents contributing their head to
    one sequence and tail to the next.  The corpus is scanned and
    tokenized ONCE: the token array rides through the pack window (the
    operator preserves input columns), so there is no second scan and no
    slice-to-array join — the only shuffles are the per-group window and
    the final per-bin aggregation, both bounded by corpus tokens; per-bin
    order is restored by sorting (doc_id) structs inside the aggregate —
    no global sort."""
    from briefly_spark.operators.textstats import pack_sequences_exact, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("source", "doc_id", tokens(F.col("text")).alias("ws")).withColumn(
        "toks", F.size("ws").cast("long")
    )
    slices = pack_sequences_exact(
        words, group_col="source", order_col="doc_id", tokens_col="toks", budget=512
    )
    parts = slices.select(
        "source",
        "bin",
        "doc_id",
        "take",
        F.concat_ws(
            " ", F.slice(F.col("ws"), F.col("offset").cast("int") + 1, F.col("take").cast("int"))
        ).alias("part"),
    )
    return parts.groupBy("source", "bin").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "part"))),
                lambda s: s["part"],
            ),
            " ",
        ).alias("seq_text"),
        F.sum("take").alias("bin_tokens"),
    )


# --------------------------------------------------------------------------
# q114 — temperature-balanced mixture (alpha-sampling, α = 1/2).
# --------------------------------------------------------------------------
_Q114_BUDGET = 200


@register(
    "q114_temperature_mixture",
    covers=("P10", "A4", "W4"),
    oracle=f"""
WITH n AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
s AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1048576.0) AS BIGINT) AS s_fp
  FROM n
),
q AS (
  SELECT source, n_docs, s_fp,
         -- outer CAST: sum(s_fp) widens to HUGEINT in DuckDB, infecting the
         -- // result and greatest(); HUGEINT fetches as Decimal/float64 and
         -- breaks the value-hash vs Spark's long.
         CAST(greatest(CAST(1 AS BIGINT),
                  ({_Q114_BUDGET} * s_fp) // (SELECT sum(s_fp) FROM s))
              AS BIGINT) AS quota
  FROM s
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS samp_rank
  FROM documents
)
SELECT r.doc_id, r.source, q.n_docs, q.quota
FROM r JOIN q USING (source)
WHERE r.samp_rank <= q.quota
""",
)
def q114_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual
    "alpha sampling" of mBERT/XLM-R, α = 1/2): source quotas proportional
    to n_i^α flatten the head and lift the tail, then the selection is
    the q38 content-stable md5-rank draw.  Engine-exactness without
    det_ln: n^(1/2) is IEEE ``sqrt``, which (unlike library ln/exp/pow)
    is CORRECTLY ROUNDED by both engines, so floor(sqrt(n)·2^20) is a
    bit-identical integer weight; quotas are integer floor-division
    shares of the budget.  Plan: the source-count frame is
    dimension-sized, its sqrt-share quota computation collapses to a
    broadcast, and the only corpus shuffle is the per-source ranking
    window (AQE splits hot sources)."""
    from briefly_spark.operators.textstats import stratified_sample

    docs = spread(load_table(spark, sf_dir, "documents"))
    n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    s = n.withColumn(
        "s_fp",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1048576.0).cast("long"),
    )
    tot = s.agg(F.sum("s_fp").alias("tot_fp"))
    quotas = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"CAST({_Q114_BUDGET} * s_fp AS BIGINT) div tot_fp"),
            ).alias("quota"),
        )
    )
    samp = stratified_sample(
        docs.select("doc_id", "source"), quotas, stratum_col="source", id_col="doc_id"
    )
    return samp.select("doc_id", "source", "n_docs", "quota")
