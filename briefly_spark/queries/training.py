"""q83–q89 — training-corpus curation and assembly: exact duplicate-span
removal, DSIR importance weights + selection + token-budget fill,
SemDeDup semantic dedup, vocabulary build + token-id encoding, and the
end-to-end curation funnel.

These are the curation stages a 100 TB LLM-data pipeline runs *after*
candidate near-dup detection (q30–q37) and quality filtering (q50–q56):
trim exact repeated content at sub-document granularity
(Lee et al. 2022), weight documents toward a target distribution and
select accordingly (Xie et al. 2023, DSIR), and drop semantically
redundant documents that no lexical method catches (Abbas et al. 2023,
SemDeDup).  All are oracle-gated end-to-end; every score surface is
fixed-point integer arithmetic (numerics.det_ln_sql / trunc4), so
hashes are engine-exact.

Reference parity note: the reference has no corpus-curation stage (its
dedup is the per-url anti-join, crawler/article_crawler.py) — this module
is part of the beyond-reference training-data surface SURVEY §2.10 calls
for, same tier as q30–q59.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.operators.curation import (
    dsir_log_weights,
    kmeans_refine,
    semantic_dedup,
    span_dedup,
    sql_dsir_weights,
)
from briefly_spark.queries import register

# ---------------------------------------------------------------------------
# q83 — keep-first exact duplicate-span removal.
# ---------------------------------------------------------------------------
_SPAN_W = 8

#: shared WITH-body for the span-dedup pipeline (q83 + the q87 funnel)
def sql_span_ctes(src: str = "documents") -> str:
    """The q83 span-dedup CTE chain over an arbitrary (doc_id, text)
    source — shared with the q128 jobs-DAG gate, whose curate stage must
    drain to exactly this one-shot answer (the incremental≡one-shot pin
    in tests/test_streaming.py)."""
    return _SQL_SPAN_CTES.replace("FROM documents\n", f"FROM {src}\n", 1)


_SQL_SPAN_CTES = f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS widx,
         array_to_string(t[(CAST(i AS INT) * {_SPAN_W} + 1):(CAST(i AS INT) * {_SPAN_W} + {_SPAN_W})], ' ') AS span,
         CAST(ceil(len(t) / {_SPAN_W}.0) AS INT) AS n_spans
  FROM toks, UNNEST(range(CAST(ceil(len(t) / {_SPAN_W}.0) AS BIGINT))) AS u(i)
),
firsts AS (
  SELECT span, min(doc_id * 1000000 + widx) AS first_key FROM spans GROUP BY span
),
kept AS (
  SELECT s.doc_id, s.widx, s.span, s.n_spans
  FROM spans s JOIN firsts f ON s.span = f.span
  WHERE s.doc_id * 1000000 + s.widx = f.first_key
)"""

@register(
    "q83_span_dedup",
    covers=("P5", "U4"),
    oracle=f"""
WITH {_SQL_SPAN_CTES}
SELECT doc_id, min(n_spans) AS n_spans, count(*) AS n_kept,
       md5(string_agg(span, ' ' ORDER BY widx)) AS clean_md5
FROM kept GROUP BY doc_id
""",
)
def q83_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span removal (fixed-window approximation of
    suffix-array exact-substring dedup, Lee et al. 2022): every distinct
    8-token span survives once, at its earliest (doc_id, window) position;
    later occurrences — boilerplate, quotations, wholesale doc copies —
    are trimmed.  Docs reduced to nothing (pure duplicates of earlier
    docs) drop out entirely.  Differs from q39 (boilerplate removal, which
    deletes ALL copies of corpus-frequent lines): here exactly one copy is
    kept, preserving corpus information mass.  The cleaned text is
    md5-pinned to keep the hash surface compact.

    Scale: first-occurrence is a map-side-combinable min-groupBy on the
    span (a span present in every doc partial-aggregates — no hot window
    partition); the keep decision is an AQE-skew-splittable self-equi-join;
    reassembly is one per-doc aggregation with in-aggregate struct sort."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = span_dedup(docs, id_col="doc_id", text_col="text", span_tokens=_SPAN_W)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_spans",
        "n_kept",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# q131 — ANY-length exact duplicate-substring dedup (Lee et al. 2022
# ExactSubstr; the rung q83's fixed windows approximate).  VERDICT r08 #5.
# ---------------------------------------------------------------------------
_SUB_L = 8  # minimum repeated-substring length in tokens (aligned with q83)

#: shared head: token arrays + overlapping md5 L-shingles
_SUB_HEAD = f"""stoks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, CAST(i AS INT) AS p,
         md5(array_to_string(
           t[(CAST(i AS INT) + 1):(CAST(i AS INT) + {_SUB_L})], ' ')) AS h
  FROM stoks, UNNEST(range(greatest(len(t) - {_SUB_L} + 1, 0))) AS u(i)
)"""

#: shared tail CTEs: interval merge + run stats + rebuild over a `ds`
#: CTE of (doc_id, p) covered window starts — q131 (remove-all), q133
#: (keep-first) and q135 (train↔eval overlap) differ ONLY in how ds is
#: derived (and q135 in its final projection)
_SUB_TAIL_CTES = f"""dsx AS MATERIALIZED (
  SELECT doc_id, p,
         max(p + {_SUB_L} - 1) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM ds
),
dsr AS (
  SELECT doc_id, p, prev_end,
         sum(CASE WHEN prev_end IS NULL OR prev_end < p - 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM dsx
),
runlens AS (
  SELECT doc_id, run_id,
         max(p) + {_SUB_L} - 1 - min(p) + 1 AS run_len
  FROM dsr GROUP BY doc_id, run_id
),
maxrun AS (
  SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run_len
  FROM runlens GROUP BY doc_id
),
stats AS (
  SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
         CAST(sum(CASE WHEN x.prev_end IS NULL OR x.prev_end < x.p - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
         CAST(sum((x.p + {_SUB_L} - 1)
                  - greatest(coalesce(x.prev_end, -1), x.p - 1)) AS BIGINT)
           AS n_covered
  FROM dsx x GROUP BY x.doc_id
),
cov AS (
  SELECT DISTINCT doc_id, p + CAST(j AS INT) AS tp
  FROM ds, UNNEST(range({_SUB_L})) AS v(j)
),
tokpos AS (
  SELECT doc_id, CAST(i AS INT) AS tp, t[CAST(i AS INT) + 1] AS w
  FROM stoks, UNNEST(range(len(t))) AS u(i)
),
clean AS (
  SELECT k.doc_id, string_agg(k.w, ' ' ORDER BY k.tp) AS clean_text
  FROM tokpos k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tp = c.tp
  WHERE c.tp IS NULL GROUP BY k.doc_id
)"""

#: shared final projection over the tail CTEs
_SUB_FINAL = """SELECT s.doc_id, CAST(len(s.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(st.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(st.n_runs, 0) AS BIGINT) AS n_runs,
       CAST(coalesce(st.n_covered, 0) AS BIGINT) AS n_covered,
       CAST(coalesce(m.max_run_len, 0) AS BIGINT) AS max_run_len,
       md5(coalesce(c.clean_text, '')) AS clean_md5
FROM stoks s
LEFT JOIN stats st USING (doc_id)
LEFT JOIN maxrun m USING (doc_id)
LEFT JOIN clean c USING (doc_id)"""

_SUB_TAIL = _SUB_TAIL_CTES + "\n" + _SUB_FINAL

_Q131_ORACLE = f"""WITH {_SUB_HEAD},
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2),
ds AS MATERIALIZED (
  SELECT s.doc_id, s.p FROM sh s JOIN dup d USING (h)
),
{_SUB_TAIL}"""

_Q133_ORACLE = f"""WITH {_SUB_HEAD},
firsts AS (
  SELECT h, min(doc_id * 1000000 + p) AS first_key FROM sh GROUP BY h
),
ds AS MATERIALIZED (
  SELECT s.doc_id, s.p FROM sh s JOIN firsts f USING (h)
  WHERE s.doc_id * 1000000 + s.p > f.first_key
),
{_SUB_TAIL}"""


@register("q131_exact_substring_dedup", covers=("P5",), oracle=_Q131_ORACLE)
def q131_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY-length exact duplicate-substring dedup — the true Lee et al.
    2022 ExactSubstr semantics q83's fixed windows approximate, computed
    WITHOUT a suffix array: a token sits inside a corpus-repeated
    substring of length >= 8 iff some repeated overlapping 8-shingle
    covers it (see operators/curation.py:substring_coverage for the
    equivalence proof), so duplicated-region detection reduces to one
    shingle-count groupBy plus a per-doc interval merge — Spark-shaped
    and exactly equal to the suffix-array removal set.  Per doc: token
    count, repeated-window count, number of maximal repeated substrings,
    tokens covered, the LONGEST repeated substring in tokens (the
    contamination-triage signal: ~500 means wholesale copy, ~8 means a
    boilerplate phrase), and the md5 of the text with every repeated
    region cut (the paper's remove-all-copies variant; q83 remains the
    keep-first rung).

    Scale: window text never shuffles (md5 keys); the dup test is a
    partial-aggregable count; the interval merge windows over sparse dup
    starts only, partitioned by doc; rebuild is the q83 reassembly.  No
    quadratic stage, no driver loop."""
    from briefly_spark.operators.curation import substring_coverage

    docs = spread(load_table(spark, sf_dir, "documents"))
    out = substring_coverage(docs, id_col="doc_id", text_col="text", min_tokens=_SUB_L)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_dup_windows",
        "n_runs",
        "n_covered",
        "max_run_len",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


@register("q133_substring_dedup_keepfirst", covers=("P5", "U4"), oracle=_Q133_ORACLE)
def q133_substring_dedup_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEP-FIRST any-length substring dedup — q131's information-
    preserving sibling and the one-shot anchor for the INCREMENTAL form:
    a window occurrence is cut iff the same 8-shingle occurs at a
    strictly smaller (doc, position) key, so the earliest occurrence of
    every repeated substring survives and every later copy is removed
    (cut(o) ⇔ min_okey < okey — no global count, which is exactly why
    this form folds batch-by-batch against a shingle registry with zero
    retroactive updates; operators/curation.py:
    substring_dedup_incremental, batch≡one-shot pytest-pinned).  Same
    per-doc surface as q131 with n_dup_windows counting CUT occurrences.

    Scale: the dup test is a partial-aggregable min-groupBy on the md5
    shingle key (hot boilerplate combines map-side) + one equi-join;
    everything downstream is q131's sparse interval merge."""
    from briefly_spark.operators.curation import substring_dedup_keepfirst

    docs = spread(load_table(spark, sf_dir, "documents"))
    out = substring_dedup_keepfirst(
        docs, id_col="doc_id", text_col="text", min_tokens=_SUB_L
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_dup_windows",
        "n_runs",
        "n_covered",
        "max_run_len",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


_Q134_ORACLE = f"""WITH {_SUB_HEAD},
firsts AS (
  SELECT h, min(doc_id * 1000000 + p) AS first_key FROM sh GROUP BY h
),
cuts AS (
  SELECT s.doc_id AS cutter_id, CAST(f.first_key // 1000000 AS BIGINT) AS origin_id
  FROM sh s JOIN firsts f USING (h)
  WHERE s.doc_id * 1000000 + s.p > f.first_key
),
srcs AS (SELECT doc_id, source FROM documents)
SELECT o.source AS origin_source, c.source AS cutter_source,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(DISTINCT k.cutter_id) AS BIGINT) AS n_cutter_docs,
       CAST(count(DISTINCT k.origin_id) AS BIGINT) AS n_origin_docs
FROM cuts k
JOIN srcs o ON k.origin_id = o.doc_id
JOIN srcs c ON k.cutter_id = c.doc_id
GROUP BY o.source, c.source"""


@register("q134_duplication_flow", covers=("A4", "J3"), oracle=_Q134_ORACLE)
def q134_duplication_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication PROVENANCE matrix — who copies whom: every keep-first
    CUT window occurrence (q133 semantics) is attributed to the SOURCE of
    its earliest occurrence, yielding the (origin_source, cutter_source)
    flow with window mass and distinct doc counts on both ends — the
    report a corpus owner reads to find the syndication/mirror/boilerplate
    channels BEFORE deciding which feeds to drop (diagonal = within-source
    self-copying, off-diagonal = cross-source plagiarism/syndication).

    Scale: the cut frame is the q133 postings-shaped join (md5 keys,
    window text never shuffles); origin ids come FREE from the claimed
    first_key (integer div — no third scan); the two source hydrations
    are thin (doc_id, source) equi-joins; output is |sources|² rows.
    count(DISTINCT) partial-aggregates per group — exact, engine-exact."""
    from briefly_spark.operators.curation import _substring_windows
    from briefly_spark.operators.curation import _WIDX_STRIDE

    docs = spread(load_table(spark, sf_dir, "documents"))
    _toks, _staged, sh = _substring_windows(docs, "doc_id", "text", _SUB_L)
    sh = sh.withColumn("okey", F.col("id") * _WIDX_STRIDE + F.col("p"))
    firsts = sh.groupBy("h").agg(F.min("okey").alias("first_key"))
    cuts = (
        sh.join(firsts, "h")
        .filter(F.col("okey") > F.col("first_key"))
        .select(
            F.col("id").alias("cutter_id"),
            F.expr(f"CAST(first_key div {_WIDX_STRIDE} AS BIGINT)").alias("origin_id"),
        )
    )
    srcs = docs.select("doc_id", "source")
    return (
        cuts.join(
            srcs.select(
                F.col("doc_id").alias("origin_id"),
                F.col("source").alias("origin_source"),
            ),
            "origin_id",
        )
        .join(
            srcs.select(
                F.col("doc_id").alias("cutter_id"),
                F.col("source").alias("cutter_source"),
            ),
            "cutter_id",
        )
        .groupBy("origin_source", "cutter_source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.countDistinct("cutter_id").cast("long").alias("n_cutter_docs"),
            F.countDistinct("origin_id").cast("long").alias("n_origin_docs"),
        )
    )


_Q135_ORACLE = f"""WITH {_SUB_HEAD},
trainh AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 <> 0),
ds AS MATERIALIZED (
  SELECT s.doc_id, s.p FROM sh s JOIN trainh t USING (h)
  WHERE s.doc_id % 50 = 0
),
{_SUB_TAIL_CTES}
SELECT v.doc_id, v.n_tokens,
       v.n_dup_windows AS n_shared_windows, v.n_runs, v.n_covered,
       v.max_run_len, v.clean_md5,
       CAST(CASE WHEN v.n_tokens = 0 THEN NULL
                 ELSE (v.n_covered * 10000) // v.n_tokens END AS BIGINT)
         AS overlap_fp
FROM ({_SUB_FINAL}) v
WHERE v.doc_id % 50 = 0"""


@register("q135_eval_overlap_exact", covers=("P5", "J3"), oracle=_Q135_ORACLE)
def q135_eval_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train↔eval EXACT-SUBSTRING contamination report (Lee et al. 2022
    §6.2's train-test overlap, at substring rather than whole-doc
    granularity; the q36/q97 shingle/Bloom decontamination rungs answer
    "does this eval doc overlap AT ALL" — this answers WHERE and HOW
    MUCH): for every benchmark doc (the standing doc_id % 50 = 0 eval
    slice), the tokens covered by >=8-token substrings that also appear
    in the training split, the number and longest of those shared
    regions, the fixed-point overlap fraction, and the md5 of the eval
    text with every contaminated region cut — i.e. the decontaminated
    eval set AND its audit trail in one pass.

    Scale: train shingles collapse to a DISTINCT hash set (partial-agg);
    eval windows (2% of the corpus) semi-join it — postings-shaped,
    md5 keys only; coverage is the q131 sparse interval merge over eval
    docs alone."""
    from briefly_spark.operators.curation import (
        contamination_registry_delta,
        decontaminate_incremental,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % 50 == 0
    trainh = contamination_registry_delta(
        docs.filter(~is_eval), id_col="doc_id", text_col="text", min_tokens=_SUB_L
    )
    out = decontaminate_incremental(
        docs.filter(is_eval), trainh, id_col="doc_id", text_col="text", min_tokens=_SUB_L
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.col("n_dup_windows").alias("n_shared_windows"),
        "n_runs",
        "n_covered",
        "max_run_len",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(n_covered * 10000) div n_tokens"))
        .cast("long")
        .alias("overlap_fp"),
    )


# ---------------------------------------------------------------------------
# q84 — DSIR importance weights toward an English target distribution.
# ---------------------------------------------------------------------------
_DSIR_B = 4096

@register(
    "q84_dsir_weights",
    covers=("A4", "P7"),
    oracle=f"""
SELECT id AS doc_id, n_bigrams, weight_fp
FROM ({sql_dsir_weights("SELECT doc_id AS id, text, lang FROM documents", "lang = 'en'", _DSIR_B)})
""",
)
def q84_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023): score every
    document by the log-likelihood ratio between the target distribution
    (here: the English sub-corpus) and the raw corpus, over 4096 hashed
    bigram features with add-one smoothing.  Positive weight ⇒ the doc
    looks more like the target than like the average of the corpus;
    resampling ∝ exp(weight) selects pretraining data matching the target
    domain.  weight_fp is the exact integer fixed-point (nats × 10⁴) —
    every log is the bit-reproducible det_ln, fixed-pointed BEFORE any
    sum, so the weight is an order-independent integer in any engine.

    Scale: the feature table is ≤4096 rows whatever the corpus size (one
    partial-agg shuffle, then broadcast); totals fold to one broadcast
    row; per-doc scoring is explode + broadcast join + one doc-id agg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = dsir_log_weights(
        docs,
        id_col="doc_id",
        text_col="text",
        target=F.col("lang") == "en",
        n_buckets=_DSIR_B,
    )
    return out.select(F.col("id").alias("doc_id"), "n_bigrams", "weight_fp")


# ---------------------------------------------------------------------------
# q85 — SemDeDup over IVF-style coarse cells.
# ---------------------------------------------------------------------------
_SEM_CELLS = 16
_SEM_TAU = 0.99

@register(
    "q85_semantic_dedup",
    covers=("J4", "P5"),
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) + CASE WHEN i = 1 THEN 0.1 ELSE 0 END) AS v
  FROM embeddings
),
c AS (
  SELECT id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS n FROM corpus
),
cent AS (
  SELECT id AS cell_id, v AS cv, n AS cvn
  FROM c ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {_SEM_CELLS}
),
asg AS (
  SELECT id, cell_id, v, n FROM (
    SELECT c.id, cent.cell_id, c.v, c.n,
           row_number() OVER (
             PARTITION BY c.id
             ORDER BY (CASE WHEN c.n > 0 AND cent.cvn > 0
               THEN list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * cent.cv[i])) / (c.n * cent.cvn)
               ELSE 0.0 END) DESC, cent.cell_id ASC) AS crk
    FROM c CROSS JOIN cent
  ) WHERE crk = 1
),
dups AS (
  SELECT DISTINCT b.id
  FROM asg a JOIN asg b ON a.cell_id = b.cell_id AND a.id < b.id
  WHERE (CASE WHEN a.n > 0 AND b.n > 0
         THEN list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.n * b.n)
         ELSE 0.0 END) >= {_SEM_TAU}
)
SELECT asg.id AS id, asg.cell_id AS cell_id,
       CASE WHEN dups.id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM asg LEFT JOIN dups ON asg.id = dups.id
""",
)
def q85_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): coarse-cluster the embedding space
    (16 seeded-sample cells — the IVF oracle-path centroids), then inside
    each cell mark every member that has a lower-id cell-mate at cosine
    ≥ 0.99 as a semantic duplicate.  The planted perturbed copies (q34's
    +0.1-on-dim-0 twins) are what must be flagged: lexical dedup misses
    them once wording drifts, embeddings don't.  Complements q34: blocking
    there is a label column (metadata), here it is learned geometry — the
    shape that works when no blocking metadata exists.

    Scale: assignment = broadcast cross join vs 16 centroids + per-id
    max(struct) argmax (map-side combine, no per-id sort); the quadratic
    verify with a Cauchy–Schwarz head/tail prune is bounded within cells
    (n_cells is the cost knob); dup set rides an id equi-join."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    orig = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") + F.when(i == 0, F.lit(0.1)).otherwise(F.lit(0.0)),
        ).alias("v"),
    )
    corpus = orig.unionByName(pert)
    return semantic_dedup(
        corpus, id_col="id", vec_col="v", n_cells=_SEM_CELLS, threshold=_SEM_TAU
    )


# ---------------------------------------------------------------------------
# q86 — DSIR selection: the resampling step the weights exist for.
# ---------------------------------------------------------------------------
#: shared WITH-body for the DSIR rank/select pipeline (q86 + the q87 funnel)
_SQL_DSIR_RANKED = f"""w AS (
  SELECT id AS doc_id, weight_fp
  FROM ({sql_dsir_weights("SELECT doc_id AS id, text, lang FROM documents", "lang = 'en'", _DSIR_B)})
),
ranked AS (
  SELECT d.doc_id, d.source, w.weight_fp,
         CAST(row_number() OVER (
           PARTITION BY d.source ORDER BY w.weight_fp DESC, d.doc_id ASC
         ) AS INT) AS rk,
         count(*) OVER (PARTITION BY d.source) AS n_src
  FROM documents d JOIN w ON d.doc_id = w.doc_id
)"""

@register(
    "q86_dsir_select",
    covers=("P10", "A4"),
    oracle=f"""
WITH {_SQL_DSIR_RANKED}
SELECT doc_id, source, weight_fp, rk
FROM ranked WHERE rk <= (n_src + 3) // 4
""",
)
def q86_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection — the step the importance weights exist for: keep
    the top ceil(25%) of documents PER SOURCE by DSIR weight (ties to the
    lower doc_id).  Stratifying by source keeps the selection from
    collapsing onto one domain the way a global top-k would; composing
    with q58's mixture rates gives weighted-domain selection.  Everything
    on the hash surface is integer (weight_fp, rank, ceil-div quota), so
    selection is engine- and re-run-exact.

    Scale: q84's weighting plan, then ONE shuffle on source serving both
    the ranking and the per-source count window; the quartile cut is a
    per-row integer comparison."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return _dsir_selected(docs).select("doc_id", "source", "weight_fp", "rk")


def _dsir_selected(docs: DataFrame) -> DataFrame:
    """Per-source DSIR top-quartile (the q86 plan, shared with q87)."""
    from pyspark.sql import Window

    weights = dsir_log_weights(
        docs,
        id_col="doc_id",
        text_col="text",
        target=F.col("lang") == "en",
        n_buckets=_DSIR_B,
    ).select(F.col("id").alias("doc_id"), "weight_fp")
    ranked = (
        docs.select("doc_id", "source")
        .join(weights, "doc_id")
        .withColumn(
            "rk",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.desc("weight_fp"), F.asc("doc_id")
                )
            )
            .cast("int"),
        )
        .withColumn(
            "n_src",
            F.count(F.lit(1)).over(Window.partitionBy("source")),
        )
    )
    return ranked.filter(F.expr("rk <= (n_src + 3) div 4"))


# ---------------------------------------------------------------------------
# q87 — end-to-end curation funnel (composition capstone).
# ---------------------------------------------------------------------------
_FUNNEL_MIN_CHARS = 100

@register(
    "q87_curation_funnel",
    covers=("A3", "P5"),
    oracle=f"""
WITH {_SQL_SPAN_CTES},
clean AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY widx) AS clean_text
  FROM kept GROUP BY doc_id
),
{_SQL_DSIR_RANKED},
sel AS (SELECT doc_id FROM ranked WHERE rk <= (n_src + 3) // 4)
SELECT count(*) AS n_input,
       count(c.doc_id) AS n_span_dedup,
       CAST(sum(CASE WHEN len(c.clean_text) >= {_FUNNEL_MIN_CHARS} THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
       CAST(sum(CASE WHEN len(c.clean_text) >= {_FUNNEL_MIN_CHARS} AND s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
FROM documents d
LEFT JOIN clean c ON d.doc_id = c.doc_id
LEFT JOIN sel s ON d.doc_id = s.doc_id
""",
)
def q87_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel — the composition the pack exists for,
    as ONE oracle-gated report: input docs → survivors of keep-first span
    dedup (q83) → survivors of a post-dedup length gate on the CLEANED
    text (dedup first, then quality: boilerplate must not count toward
    length) → survivors also in the DSIR per-source top quartile (q86).
    Funnel counts are the numbers a curation run reports at 100 TB; every
    stage predicate is integer/engine-exact so the row hashes stably.

    Scale: the span-dedup and DSIR sub-plans are q83/q86's unchanged
    (their scale notes apply); the funnel itself adds two id equi-joins
    and a single partial-agg rollup."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    clean = span_dedup(
        docs, id_col="doc_id", text_col="text", span_tokens=_SPAN_W
    ).select(F.col("id").alias("doc_id"), "clean_text")
    sel = _dsir_selected(docs).select("doc_id").withColumn("sel", F.lit(1))
    base = (
        docs.select("doc_id")
        .join(clean, "doc_id", "left")
        .join(sel, "doc_id", "left")
    )
    len_ok = F.length("clean_text") >= _FUNNEL_MIN_CHARS
    return base.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count("clean_text").alias("n_span_dedup"),
        F.sum(F.when(len_ok, 1).otherwise(0)).alias("n_len_ok"),
        F.sum(
            F.when(len_ok & F.col("sel").isNotNull(), 1).otherwise(0)
        ).alias("n_selected"),
    )


# ---------------------------------------------------------------------------
# q88 — vocabulary build + token-id encoding.
# ---------------------------------------------------------------------------
_VOCAB_V = 16

@register(
    "q88_vocab_encode",
    covers=("A1", "F9"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
tok AS (
  SELECT doc_id, CAST(i AS INT) AS pos, t[CAST(i AS INT)] AS w
  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
top AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT {_VOCAB_V}),
vocab AS (
  SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS INT) AS vid
  FROM top
),
enc AS (
  SELECT tok.doc_id, tok.pos, COALESCE(v.vid, 0) AS vid
  FROM tok LEFT JOIN vocab v ON tok.w = v.w
)
SELECT doc_id, count(*) AS n_toks,
       CAST(sum(CASE WHEN vid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       md5(string_agg(CAST(vid AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
FROM enc GROUP BY doc_id
""",
)
def q88_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + token-id encoding — the tokenizer-adjacent step
    between curation and packing: the top-V tokens by corpus frequency
    (ties to the lexicographically smaller token) become ids 1..V, every
    other token maps to the OOV id 0, and each document is encoded as its
    id sequence (md5-pinned) with an OOV count.  q59/q67/q69's packing
    operates on exactly this representation at the design point.

    Scale: token counts are one partial-agg shuffle; top-V is
    TakeOrdered (never a global sort — the ranking window runs on the
    ALREADY-LIMITED V-row frame); the vocab broadcasts into the encode
    join; one per-doc aggregation reassembles the sequence."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).select("doc_id", F.posexplode("t").alias("pos", "w"))
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_VOCAB_V)
    )
    vocab = top.withColumn(
        "vid",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("w")))
        .cast("int"),
    ).select("w", "vid")
    enc = tok.join(F.broadcast(vocab), "w", "left").select(
        "doc_id", "pos", F.coalesce(F.col("vid"), F.lit(0)).alias("vid")
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum(F.when(F.col("vid") == 0, 1).otherwise(0)).alias("n_oov"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vid"))),
                    lambda s: s["vid"].cast("string"),
                ),
                ",",
            )
        ).alias("ids_md5"),
    )


# ---------------------------------------------------------------------------
# q89 — token-budget fill by DSIR rank (greedy assembly).
# ---------------------------------------------------------------------------
_FILL_BUDGET = 500  # tokens per source

@register(
    "q89_dsir_budget_fill",
    covers=("W4", "A4"),
    oracle=f"""
WITH {_SQL_DSIR_RANKED},
toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents
),
cum AS (
  SELECT r.doc_id, r.source, r.weight_fp, t.n_toks,
         CAST(sum(t.n_toks) OVER (
           PARTITION BY r.source
           ORDER BY r.weight_fp DESC, r.doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_toks
  FROM ranked r JOIN toks t ON r.doc_id = t.doc_id
)
SELECT doc_id, source, weight_fp, CAST(n_toks AS BIGINT) AS n_toks, cum_toks
FROM cum WHERE cum_toks <= {_FILL_BUDGET}
""",
)
def q89_dsir_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill by DSIR rank — the assembly op the
    weighting exists to drive at delivery time: walk each source's
    documents from most to least target-like (ties to the lower doc_id)
    and keep documents until the per-source token budget is filled
    (greedy prefix: a document is kept iff the running total INCLUDING it
    fits).  Composes q84's weights with q59's running-sum packing
    discipline; every column on the hash surface is an integer, so the
    fill is engine- and re-run-exact.

    Scale: q84's weighting plan, then ONE shuffle on source serves the
    ordering and the running-sum frame; token counts ride the same rows —
    no second pass over the text."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    weights = dsir_log_weights(
        docs,
        id_col="doc_id",
        text_col="text",
        target=F.col("lang") == "en",
        n_buckets=_DSIR_B,
    ).select(F.col("id").alias("doc_id"), "weight_fp")
    w = Window.partitionBy("source").orderBy(
        F.desc("weight_fp"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        docs.select("doc_id", "source")
        .join(weights, "doc_id")
        .join(toks, "doc_id")
        .withColumn("cum_toks", F.sum("n_toks").over(w).cast("long"))
    )
    return cum.filter(F.col("cum_toks") <= _FILL_BUDGET).select(
        "doc_id",
        "source",
        "weight_fp",
        F.col("n_toks").cast("long").alias("n_toks"),
        "cum_toks",
    )


# ---------------------------------------------------------------------------
# q96 — deterministic Lloyd's k-means over the embedding space.
# ---------------------------------------------------------------------------
_KM_K = 8
_KM_ITERS = 3

_KM_QV_SQL = """
qv AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
  FROM embeddings
),
cent0 AS (SELECT id AS cell, q AS cv FROM qv ORDER BY id LIMIT {k})
""".replace("{k}", str(_KM_K))


def _km_round_sql(prev_cent: str, idx: int, *, final: bool) -> str:
    """One unrolled Lloyd round: scored → argmin assign (→ centroid
    update unless final)."""
    upd = (
        ""
        if final
        else f""",
dims{idx} AS (
  SELECT cell,
         unnest(list_transform(range(1, len(q) + 1),
                j -> {{'dim': j, 'val': q[j]}}), recursive := true)
  FROM assign{idx}
),
cent{idx + 1} AS (
  SELECT cell, list(cval ORDER BY dim) AS cv FROM (
    -- CAST: keeps // on BIGINT (sum(BIGINT) widens to HUGEINT in DuckDB)
    SELECT cell, dim, CAST(SUM(val) AS BIGINT) // COUNT(*) AS cval
    FROM dims{idx} GROUP BY cell, dim
  ) GROUP BY cell
)"""
    )
    return f"""
scored{idx} AS (
  SELECT a.id, a.q, c.cell,
         list_sum(list_transform(range(1, len(a.q) + 1),
                  i -> (a.q[i] - c.cv[i]) * (a.q[i] - c.cv[i]))) AS sq_dist
  FROM qv a CROSS JOIN {prev_cent} c
),
assign{idx} AS (
  SELECT id, q, cell, sq_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY sq_dist, cell) AS rn
    FROM scored{idx}
  ) WHERE rn = 1
){upd}"""


def _kmeans_oracle() -> str:
    # rounds 0..ITERS-1 update centroids; round ITERS is the final assign
    parts = [_KM_QV_SQL.strip().rstrip(",")]
    for i in range(_KM_ITERS):
        parts.append(_km_round_sql(f"cent{i}", i, final=False))
    parts.append(_km_round_sql(f"cent{_KM_ITERS}", _KM_ITERS, final=True))
    return (
        "WITH "
        + ",".join(parts)
        # CAST: list_sum over BIGINT widens to HUGEINT in DuckDB, which
        # fetches as Decimal/float64 and breaks the value-hash vs Spark's
        # long — every hashed surface must be BIGINT.
        + f"\nSELECT id AS vec_id, cell, CAST(sq_dist AS BIGINT) AS sq_dist"
        f" FROM assign{_KM_ITERS}"
    )


@register(
    "q96_kmeans_clusters",
    covers=("A5", "W5"),
    oracle=_kmeans_oracle(),
)
def q96_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round Lloyd's k-means (k=8, 3 update rounds) over the
    embeddings table in integer fixed-point — the engine-exact clustering
    that refines the static sample centroids q85 (SemDeDup) and q43 (IVF)
    coarse-assign against; spark.ml KMeans
    (operators/similarity.py:kmeans_centroids) remains the off-oracle
    alternative.  The oracle unrolls the identical integer rounds as CTE
    stages and hashes the final (vec_id, cell, sq_dist) assignment
    exactly — quantization is floor(x·2²⁰) (bit-exact float→double,
    power-of-two multiply), distances are integer squared L2 with ties to
    the smallest cell id, and centroid updates are truncating integer
    division (Spark ``div`` ≡ DuckDB ``//``, verified truncation in
    both).  Per round: a broadcast map-only assignment plus a (cell, dim)
    partial-agg shuffle of k·d groups — corpus-size-independent shuffle
    volume (see operators/curation.py:kmeans_refine)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    out = kmeans_refine(
        emb, id_col="vec_id", vec_col="embedding", k=_KM_K, iters=_KM_ITERS
    )
    return out.select(F.col("id").alias("vec_id"), "cell", "sq_dist")


# --------------------------------------------------------------------------
# q109 — bounded-round BPE vocabulary training (tokenizer training).
# --------------------------------------------------------------------------
_BPE_ROUNDS = 8


def _bpe_ctes(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled DuckDB replay of the BPE driver loop: each round is a CTE
    trio (pair counts -> argmax -> merge via replace with scalar
    subqueries), so the data-dependent merge choice stays INSIDE the
    static SQL and the full training run is hash-gated.  The sym chain
    carries ``word`` so consumers can read off the per-word encoding
    (q126); q109 selects only the merge arms."""
    parts = [r"""
WITH words AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              w -> w <> '')) AS word
    FROM documents)
  GROUP BY word
),
sym0 AS MATERIALIZED (SELECT word, freq, ' ' || regexp_replace(word, '(.)', '\1  ', 'g')
                      || '</w> ' AS sym FROM words)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
s{k-1} AS MATERIALIZED (SELECT freq, string_split(trim(sym), '  ') AS s FROM sym{k-1}),
p{k} AS MATERIALIZED (
  SELECT u.l AS lhs, u.r AS rhs, CAST(sum(freq) AS BIGINT) AS c
  FROM s{k-1}, UNNEST(list_transform(generate_series(1, len(s)-1),
       i -> {{'l': s[i], 'r': s[i+1]}})) AS t(u)
  GROUP BY lhs, rhs
),
t{k} AS MATERIALIZED (SELECT lhs, rhs, c FROM p{k} ORDER BY c DESC, lhs, rhs LIMIT 1),
sym{k} AS MATERIALIZED (SELECT word, freq, replace(sym,
    ' ' || (SELECT lhs FROM t{k}) || '  ' || (SELECT rhs FROM t{k}) || ' ',
    ' ' || (SELECT lhs FROM t{k}) || (SELECT rhs FROM t{k}) || ' ') AS sym
  FROM sym{k-1})""")
    return "".join(parts)


def _q109_oracle(rounds: int = _BPE_ROUNDS) -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, lhs, rhs, c AS pair_freq"
        f" FROM t{k}"
        for k in range(1, rounds + 1)
    )
    return _bpe_ctes(rounds) + "\n" + arms


@register("q109_bpe_merges", covers=("A1", "M1"), oracle=_q109_oracle())
def q109_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training, 8 merge rounds over the
    corpus word-frequency table — the offline step that produces the
    subword vocabulary the packing/encoding queries (q88, q59/q67/q69)
    consume.  See operators/bpe.py for the scale design: ONE corpus
    shuffle builds the vocab-sized word frame; each round is a map-side
    pair tally + TakeOrdered(1) argmax + map-only merge, and the oracle
    replays the identical data-dependent loop as unrolled static SQL —
    the whole training run, argmaxes included, is engine-exact."""
    from briefly_spark.operators.bpe import bpe_train, word_freqs

    docs = spread(load_table(spark, sf_dir, "documents"))
    merges, _symbolized = bpe_train(spark, word_freqs(docs), rounds=_BPE_ROUNDS)
    return merges



# ---------------------------------------------------------------------------
# q126 — BPE tokenizer APPLY: encode the corpus with the trained merges.
# ---------------------------------------------------------------------------
@register(
    "q126_bpe_encode",
    covers=("A1", "M1"),
    oracle=_bpe_ctes() + """,
enc AS (SELECT word, CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS n_sub
        FROM sym8),
dtoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS word
  FROM documents
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(e.n_sub) AS BIGINT) AS n_subwords
FROM dtoks JOIN enc e USING (word)
GROUP BY doc_id
""",
)
def q126_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the q109 training run's output put to work: the
    corpus re-encodes under the 8 trained merges and every document gets
    its subword token count (n_subwords / n_words is the tokenizer's
    fertility, the metric that decides whether a vocab suits a corpus —
    and n_subwords is the number the packing queries q59/q67/q69 budget
    by for a subword model).  Closes the tokenizer loop: train (q109) →
    encode (here) → pack (q59).

    Scale: encoding joins the corpus token stream against the WORD
    frame's final symbolization (vocab-sized, Heaps-law bounded —
    broadcast), so no per-token merge replay ever touches the corpus:
    the merge loop ran once on the word frame and each corpus token
    just looks its word up.  One tokenize shuffle for the doc-side
    aggregate; the oracle replays training + encode as one static
    unrolled chain."""
    from briefly_spark.operators.bpe import bpe_train, word_freqs

    docs = spread(load_table(spark, sf_dir, "documents"))
    _merges, symbolized = bpe_train(spark, word_freqs(docs), rounds=_BPE_ROUNDS)
    enc = symbolized.select(
        "word",
        F.size(F.split(F.trim(F.col("sym")), "  ")).cast("long").alias("n_sub"),
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    dtoks = docs.select("doc_id", F.explode(toks).alias("word"))
    return (
        dtoks.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
    )


# ---------------------------------------------------------------------------
# q148 — unigram-LM tokenizer: fixed-round EM training + fertility encode.
# ---------------------------------------------------------------------------
#: q148 parameters — shared between the Spark side and the unrolled oracle.
#: max_word_len bounds the static Viterbi unroll (both sides drop longer
#: words — the documented SentencePiece-style training cap); rounds is
#: fixed (early_stop=False) so the oracle replays a statically known EM.
_UG = dict(max_piece_len=4, max_word_len=12, seed_size=300, min_count=2,
           vocab_size=40, rounds=3)


def _q148_oracle() -> str:
    from briefly_spark.operators.unigram import sql_unigram_em

    return sql_unigram_em("documents", **_UG)


@register("q148_unigram_tokenizer", covers=("A1", "M1"), oracle=_q148_oracle())
def q148_unigram_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer (Kudo 2018), the second tokenizer-training leg
    next to BPE (q109/q126): over-complete seed → 3 fixed hard-EM rounds
    (integer micro-nat Viterbi + prune to 3/4) → final vocabulary +
    per-document fertility under it.  One output frame, two surfaces:
    part='piece' rows are the trained vocabulary (k=piece, v1=count,
    v2=score_fp, v3=is_char) and part='doc' rows the encode surface
    (k=doc_id, v1=n_words, v2=n_pieces, v3=fertility_fp) — so the driver
    hash gates the ENTIRE training run and its application at once.

    The oracle replays the identical data-dependent EM as one static SQL
    statement (operators/unigram.py:sql_unigram_em): unrolled Viterbi DP
    (one CTE per word position, argmax key replicating the Python
    tie-break exactly), staged det_ln scores, integer-exact prune
    arithmetic — the q109 unrolled-BPE discipline applied to EM.

    Scale (operators/unigram.py module doc): the corpus is touched once
    (word-freq shuffle + the per-doc encode join); every EM round rides
    the Heaps-bounded word frame with the vocab as a closure broadcast —
    measured flat across a 1024x word-frame ladder (BENCH_NOTES X118)."""
    from briefly_spark.operators.bpe import word_freqs
    from briefly_spark.operators.unigram import unigram_encode, unigram_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    wf = word_freqs(docs).filter(F.length("word") <= _UG["max_word_len"])
    vocab = unigram_train(
        spark,
        wf,
        vocab_size=_UG["vocab_size"],
        max_piece_len=_UG["max_piece_len"],
        seed_size=_UG["seed_size"],
        min_count=_UG["min_count"],
        prune_frac=0.75,
        max_rounds=_UG["rounds"],
        early_stop=False,
    )
    enc = unigram_encode(
        docs,
        vocab,
        id_col="doc_id",
        text_col="text",
        max_piece_len=_UG["max_piece_len"],
        max_word_len=_UG["max_word_len"],
    )
    piece_part = vocab.select(
        F.lit("piece").alias("part"),
        F.col("piece").alias("k"),
        F.col("count").alias("v1"),
        F.col("score_fp").alias("v2"),
        F.when(F.col("is_char"), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("v3"),
    )
    doc_part = enc.select(
        F.lit("doc").alias("part"),
        F.col("id").cast("string").alias("k"),
        F.col("n_words").alias("v1"),
        F.col("n_pieces").alias("v2"),
        F.col("fertility_fp").alias("v3"),
    )
    return piece_part.unionByName(doc_part)


# ---------------------------------------------------------------------------
# q124 / q125 — linear quality-classifier training + inference (integer
# batch perceptron; see operators/classifier.py for the scale design).
# ---------------------------------------------------------------------------
_PCT_B = 32  # hashed feature buckets (+1 bias)
_PCT_R = 3   # synchronous training rounds

_PCT_DOCS = "SELECT doc_id AS id, text, lang FROM documents"
_PCT_LABEL = "lang = 'en'"


def _pct_ctes() -> str:
    from briefly_spark.operators.classifier import sql_perceptron_ctes

    return sql_perceptron_ctes(
        _PCT_DOCS, _PCT_LABEL, n_buckets=_PCT_B, rounds=_PCT_R
    )


@register(
    "q124_classifier_train",
    covers=("A3", "A4"),
    oracle=f"WITH {_pct_ctes()}\nSELECT j, w FROM w{_PCT_R}",
)
def q124_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training of the fastText-style linear quality/language
    classifier (integer batch perceptron, 3 synchronous rounds, 32 hashed
    bag-of-words buckets + bias; labels: lang = 'en').  The output IS the
    trained model — 33 (feature, weight) rows, every update integer-exact,
    so the whole training run sits under the driver's hash gate exactly
    like BPE training (q109) and k-means (q96).

    Scale: the corpus collapses once to the hashed feature frame
    (≤ 33 rows/doc), hash-partitioned by doc and persisted; each round is
    a map-only margin projection (weights enter as a literal array — no
    join), an exchange-free groupBy(id), and a ≤ 33-group gradient
    partial-agg; the driver holds ≤ 33 rows per round."""
    from briefly_spark.operators.classifier import perceptron_train_frames

    docs = spread(load_table(spark, sf_dir, "documents"))
    weights, _ = perceptron_train_frames(
        spark,
        docs,
        id_col="doc_id",
        text_col="text",
        label=F.col("lang") == "en",
        n_buckets=_PCT_B,
        rounds=_PCT_R,
        want_margins=False,
    )
    return weights


@register(
    "q125_classifier_margins",
    covers=("A3", "P7"),
    oracle=f"""WITH {_pct_ctes()}
SELECT id AS doc_id, CAST(y AS BIGINT) AS y, m AS margin,
       CAST(CASE WHEN m > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
FROM m{_PCT_R}""",
)
def q125_classifier_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier INFERENCE over the whole corpus: per-document integer
    margin under the q124-trained weights, predicted label (sign of the
    margin, ties to −1) next to the true label — the scoring pass a
    quality-filter stage thresholds on (keep margin > τ), and the frame
    accuracy/precision audits read from.  Inference is one map-only
    projection + one exchange-free per-doc aggregate; the oracle replays
    training AND scoring as one static chain.

    The returned frame reads the persisted margins cache (corpus-sized —
    too big to materialize eagerly like q127's one-row audit); every repo
    harness clearCache()s per query, and external repeat-callers own the
    release per perceptron_train_frames' contract (ADVICE r08 #3)."""
    from briefly_spark.operators.classifier import perceptron_train_frames

    docs = spread(load_table(spark, sf_dir, "documents"))
    _weights, margins = perceptron_train_frames(
        spark,
        docs,
        id_col="doc_id",
        text_col="text",
        label=F.col("lang") == "en",
        n_buckets=_PCT_B,
        rounds=_PCT_R,
    )
    return margins.select(
        F.col("id").alias("doc_id"),
        F.col("y").cast("long").alias("y"),
        F.col("m").cast("long").alias("margin"),
        F.when(F.col("m") > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("pred"),
    )


def _q130_oracle() -> str:
    from briefly_spark.operators.classifier import sql_perceptron_avg_ctes

    return f"""WITH {_pct_ctes()},
{sql_perceptron_avg_ctes(rounds=_PCT_R)}
SELECT m.id AS doc_id, CAST(m.y AS BIGINT) AS y,
       m.m AS margin_final, a.m AS margin_avgsum,
       CAST(CASE WHEN m.m > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred_final,
       CAST(CASE WHEN a.m > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred_avg,
       CAST(CASE WHEN (m.m > 0) <> (a.m > 0) THEN 1 ELSE 0 END AS BIGINT)
         AS flipped
FROM m{_PCT_R} m JOIN mavg a USING (id)"""


@register("q130_classifier_margins_avg", covers=("A3", "P7"), oracle=_q130_oracle())
def q130_classifier_margins_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVERAGED-perceptron inference (VERDICT r08 next-round #6): the
    standard stability fix for the q124 trainer — Freund & Schapire
    1999's voted perceptron in Collins 2002's averaged form.  Scores
    every document under BOTH the final round-3 weights and the integer
    SUM of the post-round vectors Σ_r w_r (unnormalized: /R would break
    integer exactness, and sign/ordering are invariant to the scale), and
    flags the documents whose keep decision the averaging flips — the
    delta a curation pipeline inspects before switching gates.

    Scale: identical shape to q125 — the corpus collapses once to the
    persisted feature frame; the averaged accumulation is driver-side
    addition of the ≤33-row round state (no new shuffle, no extra job);
    BOTH margin columns come from ONE exchange-free groupBy(id) over the
    cached frame (the two weight vectors enter as literal arrays).  The
    oracle replays training, the w1..w3 running sum, and dual scoring as
    one static CTE chain.

    The returned frame reads the persisted dual-margins cache
    (corpus-sized — too big to materialize eagerly like q127's audit);
    same ownership contract as q125: every repo harness clearCache()s
    per query, and external repeat-callers own the release (ADVICE
    r08 #3)."""
    from briefly_spark.operators.classifier import (
        hashed_features,
        perceptron_train_avg,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    feats = (
        hashed_features(
            docs,
            id_col="doc_id",
            text_col="text",
            label=F.col("lang") == "en",
            n_buckets=_PCT_B,
        )
        .repartition("id")
        .persist()
    )
    feats.count()
    wf, ws = perceptron_train_avg(feats, n_buckets=_PCT_B, rounds=_PCT_R)
    wfarr = F.array(*[F.lit(int(v)).cast("long") for v in wf])
    wsarr = F.array(*[F.lit(int(v)).cast("long") for v in ws])
    both = feats.groupBy("id").agg(
        F.max("y").alias("y"),
        F.sum(F.col("x") * F.element_at(wfarr, (F.col("j") + 1).cast("int")))
        .alias("m_fin"),
        F.sum(F.col("x") * F.element_at(wsarr, (F.col("j") + 1).cast("int")))
        .alias("m_avg"),
    ).persist()
    both.count()  # pin while feats is cached: ONE tokenize total (q125 rule)
    feats.unpersist()
    return both.select(
        F.col("id").alias("doc_id"),
        F.col("y").cast("long").alias("y"),
        F.col("m_fin").cast("long").alias("margin_final"),
        F.col("m_avg").cast("long").alias("margin_avgsum"),
        F.when(F.col("m_fin") > 0, F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
        .alias("pred_final"),
        F.when(F.col("m_avg") > 0, F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
        .alias("pred_avg"),
        ((F.col("m_fin") > 0) != (F.col("m_avg") > 0)).cast("long").alias("flipped"),
    )


# ---------------------------------------------------------------------------
# q127 — classifier-gated curation audit (the q87-style capstone for the
# learned gate: keep-gate from q125's margins, audited against the q52
# rubric labels).
# ---------------------------------------------------------------------------
_PCT_TAU = 0        # keep-gate: margin > 0 (predicted in-domain)
_Q127_QTAU_FP = 50000  # rubric "good" label: floor(quality * 1e4) >= 5.0


def _q127_oracle() -> str:
    from briefly_spark.queries.textstats import _SQL_QUALITY, _TOKS

    return f"""WITH {_pct_ctes()},
qual AS (
  SELECT doc_id, CAST(floor(({_SQL_QUALITY}) * 10000) AS BIGINT) AS q_fp
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents) t
),
gate AS (
  SELECT m.id AS doc_id,
         CASE WHEN m.m > {_PCT_TAU} THEN 1 ELSE 0 END AS keep,
         CASE WHEN q.q_fp >= {_Q127_QTAU_FP} THEN 1 ELSE 0 END AS good
  FROM m{_PCT_R} m JOIN qual q ON m.id = q.doc_id
),
conf AS (
  SELECT CAST(count(*) AS BIGINT) AS n_input,
         CAST(sum(keep) AS BIGINT) AS n_kept,
         CAST(sum(keep * good) AS BIGINT) AS tp,
         CAST(sum(keep * (1 - good)) AS BIGINT) AS fp,
         CAST(sum((1 - keep) * good) AS BIGINT) AS fn,
         CAST(sum((1 - keep) * (1 - good)) AS BIGINT) AS tn
  FROM gate
)
SELECT n_input, n_kept, tp, fp, fn, tn,
       CAST(CASE WHEN tp + fp = 0 THEN NULL
                 ELSE (tp * 10000) // (tp + fp) END AS BIGINT) AS precision_fp,
       CAST(CASE WHEN tp + fn = 0 THEN NULL
                 ELSE (tp * 10000) // (tp + fn) END AS BIGINT) AS recall_fp
FROM conf"""


@register("q127_classifier_funnel_audit", covers=("A3", "P7"), oracle=_q127_oracle())
def q127_classifier_funnel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-gated curation audit — the learned-gate counterpart of
    q87's funnel report: train the q124 perceptron, keep documents whose
    margin clears the threshold (the quality-filter stage a LLaMA-style
    pipeline runs), and audit the keep set against the INDEPENDENT q52
    rubric labels (floor(quality·10⁴) ≥ 5.0 = "good") as a confusion
    matrix with fixed-point precision/recall — the number a curation run
    reports before committing a 100 TB keep decision to disk.

    Scale: margins come back MATERIALIZED from perceptron_train_frames
    (the corpus tokenizes exactly once — VERDICT r07 #3 discipline); the
    rubric is a map-only second scan reading only (doc_id, text); one id
    equi-join + a single-row rollup.  All hashed surfaces BIGINT; the
    precision/recall divisions are integer fixed-point (both engines
    floor nonnegative division identically)."""
    from briefly_spark.operators.classifier import perceptron_train_frames
    from briefly_spark.operators.textstats import quality_score

    docs = spread(load_table(spark, sf_dir, "documents"))
    _w, margins = perceptron_train_frames(
        spark,
        docs,
        id_col="doc_id",
        text_col="text",
        label=F.col("lang") == "en",
        n_buckets=_PCT_B,
        rounds=_PCT_R,
    )
    qual = docs.select(
        "doc_id",
        F.floor(quality_score(F.col("text")) * 10000).cast("long").alias("q_fp"),
    )
    gate = (
        margins.select(
            F.col("id").alias("doc_id"),
            (F.col("m") > _PCT_TAU).cast("long").alias("keep"),
        )
        .join(qual, "doc_id")
        .withColumn("good", (F.col("q_fp") >= _Q127_QTAU_FP).cast("long"))
    )
    conf = gate.agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.sum(F.col("keep") * F.col("good")).cast("long").alias("tp"),
        F.sum(F.col("keep") * (1 - F.col("good"))).cast("long").alias("fp"),
        F.sum((1 - F.col("keep")) * F.col("good")).cast("long").alias("fn"),
        F.sum((1 - F.col("keep")) * (1 - F.col("good"))).cast("long").alias("tn"),
    )
    out = conf.select(
        "n_input", "n_kept", "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(tp * 10000) div (tp + fp)"))
        .cast("long")
        .alias("precision_fp"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(tp * 10000) div (tp + fn)"))
        .cast("long")
        .alias("recall_fp"),
    )
    # single-row rollup: materialize eagerly so the persisted margins frame
    # can be released HERE instead of leaking into the caller's session
    # (ADVICE r08 #3); q125 cannot do this (corpus-sized result) and
    # documents caller ownership instead.
    out = spark.createDataFrame(out.collect(), schema=out.schema)
    margins.unpersist()
    return out


# ---------------------------------------------------------------------------
# q132 — classifier threshold sweep (PR curve): the tau-selection table a
# curation pipeline reads BEFORE fixing the q127 keep-gate.
# ---------------------------------------------------------------------------
_PRC_STEPS = 10  # ladder granularity: tau_i = mmin + i*span//10, i = 1..9


def _q132_oracle() -> str:
    from briefly_spark.queries.textstats import _SQL_QUALITY, _TOKS

    return f"""WITH {_pct_ctes()},
qual AS (
  SELECT doc_id, CAST(floor(({_SQL_QUALITY}) * 10000) AS BIGINT) AS q_fp
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents) t
),
gate AS MATERIALIZED (
  SELECT m.id AS doc_id, m.m,
         CASE WHEN q.q_fp >= {_Q127_QTAU_FP} THEN 1 ELSE 0 END AS good
  FROM m{_PCT_R} m JOIN qual q ON m.id = q.doc_id
),
bounds AS (SELECT min(m) AS mmin, max(m) AS mmax FROM gate),
taus AS (
  SELECT CAST(i AS BIGINT) AS i,
         CAST(b.mmin + i * (b.mmax - b.mmin) // {_PRC_STEPS} AS BIGINT) AS tau
  FROM bounds b, UNNEST(range(1, {_PRC_STEPS})) AS u(i)
),
conf AS (
  SELECT t.i, t.tau,
         CAST(sum(CASE WHEN g.m > t.tau THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN g.m > t.tau THEN g.good ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN g.m > t.tau THEN 1 - g.good ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN g.m <= t.tau THEN g.good ELSE 0 END) AS BIGINT) AS fn
  FROM gate g, taus t GROUP BY t.i, t.tau
)
SELECT i, tau, n_kept, tp, fp, fn,
       CAST(CASE WHEN tp + fp = 0 THEN NULL
                 ELSE (tp * 10000) // (tp + fp) END AS BIGINT) AS precision_fp,
       CAST(CASE WHEN tp + fn = 0 THEN NULL
                 ELSE (tp * 10000) // (tp + fn) END AS BIGINT) AS recall_fp,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                 ELSE (2 * tp * 10000) // (2 * tp + fp + fn) END AS BIGINT) AS f1_fp
FROM conf"""


@register("q132_classifier_pr_curve", covers=("A3", "P7"), oracle=_q132_oracle())
def q132_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier THRESHOLD SWEEP — the precision/recall/F1 curve over a
    9-point integer tau ladder spanning the margin range, against the
    independent q52 rubric labels: the table a pipeline reads to pick the
    q127 keep-gate before committing a 100 TB keep decision (trading
    recall for precision is THE curation dial; fastText-gate pipelines
    publish exactly this sweep).  The ladder is data-dependent but
    engine-exact: tau_i = mmin + i*(mmax - mmin)//10 in pure integer
    arithmetic from the margins' own bounds.

    Scale: margins come back materialized (one corpus tokenize — q125
    rule); the rubric is the q127 map-only second scan; bounds are one
    2-value aggregate broadcast back; the sweep fans each doc out x9
    map-side and partial-aggregates into 9 groups — one tiny shuffle,
    output 9 rows regardless of corpus size.  All surfaces BIGINT; the
    divisions are nonnegative integer floors (both engines identical)."""
    from briefly_spark.operators.classifier import perceptron_train_frames
    from briefly_spark.operators.textstats import quality_score

    docs = spread(load_table(spark, sf_dir, "documents"))
    _w, margins = perceptron_train_frames(
        spark,
        docs,
        id_col="doc_id",
        text_col="text",
        label=F.col("lang") == "en",
        n_buckets=_PCT_B,
        rounds=_PCT_R,
    )
    qual = docs.select(
        "doc_id",
        (F.floor(quality_score(F.col("text")) * 10000).cast("long") >= _Q127_QTAU_FP)
        .cast("long")
        .alias("good"),
    )
    gate = margins.select(F.col("id").alias("doc_id"), "m").join(qual, "doc_id")
    bounds = gate.agg(
        F.min("m").cast("long").alias("mmin"), F.max("m").cast("long").alias("mmax")
    )
    taus = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(_PRC_STEPS - 1))).alias("i"),
        "mmin",
        "mmax",
    ).select(
        F.col("i").cast("long").alias("i"),
        F.expr(f"CAST(mmin + i * (mmax - mmin) div {_PRC_STEPS} AS BIGINT)").alias(
            "tau"
        ),
    )
    swept = gate.crossJoin(F.broadcast(taus))
    conf = swept.groupBy("i", "tau").agg(
        F.sum((F.col("m") > F.col("tau")).cast("long")).alias("n_kept"),
        F.sum(((F.col("m") > F.col("tau")).cast("long") * F.col("good"))).alias("tp"),
        F.sum(
            ((F.col("m") > F.col("tau")).cast("long") * (1 - F.col("good")))
        ).alias("fp"),
        F.sum(((F.col("m") <= F.col("tau")).cast("long") * F.col("good"))).alias("fn"),
    )
    out = conf.select(
        "i",
        "tau",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(tp * 10000) div (tp + fp)"))
        .cast("long")
        .alias("precision_fp"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(tp * 10000) div (tp + fn)"))
        .cast("long")
        .alias("recall_fp"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(2 * tp * 10000) div (2 * tp + fp + fn)"))
        .cast("long")
        .alias("f1_fp"),
    )
    # bounded 9-row result: materialize eagerly, release the margins cache
    # (the q127 pattern — ADVICE r08 #3)
    out = spark.createDataFrame(out.collect(), schema=out.schema)
    margins.unpersist()
    return out


# ---------------------------------------------------------------------------
# q139 — vocabulary-coverage / OOV curve, sort-free via count-class
# histogram.  The tokenizer-sizing companion to q88/q136/q137.
# ---------------------------------------------------------------------------
_Q139_ORACLE = """
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM documents
),
cw AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_mass,
               CAST(count(*) AS BIGINT) AS n_vocab FROM cw),
hist AS MATERIALIZED (
  SELECT c, CAST(count(*) AS BIGINT) AS n_terms FROM cw GROUP BY c
),
run AS MATERIALIZED (
  SELECT c, n_terms,
         CAST(sum(n_terms) OVER w AS BIGINT) AS cum_terms,
         CAST(sum(c * n_terms) OVER w AS BIGINT) AS cum_mass
  FROM hist
  WINDOW w AS (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
chk AS MATERIALIZED (
  SELECT v FROM (
    SELECT (CAST(1 AS BIGINT) << i) AS v
    FROM (SELECT unnest(range(0, 40)) AS i), tot WHERE (CAST(1 AS BIGINT) << i) < n_vocab
    UNION SELECT n_vocab FROM tot
  )
)
SELECT k.v, r.c AS boundary_count,
       CAST(r.cum_mass - (r.cum_terms - k.v) * r.c AS BIGINT) AS covered_mass,
       CAST(((r.cum_mass - (r.cum_terms - k.v) * r.c) * 10000) // t.total_mass
            AS BIGINT) AS coverage_fp,
       CAST(10000 - ((r.cum_mass - (r.cum_terms - k.v) * r.c) * 10000) // t.total_mass
            AS BIGINT) AS oov_fp
FROM chk k
JOIN run r ON r.cum_terms >= k.v AND r.cum_terms - r.n_terms < k.v, tot t
"""


@register("q139_vocab_coverage", covers=("A3", "W1"), oracle=_Q139_ORACLE)
def q139_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV curve at geometric vocab-size
    checkpoints (V = 1, 2, 4, … plus the full vocab): the fraction of
    all corpus tokens covered by the top-V terms — the table a pipeline
    reads to pick q88's V ("what V reaches 99% coverage") and to budget
    q126's fertility expectations.  SORT-FREE: instead of ranking the
    vocab, terms collapse into a COUNT-CLASS histogram (one row per
    distinct frequency — O(√corpus-mass) rows, since distinct values in
    an integer partition of M are ≤ ~√(2M)); running (terms, mass)
    prefix sums over that frame locate each checkpoint's boundary class,
    and the exact top-V mass is cum_mass − (cum_terms − V)·c — exact for
    ANY tie-break among equal-count terms, because every term in the
    boundary class carries the same mass.  Pure integer arithmetic;
    coverage as 10⁴ fixed-point floor-div.

    Plan shape at 100 TB: one (term) count shuffle (vocab-sized,
    Heaps-bounded), one (c) histogram shuffle (√-bounded), windows and
    the ≤40-row checkpoint range-join on the histogram frame only
    (plan_lint allowlisted; q119's value-histogram precedent).
    covered_mass·10⁴ stays under 2⁶³ for corpora to ~9·10¹⁴ tokens —
    above the 100 TB design point's ~2·10¹³."""
    from pyspark.sql.window import Window

    from briefly_spark.operators.search import tokens_of

    docs = spread(load_table(spark, sf_dir, "documents"))
    cw = (
        docs.select(F.explode(tokens_of(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cw.agg(
        F.sum("c").cast("long").alias("total_mass"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    hist = cw.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    w = Window.orderBy(F.desc("c")).rowsBetween(Window.unboundedPreceding, 0)
    run = hist.select(
        "c",
        "n_terms",
        F.sum("n_terms").over(w).cast("long").alias("cum_terms"),
        F.sum(F.col("c") * F.col("n_terms")).over(w).cast("long").alias("cum_mass"),
    )
    chk = (
        spark.range(0, 40)
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("v"),
            "n_vocab",
        )
        .filter(F.col("v") < F.col("n_vocab"))
        .select("v")
        .unionByName(tot.select(F.col("n_vocab").alias("v")))
        .distinct()
    )
    joined = F.broadcast(chk).crossJoin(F.broadcast(tot)).join(
        run,
        (F.col("cum_terms") >= F.col("v"))
        & (F.col("cum_terms") - F.col("n_terms") < F.col("v")),
    )
    covered = F.col("cum_mass") - (F.col("cum_terms") - F.col("v")) * F.col("c")
    return joined.select(
        "v",
        F.col("c").alias("boundary_count"),
        covered.cast("long").alias("covered_mass"),
        F.expr(
            "CAST(((cum_mass - (cum_terms - v) * c) * 10000) div total_mass AS BIGINT)"
        ).alias("coverage_fp"),
        F.expr(
            "CAST(10000 - ((cum_mass - (cum_terms - v) * c) * 10000) div total_mass AS BIGINT)"
        ).alias("oov_fp"),
    )


# ---------------------------------------------------------------------------
# q141 — multinomial Naive Bayes language tagger (generative classifier).
# ---------------------------------------------------------------------------
_NB_B = 32
_NB_DOCS = "SELECT doc_id AS id, lang AS lab, text FROM documents"


def _q141_oracle() -> str:
    from briefly_spark.operators.classifier import sql_nb_ctes

    return f"""WITH {sql_nb_ctes(_NB_DOCS, n_buckets=_NB_B)}
SELECT true_lab AS true_lang, pred_lab AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM npred GROUP BY 1, 2"""


@register("q141_nb_confusion", covers=("A3", "A4"), oracle=_q141_oracle())
def q141_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language tagger, trained and self-scored in
    ONE aggregation pass — the GENERATIVE counterpart to the q124
    perceptron (fastText-style multi-class routing: language, domain,
    topic), with the confusion matrix (true_lang, pred_lang, n_docs;
    ≤ n_langs² rows) as the gated surface.  Add-one smoothing over 32
    hashed buckets; every log is det_ln fixed-pointed before the per-doc
    sum, so scores are exact integers and the argmax (ties → smallest
    class, max-score filter + min two-step) hash-matches the oracle's
    replay of the identical model.

    Scale (operators/classifier.py:nb_confusion): corpus → hashed feature
    frame once; the model is a (classes × buckets) table + class priors,
    all class-sized aggregates BROADCAST back; scoring is one map-side
    ×n_classes expansion with partial-agg — no rounds, no driver state at
    all (the one-pass trainability is why pipelines deploy NB gates
    before anything iterative)."""
    from briefly_spark.operators.classifier import nb_confusion

    docs = spread(load_table(spark, sf_dir, "documents"))
    return nb_confusion(
        spark, docs, id_col="doc_id", text_col="text", label_col="lang",
        n_buckets=_NB_B,
    ).select(
        F.col("true_lab").alias("true_lang"),
        F.col("pred_lab").alias("pred_lang"),
        "n_docs",
    )
