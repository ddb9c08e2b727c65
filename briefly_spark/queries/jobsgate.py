"""q128 — the jobs-layer DAG made visible to the driver gate.

The jobs layer (briefly_spark/jobs.py — the reference's Dagster asset DAG
as idempotent work-list jobs) was pytest-only at the driver: its entry
points need a warehouse root, which the pure ``(spark, sf_dir) ->
DataFrame`` contract doesn't provide.  q128 closes that gap the way q120
did for streaming (VERDICT r07 next-round #8): the WHOLE
ingest → (curate → summarize → tts → embed → relate) drain runs inside
the query function against a throwaway warehouse, and the final articles
table's lifecycle columns hash against a plain one-shot SQL restatement.
Since r09 the surface includes the TTS leg (VERDICT r08 next-round #4):
the deterministic gender voices and both audio ids (md5(voice ':'
md5(audio)) over the newline-joined summary) — putting the M7 synthesis
composition and the P3 dual-audio work-list predicate under the same
fixed-point hash; only the side-effecting upload itself (K7/M8) remains
pytest-only.

The equality is the point — it driver-pins the jobs layer's convergence
contract:

- every lifecycle column the drain loop fills is a deterministic function
  of the INPUT corpus alone, independent of batch boundaries: summarize /
  fact-check are per-row stubs, embed is per-row, and curate's
  batch-by-batch span registry (ascending article_id batches) equals the
  one-shot keep-first span dedup (the incremental≡one-shot pin in
  tests/test_streaming.py, here re-proven against DuckDB);
- the relate stage fills ``related_ids`` for every embedded article (its
  content is schedule-dependent — earlier batches see a smaller corpus —
  so the gate hashes only the filled/non-empty fact, not the ids; id-level
  relate parity is q41's job).  The oracle derives the expected flag from
  the corpus size (>1 embedded article → filled) rather than hardcoding 1,
  so a degenerate slice with a single article cannot go spuriously red
  (ADVICE r08 #2).

Reference parity: definitions.py's asset graph (ingest → summarize →
embed → relate) ran one article per OS process; here each stage is one
set-oriented job and the gate checks the DRAINED fixed point.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.queries import register

#: fraction kept from the documents table: 1/5 by doc_id — bounds the
#: merge-heavy pipeline at bench SF while leaving a real multi-batch,
#: multi-round drain (the caveat in BENCH_NOTES: q128's wall time
#: measures the whole pipeline against a temp warehouse, not a plan)
_SLICE_MOD = 5


def _q128_oracle() -> str:
    from briefly_spark.queries.training import sql_span_ctes

    return f"""WITH arts AS (
  SELECT doc_id, 'https://ex/' || CAST(doc_id AS VARCHAR) AS url, source,
         text, n_chars
  FROM documents
  WHERE doc_id % {_SLICE_MOD} = 0 AND len(text) >= 20
),
{sql_span_ctes("arts")},
curated AS (
  SELECT doc_id, min(n_spans) AS n_spans, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY widx) AS clean_text
  FROM kept GROUP BY doc_id
),
words AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM arts
),
sents AS (
  SELECT doc_id, w,
         list_transform(range(1, len(w) + 1, 10),
                        i -> array_to_string(list_slice(w, i, i + 9), ' ')) AS s
  FROM words
),
summ AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 10 THEN 'ok' ELSE 'fallback' END AS summary_status,
         CAST(CASE WHEN len(w) >= 10 THEN len(list_slice(s, 1, 4)) ELSE 1 END
              AS BIGINT) AS n_points
  FROM sents
),
stmts AS (
  SELECT doc_id,
         unnest(list_filter(
           list_transform(range(0, greatest(length(text) - 1, 0) + 1, 100),
                          i -> substr(text, i + 1, 100)),
           s -> length(s) > 10)) AS stmt
  FROM arts
),
veri AS (
  SELECT doc_id, strpos('0123456789abcdef', substr(md5(stmt), 1, 1)) - 1 AS nib
  FROM stmts
),
score AS (
  SELECT doc_id,
         CAST(floor(least(greatest(
           (sum(CASE WHEN nib < 8 THEN 1 ELSE 0 END)
            - 0.5 * sum(CASE WHEN nib >= 8 AND nib < 11 THEN 1 ELSE 0 END))
           / count(*) * 10, 3.0), 10.0) * 10000) AS BIGINT) AS validation_fp
  FROM veri GROUP BY doc_id
),
stext AS (
  SELECT a.doc_id,
         CASE WHEN len(n.w) >= 10
              THEN array_to_string(list_slice(n.s, 1, 4), chr(10))
              ELSE substr(a.text, 1, 500) END AS st
  FROM arts a JOIN sents n USING (doc_id)
),
tts AS (
  SELECT x.doc_id,
         md5(repeat(md5(x.st), CAST(1 + length(x.st) // 100 AS INT))) AS audio_md5,
         ['onyx','echo','fable','alloy']
           [(strpos('0123456789abcdef', substr(md5(a.url), 1, 1)) - 1) % 4 + 1]
           AS male_voice,
         ['nova','shimmer','coral','sage']
           [(strpos('0123456789abcdef', substr(md5(a.url), 1, 1)) - 1) % 4 + 1]
           AS female_voice
  FROM stext x JOIN arts a USING (doc_id)
)
SELECT a.url, a.source, CAST(a.n_chars AS BIGINT) AS n_chars,
       m.summary_status, m.n_points, v.validation_fp,
       'completed' AS embedding_status,
       CASE WHEN c.n_kept IS NULL THEN 'empty' ELSE 'curated' END AS curated_status,
       CAST(CAST(ceil(len(string_split(a.text, ' ')) / 8.0) AS BIGINT)
            - coalesce(c.n_kept, 0) AS BIGINT) AS n_spans_trimmed,
       md5(coalesce(c.clean_text, '')) AS curated_md5,
       CAST(CASE WHEN (SELECT count(*) FROM arts) > 1 THEN 1 ELSE 0 END
            AS BIGINT) AS has_related,
       t.male_voice, t.female_voice,
       md5(t.male_voice || ':' || t.audio_md5) AS male_audio_id,
       md5(t.female_voice || ':' || t.audio_md5) AS female_audio_id
FROM arts a
JOIN summ m USING (doc_id)
JOIN score v USING (doc_id)
JOIN tts t USING (doc_id)
LEFT JOIN curated c USING (doc_id)"""


@register(
    "q128_jobs_dag_resolve",
    covers=("K1", "K3", "K5", "M7", "P3", "T1", "T3"),
    oracle=_q128_oracle(),
)
def q128_jobs_dag_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end jobs-layer DAG parity: a 20% document slice is ingested
    into a throwaway warehouse (anti-join dedup, partition-scoped merges),
    the enrichment loop drains to quiescence in 2 bounded batches per
    stage, and the final articles table's lifecycle columns — summary
    status/points, fixed-point fact-check score, embedding status, curate
    status/trim-count/content-md5, related-filled flag — hash against the
    one-shot SQL restatement.  Green means the whole merge/work-list
    machinery (K1/K3/K5 merges, T1 predicates, T3 drain) converges to the
    batching-independent fixed point.

    Scale: every stage is the jobs layer's own plan (scale notes in
    jobs.py); the gate adds one final projection.  Wall time measures the
    full multi-merge pipeline against temp dirs — a pipeline benchmark,
    not a query plan (BENCH_NOTES caveat, like q120)."""
    from briefly_spark.jobs import ARTICLES, ingest_documents, run_until_drained
    from briefly_spark.operators.tts import gender_voice
    from briefly_spark.storage import Warehouse

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _SLICE_MOD == 0
    )
    n = docs.filter(F.length("text") >= 20).count()
    # n//2 + 1: drain in 2 batches per stage at any SF.  q128's wall time
    # is stage-invocation-bounded, not corpus-bounded (measured r10: at
    # sf0.1 warm, 3-batch 40.2 s vs 2-batch 25.0 s at the SAME corpus,
    # while shrinking the corpus 2.4x at 3 batches only saved 15%), so the
    # bench trim (VERDICT r09 next-round #5) cuts drain rounds and KEEPS
    # the full 20% corpus.  Two batches still prove batching-independence
    # — the span-registry claims and every lifecycle merge cross a batch
    # boundary — which is the property the fixed-point hash exists to pin.
    # The +1 (r15 opt) makes the SECOND batch under-fill (n - (n//2+1) <
    # batch), so run_until_drained's under-fill convergence check ends the
    # drain there instead of paying a third, all-zero verification round
    # — five work-list scans over the finished table, ~2.6 s of the gate's
    # wall time at sf0.1.  The fixed point is identical (the skipped round
    # writes nothing); the hash is batching-independent by construction.
    batch = max(1, n // 2 + 1)
    with tempfile.TemporaryDirectory(prefix="q128_dag_") as root:
        wh = Warehouse(spark, f"{root}/wh")
        ingest_documents(wh, docs)
        run_until_drained(wh, batch_size=batch)
        arts = wh.read(ARTICLES)
        out = arts.select(
            "url",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("summary_status"),
            F.size("summary").cast("long").alias("n_points"),
            F.floor(F.col("validation_score") * 10000).cast("long").alias("validation_fp"),
            "embedding_status",
            "curated_status",
            F.col("n_spans_trimmed").cast("long").alias("n_spans_trimmed"),
            F.md5(F.col("curated_content")).alias("curated_md5"),
            (F.col("related_ids").isNotNull() & (F.size("related_ids") > 0))
            .cast("long")
            .alias("has_related"),
            gender_voice(F.col("url"), "male").alias("male_voice"),
            gender_voice(F.col("url"), "female").alias("female_voice"),
            "male_audio_id",
            "female_audio_id",
        )
        # Materialize before the temp warehouse disappears — WITHOUT the
        # driver round-trip (VERDICT r11 what's-wrong #3: the old
        # collect+createDataFrame pulled the whole lifecycle frame through
        # the driver; at gate scale that was fine, at any SF it is not).
        # localCheckpoint(eager=True) computes the frame NOW, stores the
        # blocks executor-side, and truncates lineage, so the returned
        # DataFrame no longer references the deleted temp parquet.
        return out.localCheckpoint(eager=True)
