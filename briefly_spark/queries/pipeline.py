"""Pipeline pack — the reference's ML dataflow (chunk → embed → mean-pool,
summarize, fact-check) with deterministic stub backends, as set-oriented
Spark jobs (SURVEY §2.9 M3/M5/M6, §2.5 A5/A6, §3.2).

Stub discipline: every model/API call is replaced by a deterministic
md5-based function that both engines can compute (SURVEY §7.2 bans the
reference's randomness) — so even the Arrow/mapInPandas *plumbing* is
oracle-checked byte-for-byte, not just the relational algebra around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.functions.vectors import mean_pool
from briefly_spark.numerics import trunc4
from briefly_spark.operators.chunking import chunk_fixed_expr
from briefly_spark.operators.embedding import embed_map_in_pandas, hash_embed_expr
from briefly_spark.operators.textstats import tokens
from briefly_spark.queries import register

_H = "0123456789abcdef"


def _sql_embed(chunk: str, d: str) -> str:
    """DuckDB mirror of hash_embed_expr's per-dimension value."""
    h = f"md5({chunk} || ':' || CAST({d} AS VARCHAR))"
    def nib(j: int) -> str:
        return f"(strpos('{_H}', substr({h}, {j}, 1)) - 1)"
    return f"(({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)}) / 65536.0 - 0.5)"


def _vec_str(col) -> F.Column:  # type: ignore[name-defined]
    """Portable vector rendering: scaled-int CSV (double→string formatting
    differs between engines, int→string doesn't)."""
    return F.array_join(
        F.transform(col, lambda x: F.floor(x * 10000).cast("long").cast("string")), ","
    )


_SQL_VEC_STR = "array_to_string(list_transform({v}, x -> CAST(CAST(floor(x * 10000) AS BIGINT) AS VARCHAR)), ',')"


# --------------------------------------------------------------------------
# q60 — chunk → embed → mean-pool (the embedding job, A5 + M3-stub).
# --------------------------------------------------------------------------
@register(
    "q60_chunk_embed_meanpool",
    covers=("M1", "M3", "A5", "K5"),
    oracle=f"""
WITH c AS (
  SELECT doc_id,
         list_filter(
           list_transform(range(0, greatest(length(text) - 1, 0) + 1, 350),
                          i -> substr(text, i + 1, 400)),
           ch -> length(ch) > 10) AS chunks
  FROM documents
),
ch AS (SELECT doc_id, len(chunks) AS n_chunks, unnest(chunks) AS chunk FROM c),
emb AS (
  SELECT doc_id, n_chunks,
         list_transform(range(0, 16), d -> {_sql_embed('chunk', 'd')}) AS v
  FROM ch
),
expl AS (
  SELECT doc_id, n_chunks, u['dim'] AS dim, u['val'] AS val
  FROM (SELECT doc_id, n_chunks,
               unnest(list_transform(v, (x, i) -> struct_pack(dim := i - 1, val := x))) AS u
        FROM emb)
),
pd AS (SELECT doc_id, dim, avg(val) AS m, min(n_chunks) AS n_chunks
       FROM expl GROUP BY doc_id, dim)
SELECT doc_id, min(n_chunks) AS n_chunks,
       {_SQL_VEC_STR.format(v='list(m ORDER BY dim)')} AS vec
FROM pd GROUP BY doc_id
""",
)
def q60_chunk_embed_meanpool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding job end-to-end (embedded_articles.py:40-167):
    chunk (400/overlap 50) → per-chunk embedding → element-wise mean-pool
    to one vector per document.  Stub embeddings are dyadic rationals, so
    the mean is exact and order-independent — the whole job hash-matches
    the oracle despite float aggregation.  Plan: codegen map (chunk+embed)
    → posexplode → two narrow shuffles (mean_pool); linear in rows×dims."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chunked = docs.select(
        "doc_id", F.posexplode(chunk_fixed_expr(F.col("text"))).alias("pos", "chunk")
    )
    emb = chunked.select("doc_id", hash_embed_expr(F.col("chunk"), 16).alias("vector"))
    pooled = mean_pool(emb, ["doc_id"], "vector", out_col="vector")
    counts = chunked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return counts.join(pooled, "doc_id").select(
        "doc_id", "n_chunks", _vec_str(F.col("vector")).alias("vec")
    )


# --------------------------------------------------------------------------
# q61 — fact-check scoring (A6 formula, deterministic M6 stub).
# --------------------------------------------------------------------------
@register(
    "q61_factcheck_scores",
    covers=("A6", "M6", "F16"),
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_filter(
           list_transform(range(0, greatest(length(text) - 1, 0) + 1, 100),
                          i -> substr(text, i + 1, 100)),
           s -> length(s) > 10) AS stmts
  FROM documents
),
s AS (SELECT doc_id, unnest(stmts) AS stmt FROM c),
t AS (SELECT doc_id, strpos('0123456789abcdef', substr(md5(stmt), 1, 1)) - 1 AS nib FROM s)
SELECT doc_id,
       CAST(sum(CASE WHEN nib < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_confirmed,
       CAST(sum(CASE WHEN nib >= 8 AND nib < 11 THEN 1 ELSE 0 END) AS BIGINT) AS n_refuted,
       count(*) AS n_total,
       floor(least(greatest(
         (sum(CASE WHEN nib < 8 THEN 1 ELSE 0 END)
          - 0.5 * sum(CASE WHEN nib >= 8 AND nib < 11 THEN 1 ELSE 0 END))
         / count(*) * 10, 3.0), 10.0) * 10000) / 10000.0 AS score
FROM t GROUP BY doc_id
""",
)
def q61_factcheck_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-check scoring (validation_utils.py:120-165): statements →
    per-statement verdict → score = clamp(((#confirmed − 0.5·#refuted) /
    total)·10, 3, 10).  The LLM verdict is a deterministic md5-bucket stub
    (50% confirmed / ~19% refuted — SURVEY §7.2 replaces the reference's
    random buckets); the aggregation is the real A6 operator: explode →
    conditional counts → arithmetic, one partial-agg shuffle."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stmts = docs.select(
        "doc_id", F.explode(chunk_fixed_expr(F.col("text"), 100, 0)).alias("stmt")
    )
    nib = F.instr(F.lit(_H), F.substring(F.md5(F.col("stmt")), 1, 1)) - 1
    verdicts = stmts.select("doc_id", nib.alias("nib"))
    n_conf = F.sum(F.when(F.col("nib") < 8, 1).otherwise(0))
    n_ref = F.sum(F.when((F.col("nib") >= 8) & (F.col("nib") < 11), 1).otherwise(0))
    n_tot = F.count(F.lit(1))
    score = F.least(F.greatest((n_conf - 0.5 * n_ref) / n_tot * 10, F.lit(3.0)), F.lit(10.0))
    return verdicts.groupBy("doc_id").agg(
        n_conf.alias("n_confirmed"),
        n_ref.alias("n_refuted"),
        n_tot.alias("n_total"),
        trunc4(score).alias("score"),
    )


# --------------------------------------------------------------------------
# q62 — summarize work-list job (P2 predicate → W2 sort/limit → M5 stub).
# --------------------------------------------------------------------------
@register(
    "q62_summarize_worklist",
    covers=("M5", "P2", "W2", "T1", "T6", "F7", "F10", "S9"),
    oracle=r"""
WITH wl AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 3 <> 0
  ORDER BY n_chars DESC, doc_id
  LIMIT 200
),
w AS (SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
      FROM wl),
s AS (SELECT doc_id, text, words,
             list_transform(range(1, len(words) + 1, 10),
                            i -> array_to_string(list_slice(words, i, i + 9), ' ')) AS sents
      FROM w)
SELECT doc_id,
       CASE WHEN len(words) >= 10 THEN 'ok' ELSE 'fallback' END AS status,
       CASE WHEN len(words) >= 10 THEN len(list_slice(sents, 1, 4)) ELSE 1 END AS n_points,
       CASE WHEN len(words) >= 10 THEN array_to_string(list_slice(sents, 1, 4), chr(10))
            ELSE substr(text, 1, 500) END AS summary
FROM s
""",
)
def q62_summarize_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summarize job (§3.2) as one batch: work-list by status predicate
    (P2 — here `doc_id % 3 <> 0` stands in for `summary IS NULL`), total-
    order sort + batch limit (W2/T6), then the M5 extractive stub: four
    10-word sentences joined by newline (the reference's exactly-4-points
    contract), with the 500-char-truncation fallback + status tag for
    short inputs (summarize_utils.py:67-70, SURVEY §7.2)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    wl = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(200)
        # barrier between the bounded selection and the HOF projection: a
        # transform lambda capturing a projected column defeats the
        # TakeOrderedAndProject pattern and degrades the limit to a GLOBAL
        # Sort + CollectLimit (plan-probed; tools/plan_lint.py catches it).
        # The narrow shuffle of 200 rows also spreads the heavy per-row
        # summarization across the cluster instead of the limit's partition.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    words = tokens(F.col("text"))
    staged = wl.select("doc_id", "text", words.alias("words"))
    sents = F.transform(
        F.sequence(F.lit(1), F.size("words"), F.lit(10)),
        lambda i: F.array_join(F.slice(F.col("words"), i, 10), " "),
    )
    first4 = F.slice(sents, 1, 4)
    ok = F.size("words") >= 10
    return staged.select(
        "doc_id",
        F.when(ok, F.lit("ok")).otherwise(F.lit("fallback")).alias("status"),
        F.when(ok, F.size(first4)).otherwise(F.lit(1)).alias("n_points"),
        F.when(ok, F.array_join(first4, "\n"))
        .otherwise(F.substring("text", 1, 500))
        .alias("summary"),
    )


# --------------------------------------------------------------------------
# q63 — Arrow-batched embedding harness (mapInPandas plumbing under oracle).
# --------------------------------------------------------------------------
@register(
    "q63_embed_arrow_harness",
    covers=("M3",),
    oracle=f"""
SELECT doc_id,
       {_SQL_VEC_STR.format(v=f"list_transform(range(0, 16), d -> {_sql_embed('text', 'd')})")} AS vec
FROM documents
""",
)
def q63_embed_arrow_harness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real M3 plumbing — mapInPandas with a per-executor backend
    singleton and Arrow batching — run with the hash backend, whose output
    is byte-identical to the native stub: the harness itself (schema,
    batch iteration, type coercion) is what the oracle certifies.  The
    'model' backend swaps in sentence-transformers behind the same
    signature (import-gated; NotImplementedError in this container)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    emb = embed_map_in_pandas(docs, "text", "doc_id", dims=16, backend="hash")
    return emb.select("doc_id", _vec_str(F.col("vector")).alias("vec"))
