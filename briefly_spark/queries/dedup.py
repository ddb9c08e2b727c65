"""Dedup pack — corpus-curation operators over ``documents`` / ``embeddings``.

The synthetic corpus has no natural duplicates, so every query first builds
a deterministic duplicated corpus (original ∪ mutated copy, identical
expression in both engines) and then must re-discover exactly the planted
pairs.  The operator under test is the dedup pipeline; the construction is
shared scaffolding.

All hashing is md5-hex-string based (see operators/dedup.py) so Spark and
DuckDB compute byte-identical signatures — candidate sets match exactly,
making even the probabilistic LSH stage hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.numerics import trunc4
from briefly_spark.oracle_guards import guarded_scan, sql_row_cap_cte
from briefly_spark.operators.dedup import (
    exact_dedup,
    jaccard,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_exploded,
    with_shingles,
)
from briefly_spark.queries import register

# shared corpus construction: original docs ∪ copy with last 5 words dropped
_CORPUS_SQL = """
corpus AS (
  SELECT doc_id AS id, source, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS id, source, lang,
         array_to_string(
           list_slice(string_split_regex(text, '\\s+'), 1,
                      greatest(len(string_split_regex(text, '\\s+')) - 5, 1)),
           ' ') AS text
  FROM documents
)
"""

_SHINGLES_SQL = """
sh AS (
  SELECT id, source, lang,
         list_distinct(
           list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM (SELECT id, source, lang, string_split_regex(text, '\\s+') AS w FROM corpus)
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), r"\s+")
    mutant = F.concat_ws(" ", F.slice(words, 1, F.greatest(F.size(words) - 5, F.lit(1))))
    return docs.select(F.col("doc_id").alias("id"), "source", "lang", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("id"), "source", "lang", mutant.alias("text")
        )
    )


# --------------------------------------------------------------------------
# q30 — exact dedup: hash-groupBy, deterministic survivor.
# --------------------------------------------------------------------------
@register(
    "q30_exact_dedup",
    covers=("P5", "U4"),
    oracle="""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT doc_id + 10000 AS id, text FROM documents
),
g AS (
  SELECT md5(text) AS content_md5, min(id) AS keep_id,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM corpus GROUP BY content_md5
),
assign AS (
  SELECT c.id, g.keep_id AS cluster
  FROM corpus c JOIN g ON md5(c.text) = g.content_md5
),
splits AS (
  SELECT id, cluster,
         CASE WHEN ((strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 2, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 3, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 4, 1)) - 1)) % 100 < 5
              THEN 'val'
              WHEN ((strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 2, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 3, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 4, 1)) - 1)) % 100 < 10
              THEN 'test' ELSE 'train' END AS split
  FROM assign
),
dup_pairs AS (
  -- member ↔ survivor, NOT within-cluster all-pairs: k−1 rows per
  -- cluster instead of k·(k−1)/2 (a boilerplate mega-cluster would make
  -- the all-pairs audit quadratic at scale), and audit-equivalent — any
  -- member whose split strays from the cluster's lands off-diagonal
  -- through its survivor pair
  SELECT cluster AS id_a, id AS id_b FROM assign WHERE id <> cluster
),
leak AS (
  SELECT least(sa.split, sb.split) AS split_a,
         greatest(sa.split, sb.split) AS split_b,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM dup_pairs p
  JOIN splits sa ON sa.id = p.id_a
  JOIN splits sb ON sb.id = p.id_b
  GROUP BY 1, 2
)
SELECT 'dedup' AS section, content_md5 AS k,
       CAST(keep_id AS VARCHAR) || '/' || CAST(n_copies AS VARCHAR) AS value
FROM g
UNION ALL
SELECT 'split' AS section, CAST(id AS VARCHAR) AS k,
       CAST(cluster AS VARCHAR) || '/' || split AS value
FROM splits
UNION ALL
SELECT 'leakage' AS section, split_a || '|' || split_b AS k,
       CAST(n_pairs AS VARCHAR) || '/' ||
       CAST(split_a <> split_b AS VARCHAR) AS value
FROM leak
""",
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5-groupBy keeping min id (deterministic
    survivor, unlike the reference's random policies — SURVEY §7.2).  One
    shuffle on the 16-byte digest, not the document text: at 100 TB the
    shuffle payload is keys + ids only.

    r13 graft (X147): the leakage-safe cluster split + its cross-split
    audit (operators/textstats.py:cluster_split/split_leakage_report) on
    the dedup family's own clusters — every member of an exact-dup group
    is assigned by hashing the group's SURVIVOR id, so duplicates can
    never straddle train/test; the 'leakage' section measures that claim
    over the group's internal pairs (all diagonal by construction — and
    the driver hash would catch a regression that broke it).  Output is
    a tidy (section, k, value) long frame."""
    from briefly_spark.operators.textstats import cluster_split, split_leakage_report

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        docs.select((F.col("doc_id") + 10000).alias("id"), "text")
    )
    groups = exact_dedup(corpus, "text", "id")
    dedup_long = groups.select(
        F.lit("dedup").alias("section"),
        F.col("content_md5").alias("k"),
        F.concat_ws(
            "/", F.col("keep_id").cast("string"), F.col("n_copies").cast("string")
        ).alias("value"),
    )
    assign = (
        corpus.select(F.md5("text").alias("content_md5"), "id")
        .join(groups.select("content_md5", "keep_id"), "content_md5")
        .select("id", F.col("keep_id").alias("cluster"))
    )
    splits = cluster_split(assign, id_col="id", cluster_col="cluster")
    split_long = splits.select(
        F.lit("split").alias("section"),
        F.col("id").cast("string").alias("k"),
        F.concat_ws("/", F.col("cluster").cast("string"), F.col("split")).alias(
            "value"
        ),
    )
    # member ↔ survivor pairs (k−1 per cluster): linear in the corpus
    # where within-cluster all-pairs is quadratic in cluster size — a
    # boilerplate mega-cluster at 100 TB would explode the audit join;
    # equivalent for the leakage measurement (every member meets the
    # cluster's split through its survivor pair)
    dup_pairs = assign.filter(F.col("id") != F.col("cluster")).select(
        F.col("cluster").alias("id_a"), F.col("id").alias("id_b")
    )
    leak_long = split_leakage_report(
        splits.select("id", "split"), dup_pairs
    ).select(
        F.lit("leakage").alias("section"),
        F.concat_ws("|", "split_a", "split_b").alias("k"),
        F.concat_ws(
            "/", F.col("n_pairs").cast("string"), F.col("leaks").cast("string")
        ).alias("value"),
    )
    return dedup_long.unionByName(split_long).unionByName(leak_long)


# --------------------------------------------------------------------------
# q31 — MinHash + LSH near-dup pairs; since r13 also the host of X145's
# incremental admission-registry leg, grafted per the r12 composite-first
# policy.
# --------------------------------------------------------------------------
_Q31_SIG_SQL = f"""
WITH {_CORPUS_SQL}, {_SHINGLES_SQL},
hs AS (SELECT id, shingles, list_transform(shingles, s -> md5(s)) AS hh
       FROM sh WHERE len(shingles) > 0),
sig AS (
  SELECT id, shingles,
         list_transform(range(0, 8),
           i -> list_min(list_transform(hh, h -> substr(h, CAST(i * 4 + 1 AS INT), 4)))) AS sg
  FROM hs
),
banded AS (
  SELECT id, shingles, b, md5(sg[2*b + 1] || '|' || sg[2*b + 2]) AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS b)
)"""

#: agreement count between two signatures (i ranges 1..8, 1-based lists)
_Q31_AGREE = "len(list_filter(range(1, 9), i -> s1.sg[i] = s2.sg[i]))"

_Q31_ORACLE = f"""
{_Q31_SIG_SQL},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.shingles AS sa, b.shingles AS sb
  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key AND a.id < b.id
),
pairs AS (
  SELECT id_a, id_b,
         CAST(floor(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                    / len(list_distinct(list_concat(sa, sb))) * 10000) AS BIGINT) AS jac_fp
  FROM cand
),
-- X145 admission replay: batch 0 = originals (id < 100000), batch 1 =
-- mutants, identical signature/band algebra, min_agree = 6 of 8
b0ver AS (
  SELECT c.id_b AS id, c.id_a AS dup_of, 'batch' AS source
  FROM (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.b = b.b AND a.key = b.key AND a.id < b.id
        WHERE a.id < 100000 AND b.id < 100000) c
  JOIN sig s1 ON s1.id = c.id_b JOIN sig s2 ON s2.id = c.id_a
  WHERE {_Q31_AGREE} >= 6
),
b0rej AS (
  SELECT id, min(struct_pack(dup_of := dup_of, source := source)) AS r
  FROM b0ver GROUP BY id
),
adm0 AS (SELECT id FROM corpus WHERE id < 100000
         AND id NOT IN (SELECT id FROM b0rej)),
h1ver AS (
  SELECT c.id, c.old_id AS dup_of, 'history' AS source
  FROM (SELECT DISTINCT nb.id AS id, ob.id AS old_id
        FROM banded nb JOIN banded ob ON nb.b = ob.b AND nb.key = ob.key
        WHERE nb.id >= 100000 AND ob.id < 100000
          AND ob.id IN (SELECT id FROM adm0)) c
  JOIN sig s1 ON s1.id = c.id JOIN sig s2 ON s2.id = c.old_id
  WHERE {_Q31_AGREE} >= 6
),
b1ver AS (
  SELECT c.id_b AS id, c.id_a AS dup_of, 'batch' AS source
  FROM (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.b = b.b AND a.key = b.key AND a.id < b.id
        WHERE a.id >= 100000 AND b.id >= 100000) c
  JOIN sig s1 ON s1.id = c.id_b JOIN sig s2 ON s2.id = c.id_a
  WHERE {_Q31_AGREE} >= 6
),
rej1 AS (
  SELECT id, min(struct_pack(dup_of := dup_of, source := source)) AS r
  FROM (SELECT * FROM h1ver UNION ALL SELECT * FROM b1ver) GROUP BY id
),
adm1 AS (SELECT id FROM corpus WHERE id >= 100000
         AND id NOT IN (SELECT id FROM rej1)),
allrej AS (
  SELECT id, struct_extract(r, 'dup_of') AS dup_of,
         struct_extract(r, 'source') AS source FROM b0rej
  UNION ALL
  SELECT id, struct_extract(r, 'dup_of') AS dup_of,
         struct_extract(r, 'source') AS source FROM rej1
)
SELECT 'pairs' AS section,
       CAST(id_a AS VARCHAR) || '/' || CAST(id_b AS VARCHAR) AS k,
       CAST(jac_fp AS VARCHAR) AS value
FROM pairs WHERE jac_fp >= 4000
UNION ALL
SELECT 'admission' AS section, CAST(id AS VARCHAR) AS k,
       CAST(dup_of AS VARCHAR) || '/' || source AS value
FROM allrej
UNION ALL
SELECT 'summary' AS section, 'batch0' AS k,
       CAST((SELECT count(*) FROM adm0) AS VARCHAR) AS value
UNION ALL
SELECT 'summary' AS section, 'batch1' AS k,
       CAST((SELECT count(*) FROM adm1) AS VARCHAR) AS value
"""


@register(
    "q31_minhash_lsh_pairs",
    covers=("P5",),
    oracle=_Q31_ORACLE,
)
def q31_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection (shingle → 8 min-hashes → 4 bands →
    bucket self-join → exact-Jaccard verify ≥ 0.4).  Candidate generation is
    a band-key equi-join — no quadratic stage; identical md5-string hashing
    on both engines makes even the LSH bucketing hash-comparable.

    r13 graft (X145): the incremental near-dup ADMISSION registry
    (operators/dedup.py:neardup_incremental; crash-replay byte-identical
    per tests/test_neardup_registry.py) replayed over the same corpus as
    two arrival batches — originals first, mutants second.  Batch 1 docs
    are rejected against the absorbed batch-0 history through the banded
    inverted index (never a history scan); the oracle re-derives every
    verdict and both admitted counts declaratively.  Output is a tidy
    (section, k, value) long frame: 'pairs' (the one-shot LSH surface,
    fp4 Jaccard), 'admission' (id → dup_of/source verdicts), 'summary'
    (admitted per batch)."""
    from briefly_spark.operators.dedup import neardup_incremental

    # corpus stays LAZY: its rows are full documents, and materializing
    # them (localCheckpoint) measurably costs more than the recompute
    # (split/slice is CPU-cheap, serializing MB-sized text rows is not) —
    # the materialization boundaries live on the SMALL derived frames
    # instead (signatures/bands/rejects inside neardup_incremental)
    corpus = _corpus(spark, sf_dir)
    pairs_long = minhash_dedup_pairs(
        corpus, "id", "text", n=3, k=8, bands=4, threshold=0.4
    ).select(
        F.lit("pairs").alias("section"),
        F.concat_ws(
            "/", F.col("id_a").cast("string"), F.col("id_b").cast("string")
        ).alias("k"),
        F.round(F.col("jac") * 10000).cast("long").cast("string").alias("value"),
    )

    b0 = corpus.filter(F.col("id") < 100000)
    b1 = corpus.filter(F.col("id") >= 100000)
    empty_band = spark.createDataFrame([], "band INT, key STRING, id BIGINT")
    empty_sig = spark.createDataFrame([], "id BIGINT, sig ARRAY<STRING>")
    adm0, bd0, sd0, rej0 = neardup_incremental(
        b0, empty_band, empty_sig, id_col="id", text_col="text", batch_id=0
    )
    adm1, _bd1, _sd1, rej1 = neardup_incremental(
        b1, bd0, sd0, id_col="id", text_col="text", batch_id=1
    )
    adm_long = rej0.unionByName(rej1).select(
        F.lit("admission").alias("section"),
        F.col("id").cast("string").alias("k"),
        F.concat_ws("/", F.col("dup_of").cast("string"), F.col("source")).alias(
            "value"
        ),
    )
    sum_long = (
        adm0.agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit("summary").alias("section"),
            F.lit("batch0").alias("k"),
            F.col("c").cast("string").alias("value"),
        )
        .unionByName(
            adm1.agg(F.count(F.lit(1)).alias("c")).select(
                F.lit("summary").alias("section"),
                F.lit("batch1").alias("k"),
                F.col("c").cast("string").alias("value"),
            )
        )
    )
    return pairs_long.unionByName(adm_long).unionByName(sum_long)


# --------------------------------------------------------------------------
# q32 — SimHash fingerprints (native bit arithmetic).
# --------------------------------------------------------------------------
@register(
    "q32_simhash_fingerprints",
    covers=("F9",),
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS tokens
  FROM documents
),
hv AS (
  SELECT doc_id,
         list_transform(tokens,
           t -> list_transform(range(1, 9),
                  j -> strpos('0123456789abcdef', substr(md5(t), j, 1)) - 1)) AS hexvals
  FROM toks
)
SELECT doc_id,
       array_to_string(
         list_transform(range(0, 32), b ->
           CASE WHEN list_sum(list_transform(hexvals, h ->
                  2 * (CAST(floor(h[CAST(floor(b / 4) AS INT) + 1]
                                  / pow(2, 3 - (b % 4))) AS INT) % 2) - 1)) > 0
                THEN '1' ELSE '0' END),
         '') AS simhash
FROM hv
""",
)
def q32_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — fingerprints are engine-portable
    (md5-hex votes, sign aggregation), so the banded hamming join
    downstream behaves identically everywhere.  Uses the exploded
    whole-stage-codegen form (explode tokens → native nibble votes → one
    partial-agg shuffle): ~10× the interpreted array-lambda form, and the
    map-side partial aggregation keeps the shuffle O(docs), not O(tokens),
    at the 100 TB design point."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_exploded(docs, "doc_id", "text", 32)


# --------------------------------------------------------------------------
# q33 — blocked n-gram Jaccard pairs (quadratic verify inside blocks).
# --------------------------------------------------------------------------
@register(
    "q33_ngram_jaccard_pairs",
    covers=("J4", "M7"),
    # ARMED row cap (r15 oracle-cost ladder: this blocked-cartesian
    # mirror measured exp 1.85 over sf0.01→sf0.1, ~49 s at sf0.1,
    # ~1 h extrapolated at sf1) — the guard scan feeds the quadratic
    # join's left side, so the refusal is dataflow-structural.  The
    # frame_pairs legs need no cap: the mirror is an inverted-index
    # equi-join bounded by the df ≤ 64 posting cap, not a pair join.
    oracle=f"""
WITH {_CORPUS_SQL}, {_SHINGLES_SQL},
{sql_row_cap_cte("corpus", label="q33_ngram_jaccard_pairs")},
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(floor(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(a.shingles, b.shingles))) * 10000)
              AS BIGINT) AS jac_fp
  FROM {guarded_scan("sh")} a JOIN sh b ON a.source = b.source AND a.lang = b.lang AND a.id < b.id
),
md AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
mf AS (
  SELECT media_id, k.k AS frame_idx,
         md5(substr(text, CAST(k.k * 32 + 1 AS INT), 32)) AS frame_md5
  FROM md, (SELECT unnest(range(0, 16)) AS k) k
  WHERE k.k * 32 + 32 <= n
),
mkept AS (
  SELECT media_id, frame_idx, frame_md5,
         count(*) OVER (PARTITION BY frame_idx, frame_md5) AS df
  FROM mf
),
mpairs AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS shared
  FROM mkept a JOIN mkept b ON a.frame_idx = b.frame_idx
                   AND a.frame_md5 = b.frame_md5 AND a.media_id < b.media_id
  WHERE a.df <= 64
  GROUP BY id_a, id_b
  HAVING count(*) >= 3
)
SELECT 'jaccard' AS section,
       CAST(id_a AS VARCHAR) || '/' || CAST(id_b AS VARCHAR) AS k,
       CAST(jac_fp AS VARCHAR) AS value
FROM pairs WHERE jac_fp >= 6000
UNION ALL
SELECT 'frame_pairs' AS section,
       CAST(id_a AS VARCHAR) || '/' || CAST(id_b AS VARCHAR) AS k,
       CAST(shared AS VARCHAR) AS value
FROM mpairs
""",
)
def q33_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup within blocking key (source, lang) —
    the exact baseline that LSH (q31) approximates, in inverted-index form
    (see :func:`~briefly_spark.operators.dedup.ngram_jaccard_pairs`): only
    pairs sharing ≥1 shingle are generated, |A∩B| is a count aggregation,
    and the shuffle is keyed on (shingle, source, lang) — O(postings), not
    O(block²).  The oracle states the same semantics as the literal
    blocked cartesian; both engines agree because shingle sets are
    distinct arrays.  Threshold note: jac ≥ 0.6 ⟺ floor(jac·10⁴) ≥ 6000
    (0.6·10⁴ is integral and IEEE multiplication is monotone), so the
    operator's untruncated filter and the tidy fixed-point value agree
    engine-exactly.

    r15 graft (capacity policy: q104_frame_fingerprint_pairs' standalone
    seat retired into this host — its own docstring names this query's
    inverted-index discipline as its model): the 'frame_pairs' section
    is media near-dup detection the frame way, the multimodal leg of the
    dedup pack.  Blobs sharing ≥ 3 fixed-offset frame hashes are
    near-dup candidates (re-encoded copies, watermarked variants, shared
    intros); candidates come from an equi-join on (frame_idx, frame_md5)
    postings — O(matching postings), never an all-pairs blob compare —
    and the blob never leaves its scan (only 16-byte hashes shuffle).
    The df ≤ 64 posting cap drops frames whose list explodes (shared
    codec headers — the stop-word hazard of every inverted index; no
    near-dup signal there anyway); it is a window count over the ONE
    postings frame and semantics-preserving at gate scale (max posting
    list measured: 4)."""
    from briefly_spark.operators.multimodal import frame_fingerprints, media_corpus

    corpus = _corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        corpus, "id", "text", n=3, threshold=0.6, block_cols=("source", "lang")
    )
    jac_long = pairs.select(
        F.lit("jaccard").alias("section"),
        F.concat_ws(
            "/", F.col("id_a").cast("string"), F.col("id_b").cast("string")
        ).alias("k"),
        F.floor(F.col("jac") * 10000).cast("long").cast("string").alias("value"),
    )
    media = media_corpus(spark, sf_dir)
    fp = frame_fingerprints(media, frame_bytes=32, n_frames=16)
    kept = fp.withColumn(
        "df",
        F.count(F.lit(1)).over(Window.partitionBy("frame_idx", "frame_md5")),
    ).filter(F.col("df") <= 64)
    frame_long = (
        kept.select(F.col("media_id").alias("id_a"), "frame_idx", "frame_md5")
        .join(
            fp.select(F.col("media_id").alias("id_b"), "frame_idx", "frame_md5"),
            ["frame_idx", "frame_md5"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 3)
        .select(
            F.lit("frame_pairs").alias("section"),
            F.concat_ws(
                "/", F.col("id_a").cast("string"), F.col("id_b").cast("string")
            ).alias("k"),
            F.col("shared").cast("string").alias("value"),
        )
    )
    return jac_long.unionByName(frame_long)


# --------------------------------------------------------------------------
# q138 — LSH banding calibration: empirical collision S-curve vs theory.
# --------------------------------------------------------------------------
def _scurve_items(dialect: str) -> list[str]:
    """Staged integer fixed-point items ending in ``… AS theory_fp``: the
    analytic banded-MinHash collision probability 1 − (1 − s^r)^b at the
    bucket's Jaccard midpoint, for r=2 rows × b=4 bands (the q31
    configuration).  Pure BIGINT arithmetic — squarings at 10⁴ scale with
    floor-div renormalization — so both engines emit identical integers
    (no library pow anywhere)."""
    div = "div" if dialect == "spark" else "//"
    return [
        "(bucket * 1000 + 500) AS __mid",                       # decile midpoint, fp4
        f"((__mid * __mid) {div} 10000) AS __s2",               # s^r, r=2
        "(10000 - __s2) AS __pno",                              # 1 - s^r
        f"((__pno * __pno) {div} 10000) AS __p2",               # (1-s^r)^2
        f"((__p2 * __p2) {div} 10000) AS __p4",                 # (1-s^r)^4, b=4
        "CAST((10000 - __p4) AS BIGINT) AS theory_fp",
    ]


#: CTE chain for the banding-calibration legs, shared into the q122 host
#: oracle (r15 graft — the standalone q138 seat is retired).  ``post``
#: scans through the host's row-cap guard so the quadratic ``co`` join
#: inherits the structural refusal.
_CALIB_CTES = f"""post AS (SELECT id, unnest(shingles) AS s FROM {guarded_scan("sh")}),
sz AS (SELECT id, len(shingles) AS sz FROM sh),
co AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM post a JOIN post b ON a.s = b.s AND a.id < b.id
  GROUP BY id_a, id_b
),
truth AS MATERIALIZED (
  SELECT co.id_a, co.id_b,
         CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) AS jac
  FROM co JOIN sz za ON za.id = co.id_a JOIN sz zb ON zb.id = co.id_b
  WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.1
),
hs AS (SELECT id, list_transform(shingles, s -> md5(s)) AS hh FROM sh),
sig AS (
  SELECT id,
         list_transform(range(0, 8),
           i -> list_min(list_transform(hh, h -> substr(h, CAST(i * 4 + 1 AS INT), 4)))) AS sg
  FROM hs
),
banded AS (
  SELECT id, b, md5(sg[2*b + 1] || '|' || sg[2*b + 2]) AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key AND a.id < b.id
),
flag AS (
  SELECT t.jac, CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
),
rep AS (
  SELECT least(CAST(floor(jac * 10) AS BIGINT), 9) AS bucket,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(hit) AS BIGINT) AS n_cand
  FROM flag GROUP BY bucket
)"""

_CALIB_SECTION_SQL = f"""
SELECT 'lsh_calibration' AS section, CAST(bucket AS VARCHAR) AS k,
       CAST(n_pairs AS VARCHAR) || '/' || CAST(n_cand AS VARCHAR) || '/' ||
       CAST(hit_rate_fp AS VARCHAR) || '/' || CAST(theory_fp AS VARCHAR) AS value
FROM (
  SELECT bucket, n_pairs, n_cand,
         CAST((n_cand * 10000) // n_pairs AS BIGINT) AS hit_rate_fp,
         {', '.join(_scurve_items('duckdb'))}
  FROM rep
)"""



# --------------------------------------------------------------------------
# q122 — asymmetric shingle containment (subset-duplicate detection).
# --------------------------------------------------------------------------
@register(
    "q122_shingle_containment",
    covers=("J4", "P5", "A3"),
    # ARMED row cap (r15 ladder: exp 1.74, ~38 s at sf0.1, ~34 min
    # extrapolated at sf1) — same structural guard as q33; the
    # calibration legs' quadratic co join scans through the same guard.
    oracle=f"""
WITH {_CORPUS_SQL}, {_SHINGLES_SQL},
{sql_row_cap_cte("corpus", label="q122_shingle_containment")},
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
         CAST(len(a.shingles) AS BIGINT) AS sa,
         CAST(len(b.shingles) AS BIGINT) AS sb
  FROM {guarded_scan("sh")} a JOIN sh b
    ON a.source = b.source AND a.lang = b.lang AND a.id < b.id
  WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
),
scored AS (
  SELECT id_a, id_b, inter, sa, sb, cont_a_fp, cont_b_fp
  FROM (SELECT id_a, id_b, inter, sa, sb,
               (inter * 10000) // sa AS cont_a_fp,
               (inter * 10000) // sb AS cont_b_fp
        FROM pairs)
  WHERE greatest(cont_a_fp, cont_b_fp) >= 8000
),
{_CALIB_CTES}
SELECT 'containment' AS section,
       CAST(id_a AS VARCHAR) || '/' || CAST(id_b AS VARCHAR) AS k,
       CAST(inter AS VARCHAR) || '/' || CAST(sa AS VARCHAR) || '/' ||
       CAST(sb AS VARCHAR) || '/' || CAST(cont_a_fp AS VARCHAR) || '/' ||
       CAST(cont_b_fp AS VARCHAR) AS value
FROM scored
UNION ALL
{_CALIB_SECTION_SQL}
""",
)
def q122_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup — |A∩B|/|A| vs |A∩B|/|B| per shingle-
    sharing pair, keeping pairs where EITHER direction ≥ 0.8: the
    subset-duplicate detector symmetric Jaccard (q33) structurally misses
    (the planted corpus proves it — the truncated mutant of a long doc has
    containment 1.0 in the original but Jaccard well below the q33 cut for
    short docs).  A curation pipeline runs both: Jaccard for mutual
    near-dups, containment for quote-expansions, wrapper pages and
    wholesale inclusions.

    Plan: the q33 inverted-index discipline (postings equi-join on
    (shingle, source, lang), count-agg intersection — O(postings), never
    O(block²)) WITHOUT the Jaccard size-ratio prune, which would drop
    exactly the asymmetric pairs this query exists to find; scores are
    integer fixed-point divisions, engine-exact with no doubles.  The
    oracle states the quadratic blocked semantics; its empty-shingle guard
    is vacuous on the Spark side (pairs only arise from a shared
    shingle).

    r15 graft (capacity policy: q138_lsh_calibration's standalone seat
    retired into this host — both queries audit the same shingle space
    and the standalone seat rebuilt it from scratch): the
    'lsh_calibration' section is the MinHash-LSH banding calibration
    curve, the audit read before trusting the q31 near-dup rung at
    100 TB.  For every exact-Jaccard decile bucket (ground truth from
    the q33 inverted-index pairs, floored at jac ≥ 0.1 — the 0-decile is
    unbounded at scale, every pair sharing one stopword trigram), the
    fraction of pairs the k=8/b=4 banding actually surfaced as
    candidates, next to the analytic S-curve 1 − (1 − s²)⁴ at the bucket
    midpoint (Broder; Leskovec-Rajaraman-Ullman ch. 3).  Empirical ≪
    theory in a high bucket is a recall hole; a fat low bucket is wasted
    verify work.  Ground truth is a postings equi-join (bounded by token
    count), candidates the q31 band-key equi-join (ids only — shingles
    never ride the ×4 explode), the flag join pair-keyed, the report 9
    rows; the theory column is pure BIGINT fixed-point, engine-exact."""
    from briefly_spark.operators.dedup import (
        lsh_candidate_pairs,
        shingle_containment_pairs,
    )

    corpus = _corpus(spark, sf_dir)
    # ONE shingling pass feeds all three legs (r15 review finding: the
    # graft's whole point was sharing the shingle space, but each leg
    # re-scanned and re-shingled the corpus) — persist the shingled frame
    # and hand it to the pair ops via their shingles_col hook
    shingled = with_shingles(corpus, "text", 3).persist()
    cont_long = shingle_containment_pairs(
        shingled, "id", "text", n=3, threshold_fp=8000,
        block_cols=("source", "lang"), shingles_col="shingles",
    ).select(
        F.lit("containment").alias("section"),
        F.concat_ws(
            "/", F.col("id_a").cast("string"), F.col("id_b").cast("string")
        ).alias("k"),
        F.concat_ws(
            "/",
            F.col("inter").cast("string"),
            F.col("sa").cast("string"),
            F.col("sb").cast("string"),
            F.col("cont_a_fp").cast("string"),
            F.col("cont_b_fp").cast("string"),
        ).alias("value"),
    )
    truth = ngram_jaccard_pairs(
        shingled, "id", "text", n=3, threshold=0.1, shingles_col="shingles"
    )
    cand = (
        lsh_candidate_pairs(
            shingled.select("id", "shingles"), "id", "shingles", k=8, bands=4
        )
        .select("id_a", "id_b")
        .withColumn("hit", F.lit(1))
    )
    rep = (
        truth.join(cand, ["id_a", "id_b"], "left")
        .select(
            F.expr("least(CAST(floor(jac * 10) AS BIGINT), 9)").alias("bucket"),
            F.coalesce("hit", F.lit(0)).alias("hit"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("hit").cast("long").alias("n_cand"),
        )
    )
    calib_long = rep.selectExpr(
        "bucket", "n_pairs", "n_cand",
        "CAST((n_cand * 10000) div n_pairs AS BIGINT) AS hit_rate_fp",
        *_scurve_items("spark"),
    ).select(
        F.lit("lsh_calibration").alias("section"),
        F.col("bucket").cast("string").alias("k"),
        F.concat_ws(
            "/",
            F.col("n_pairs").cast("string"),
            F.col("n_cand").cast("string"),
            F.col("hit_rate_fp").cast("string"),
            F.col("theory_fp").cast("string"),
        ).alias("value"),
    )
    return cont_long.unionByName(calib_long)


# --------------------------------------------------------------------------
# q34 — embedding cosine near-dup (label-blocked).
# --------------------------------------------------------------------------
@register(
    "q34_embedding_near_dup",
    covers=("J4", "J5"),
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id, label,
         list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) + CASE WHEN i = 1 THEN 0.1 ELSE 0 END) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
  FROM corpus a JOIN corpus b ON a.label = b.label AND a.id < b.id
)
SELECT id_a, id_b, floor(cos * 10000) / 10000.0 AS sim
FROM pairs WHERE cos >= 0.99
""",
)
def q34_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: label-blocked pair join + native
    zip_with/aggregate dot product, threshold 0.99.  The planted perturbed
    copies (+0.1 on dim 0) are exactly what must be found.  At 100 TB the
    blocking key comes from LSH bucketing (q31 pattern) instead of a label
    column; the verify stage is unchanged."""
    from briefly_spark.functions.vectors import dot, l2_norm

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    orig = emb.select(
        F.col("vec_id").alias("id"),
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("id"),
        "label",
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") + F.when(i == 0, F.lit(0.1)).otherwise(F.lit(0.0)),
        ).alias("v"),
    )
    # Staged per-row stats: full norm n, the first-8-dims head slice h, and
    # the tail norm tn = ||v[9..64]||.  Cauchy–Schwarz gives the exact upper
    # bound  dot(a,b) ≤ dot(a.h,b.h) + a.tn·b.tn,  so the join condition
    # can prune any pair that provably cannot reach cos ≥ 0.99 with an
    # 8-dim fold instead of the 64-dim one — on random-vector blocks the
    # bound evaluates to ≈0.875·na·nb, killing ~all non-dup pairs before
    # the expensive fold.  The final cos formula is untouched (same fold,
    # same operand order), so oracle hashes cannot move.
    corpus = (
        orig.unionByName(pert)
        .withColumn("n", l2_norm(F.col("v")))
        .withColumn("h", F.slice(F.col("v"), 1, 8))
        .withColumn("t", F.slice(F.col("v"), 9, 56))
        .withColumn("tn", l2_norm(F.col("t")))
        .drop("t")
    )
    # Slice-salt the pair join: blocking on `label` alone leaves ≤10
    # distinct join keys — at most 10 parallel tasks for the quadratic
    # stage regardless of cluster size.  Salting side b into SLICES
    # id-hash groups and replicating side a across all slices keeps the
    # pair set identical while multiplying parallelism (the standard
    # exact block-join parallelization; same trick scales to 1000
    # executors at the 100 TB design point).
    SLICES = 16
    a = corpus.withColumn(
        "slice", F.explode(F.sequence(F.lit(0), F.lit(SLICES - 1)))
    ).alias("a")
    b = corpus.withColumn("slice", F.pmod(F.xxhash64("id"), F.lit(SLICES))).alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    upper = dot(F.col("a.h"), F.col("b.h")) + F.col("a.tn") * F.col("b.tn")
    cos = F.when(
        (na > 0) & (nb > 0), dot(F.col("a.v"), F.col("b.v")) / (na * nb)
    ).otherwise(F.lit(0.0))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id"))
            & (upper >= F.lit(0.99) * na * nb),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cos"))
        .filter(F.col("cos") >= 0.99)
        .select("id_a", "id_b", trunc4(F.col("cos")).alias("sim"))
    )


# --------------------------------------------------------------------------
# q36 — benchmark decontamination (cross-corpus n-gram overlap).
# --------------------------------------------------------------------------
@register(
    "q36_decontaminate",
    covers=("J3", "A4"),
    oracle=r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(ws) - 2, 0) + 1),
           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shingles
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
        FROM documents)
),
bench AS (SELECT doc_id AS bench_id, shingles FROM sh WHERE doc_id % 50 = 0),
pairs AS (
  SELECT s.doc_id, b.bench_id,
         len(list_intersect(s.shingles, b.shingles)) AS shared
  FROM sh s JOIN bench b ON s.doc_id <> b.bench_id
)
SELECT doc_id,
       count(*) AS n_bench_matches,
       CAST(max(shared) AS BIGINT) AS max_shared
FROM pairs WHERE shared >= 2
GROUP BY doc_id
""",
)
def q36_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the standard pre-training hygiene pass
    (flag training documents sharing ≥ 2 distinct word 3-grams with any
    eval-set document; doc_id%50 stands in for the benchmark sample).

    Spark-first shape: NO doc×bench pair join — both sides explode to
    shingle postings and meet in an equi-join keyed on the shingle, so the
    shuffle is O(postings) and the join fans out only where an actual
    overlap exists (the same inverted-index discipline as q33).  The
    oracle states identical semantics as a literal pair join, which DuckDB
    can afford at gate scale."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = with_shingles(docs.select("doc_id", "text"), "text", 3)
    postings = sh.select("doc_id", F.explode("shingles").alias("s"))
    bench = postings.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    shared = (
        postings.join(bench, "s")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    return shared.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("shared").alias("max_shared"),
    )


# --------------------------------------------------------------------------
# q37 — near-dup cluster resolution: pairs → connected components →
# deterministic survivor per cluster.
# --------------------------------------------------------------------------
def _q37_oracle_prefix() -> str:
    """The recursive-CTE fixpoint shared by q37 and q29: MinHash pairs →
    symmetric edges → min reachable label per node."""
    return f"""
WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLES_SQL},
hs AS (SELECT id, shingles, list_transform(shingles, s -> md5(s)) AS hh FROM sh),
sig AS (
  SELECT id, shingles,
         list_transform(range(0, 8),
           i -> list_min(list_transform(hh, h -> substr(h, CAST(i * 4 + 1 AS INT), 4)))) AS sg
  FROM hs
),
banded AS (
  SELECT id, shingles, b, md5(sg[2*b + 1] || '|' || sg[2*b + 2]) AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.shingles AS sa, b.shingles AS sb
  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key AND a.id < b.id
),
pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE floor(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
              / len(list_distinct(list_concat(sa, sb))) * 10000) / 10000.0 >= 0.4
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach AS (
  SELECT id AS u, id AS lbl FROM corpus
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
),
comp AS (SELECT u AS id, min(lbl) AS component FROM reach GROUP BY u)
"""


# --------------------------------------------------------------------------
# q29 — quality-aware survivor election: clusters (via the STAR-contraction
# CC variant) + per-cluster argmax-quality keep decision.
# --------------------------------------------------------------------------
@register(
    "q29_dedup_survivors",
    covers=("P5", "W4"),
    oracle=_q37_oracle_prefix()
    + """,
qual AS (SELECT id, len(string_split_regex(text, '\\s+')) AS n_tokens FROM corpus)
SELECT id, component, n_tokens,
       (row_number() OVER (PARTITION BY component ORDER BY n_tokens DESC, id) = 1)
         AS is_survivor,
       count(*) OVER (PARTITION BY component) AS n_members
FROM comp JOIN qual USING (id)
""",
)
def q29_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's KEEP decision end-to-end: near-dup clusters
    (q37's pair set) + quality-aware survivor election — keep the highest-
    token-count member per cluster, ties to the smallest id.  Unlike q37's
    min-id survivor this is the policy real pipelines run ("keep the
    longest copy"): here the mutant copies (last 5 words dropped) always
    lose to their originals, which the oracle verifies per cluster.

    Runs :func:`connected_components` with ``method="star"`` — the
    large-star/small-star O(log n) contraction — so the adversarial-chain
    variant sits under the driver's hash gate too (the min-propagation
    default is gated by q37; both must produce identical labels).  The
    election is two window functions over ONE (component) shuffle."""
    from briefly_spark.operators.dedup import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(corpus, "id", "text", n=3, k=8, bands=4, threshold=0.4)
    comp = connected_components(
        corpus.select("id"), pairs.select("id_a", "id_b"), method="star"
    )
    qual = corpus.select("id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"))
    w = Window.partitionBy("component")
    elect = w.orderBy(F.desc("n_tokens"), F.asc("id"))
    return (
        comp.join(qual, "id")
        .select(
            "id",
            "component",
            "n_tokens",
            (F.row_number().over(elect) == 1).alias("is_survivor"),
            F.count(F.lit(1)).over(w).alias("n_members"),
        )
    )


def _q37_oracle() -> str:
    from briefly_spark.operators.fuzzy import sql_fuzzy_dedup_pairs

    fuzzy = sql_fuzzy_dedup_pairs(
        "(SELECT id, substr(text, 1, 40) AS head FROM corpus)",
        id_col="id",
        text_col="head",
        max_dist=1,
    )
    return (
        _q37_oracle_prefix()
        + f"""
SELECT 'cluster' AS section, CAST(id AS VARCHAR) AS k,
       CAST(component AS VARCHAR) || '/' ||
       CAST(component = id AS VARCHAR) AS value
FROM comp
UNION ALL
SELECT 'fuzzy' AS section,
       CAST(left_id AS VARCHAR) || '/' || CAST(right_id AS VARCHAR) AS k,
       CAST(dist AS VARCHAR) AS value
FROM ({fuzzy})
UNION ALL
SELECT 'size_histogram' AS section, CAST(cluster_size AS VARCHAR) AS k,
       CAST(n_clusters AS VARCHAR) || '/' ||
       CAST(cluster_size * n_clusters AS VARCHAR) AS value
FROM (
  SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
  FROM (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY component)
  GROUP BY cluster_size
)
"""
    )


@register(
    "q37_dup_clusters",
    covers=("P5", "A3"),
    oracle=_q37_oracle(),
)
def q37_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step AFTER near-dup pair generation: resolve the q31 MinHash-LSH
    pair set into duplicate clusters via :func:`connected_components`
    (iterative min-label propagation, one shuffle per round,
    lineage-truncated) and elect the smallest id as each cluster's
    deterministic survivor.  Pairs alone can't answer "which copy do we
    keep" once duplicates chain A~B~C; the component label can.  The
    oracle computes the same fixpoint with a recursive CTE (min reachable
    id per node), certifying the distributed iteration against a
    declarative ground truth — singletons label themselves, survivors are
    component minima.

    r13 graft (X143): a second section carries the edit-distance
    similarity join as a fuzzy-tier pair source — every unordered pair of
    corpus docs whose 40-char head keys are within 1 edit (q-gram prefix
    filtering, operators/fuzzy.py; the planted mutants share their
    original's head, so the fuzzy tier re-finds them at dist 0).  The
    oracle side is deliberately the BRUTE-FORCE all-pairs plan, so the
    driver hash pins candidate completeness of the prefix filter on real
    data, not just agreement on a shared shortcut."""
    from briefly_spark.operators.dedup import connected_components
    from briefly_spark.operators.fuzzy import fuzzy_dedup_pairs

    # corpus stays LAZY (materializing full-text rows costs more than the
    # recompute — see q31); the fuzzy leg's materialization boundary is
    # the small heads frame below
    corpus = _corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(corpus, "id", "text", n=3, k=8, bands=4, threshold=0.4)
    # comp feeds two sections — persist (lazy, the q102 trans.persist()
    # discipline): the CC iteration checkpoints its LABEL frame
    # internally, but the singleton left join and corpus id scans sit
    # above that checkpoint and would replay per section (r15 review
    # finding, visible as doubled SortMergeJoin/FileScan in plan_shape)
    comp = connected_components(
        corpus.select("id"), pairs.select("id_a", "id_b")
    ).persist()
    cluster_long = comp.select(
        F.lit("cluster").alias("section"),
        F.col("id").cast("string").alias("k"),
        F.concat_ws(
            "/",
            F.col("component").cast("string"),
            (F.col("component") == F.col("id")).cast("string"),
        ).alias("value"),
    )
    # heads is referenced by every fuzzy join arm (grams, both fringe
    # legs, the verify hydration) — materialize the (id, 40-char head)
    # frame once so the corpus construction (mutant split/slice/concat
    # over full texts) doesn't replay per arm (the q128 idiom; measured
    # 10 s → ~3 s on the r13 graft at sf0.1)
    heads = corpus.select(
        "id", F.substring("text", 1, 40).alias("head")
    ).localCheckpoint(eager=True)
    # q=5: completeness is q-independent (the oracle is the brute-force
    # plan), but candidate volume isn't — longer grams are rarer, and the
    # measured sf0.1 ladder is q=2 29.9 s / q=3 6.4 s / q=5 4.0 s for the
    # identical 5857-pair output
    fuzzy_long = fuzzy_dedup_pairs(
        heads, id_col="id", text_col="head", max_dist=1, q=5
    ).select(
        F.lit("fuzzy").alias("section"),
        F.concat_ws(
            "/", F.col("left_id").cast("string"), F.col("right_id").cast("string")
        ).alias("k"),
        F.col("dist").cast("string").alias("value"),
    )
    # r15 graft (capacity policy: q123_dup_cluster_histogram's standalone
    # seat retired into this host — the histogram is q37's own component
    # frame re-aggregated, so a separate driver row re-ran the entire
    # pair+CC pipeline to gate two dimension-bounded shuffles): the
    # cluster-size histogram of the near-dup graph — how many singletons,
    # pairs, k-cliques — the one-page duplication profile a curation run
    # reports before/after dedup, and the standard check that duplicate
    # mass follows the expected power law rather than one pathological
    # mega-cluster.  value = n_clusters/n_docs at each size.
    hist_long = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.lit("size_histogram").alias("section"),
            F.col("cluster_size").cast("string").alias("k"),
            F.concat_ws(
                "/",
                F.col("n_clusters").cast("string"),
                (F.col("cluster_size") * F.col("n_clusters")).cast("string"),
            ).alias("value"),
        )
    )
    return cluster_long.unionByName(fuzzy_long).unionByName(hist_long)


# --------------------------------------------------------------------------
# q123 — duplication profile: near-dup cluster-size histogram.
# (Briefly retired into q37's 'size_histogram' section mid-r15; restored
# as a standalone seat at the r15 optimization open — the driver contract
# forbids a declared query disappearing between rounds.  The host section
# stays; both share _q37_oracle_prefix.)
# --------------------------------------------------------------------------
@register(
    "q123_dup_cluster_histogram",
    covers=("P5", "A3"),
    oracle=_q37_oracle_prefix()
    + """,
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY component
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
""",
)
def q123_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile — the cluster-size histogram of the
    near-dup graph (how many singletons, pairs, k-cliques…): the one-page
    number a curation run reports before/after dedup (dup rate = 1 −
    n_clusters/n_docs summed over the histogram), and the standard check
    that duplicate mass follows the expected power law rather than one
    pathological mega-cluster (which would indicate boilerplate leaking
    past the quality filters, the q95 template-hub signal in aggregate).

    Plan: q37's pair generation + connected components unchanged, then
    TWO partial-agg shuffles over the component frame (component → size,
    size → histogram) — the histogram is bounded by the largest cluster
    size, dimension-sized however large the corpus."""
    from briefly_spark.operators.dedup import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(corpus, "id", "text", n=3, k=8, bands=4, threshold=0.4)
    comp = connected_components(corpus.select("id"), pairs.select("id_a", "id_b"))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    ).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
    )


# --------------------------------------------------------------------------
# q138 — LSH banding calibration: empirical collision S-curve vs theory.
# (Briefly retired into q122's 'lsh_calibration' section mid-r15; restored
# as a standalone seat at the r15 optimization open — the driver contract
# forbids a declared query disappearing between rounds.  The host section
# stays; _scurve_items above is shared by both.)
# --------------------------------------------------------------------------
_Q138_ORACLE = f"""
WITH {_CORPUS_SQL}, {_SHINGLES_SQL},
post AS (SELECT id, unnest(shingles) AS s FROM sh),
sz AS (SELECT id, len(shingles) AS sz FROM sh),
co AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM post a JOIN post b ON a.s = b.s AND a.id < b.id
  GROUP BY id_a, id_b
),
truth AS MATERIALIZED (
  SELECT co.id_a, co.id_b,
         CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) AS jac
  FROM co JOIN sz za ON za.id = co.id_a JOIN sz zb ON zb.id = co.id_b
  WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.1
),
hs AS (SELECT id, list_transform(shingles, s -> md5(s)) AS hh FROM sh),
sig AS (
  SELECT id,
         list_transform(range(0, 8),
           i -> list_min(list_transform(hh, h -> substr(h, CAST(i * 4 + 1 AS INT), 4)))) AS sg
  FROM hs
),
banded AS (
  SELECT id, b, md5(sg[2*b + 1] || '|' || sg[2*b + 2]) AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key AND a.id < b.id
),
flag AS (
  SELECT t.jac, CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
),
rep AS (
  SELECT least(CAST(floor(jac * 10) AS BIGINT), 9) AS bucket,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(hit) AS BIGINT) AS n_cand
  FROM flag GROUP BY bucket
)
SELECT bucket, n_pairs, n_cand, hit_rate_fp, theory_fp FROM (
  SELECT bucket, n_pairs, n_cand,
         CAST((n_cand * 10000) // n_pairs AS BIGINT) AS hit_rate_fp,
         {', '.join(_scurve_items('duckdb'))}
  FROM rep
)
"""


@register("q138_lsh_calibration", covers=("J4", "A3"), oracle=_Q138_ORACLE)
def q138_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding calibration curve — the audit read before
    trusting the q31 near-dup rung at 100 TB: for every exact-Jaccard
    decile bucket (ground truth from the q33 inverted-index pairs,
    floored at jac ≥ 0.1), the fraction of pairs the k=8/b=4 banding
    actually surfaced as candidates, NEXT TO the analytic S-curve
    1 − (1 − s²)⁴ at the bucket midpoint (Broder/LSH theory;
    Leskovec-Rajaraman-Ullman ch. 3).  Empirical ≪ theory in a high
    bucket means the banding is missing true near-dups (recall hole);
    a fat low bucket quantifies the wasted verify work (precision).

    The jac ≥ 0.1 floor is structural, not a shortcut: the 0-decile
    (all pairs sharing ANY shingle) is unbounded at scale — every pair
    sharing one stopword trigram — while deciles 1+ inherit the exact
    size-ratio prune, and banding is only ever tuned on them.

    Plan shape at 100 TB: ground truth is the q33 postings equi-join
    (shuffle on shingle keys, bounded by token count, AQE-skew-split);
    candidates are the q31 band-key equi-join (ids only — shingles never
    ride the ×4 explode); the flag join is pair-keyed; the report is 9
    rows.  Theory column is pure BIGINT arithmetic — engine-exact.

    Hash caveat shared with q31/q33 (documented there): md5-string
    min-hashing makes the LSH bucketing itself engine-comparable."""
    corpus = _corpus(spark, sf_dir)
    truth = ngram_jaccard_pairs(corpus, "id", "text", n=3, threshold=0.1)
    shingled = with_shingles(
        corpus.select("id", "text"), "text", 3, out="sh"
    ).select("id", "sh")
    from briefly_spark.operators.dedup import lsh_candidate_pairs

    cand = (
        lsh_candidate_pairs(shingled, "id", "sh", k=8, bands=4)
        .select("id_a", "id_b")
        .withColumn("hit", F.lit(1))
    )
    rep = (
        truth.join(cand, ["id_a", "id_b"], "left")
        .select(
            F.expr("least(CAST(floor(jac * 10) AS BIGINT), 9)").alias("bucket"),
            F.coalesce("hit", F.lit(0)).alias("hit"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("hit").cast("long").alias("n_cand"),
        )
    )
    return rep.selectExpr(
        "bucket", "n_pairs", "n_cand",
        "CAST((n_cand * 10000) div n_pairs AS BIGINT) AS hit_rate_fp",
        *_scurve_items("spark"),
    ).select("bucket", "n_pairs", "n_cand", "hit_rate_fp", "theory_fp")

