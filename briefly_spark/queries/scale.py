"""Scale-levers pack — operators whose entire point is the 100 TB cost
model: a broadcast Bloom-filter prefilter for benchmark decontamination
(q97), multi-dimensional z-order layout with file-level min-max pruning
stats (q98), and a deterministic per-group sample for reproducible eval
carving (q99).

Everything here is engine-exact by construction: the Bloom hash positions
come from the md5-nibble hash16 (no base-conversion builtins), the bitset
words are sums of distinct power-of-two masks (sum == bitwise-OR for
distinct bits), and the z-values are pure integer div/mod arithmetic —
so the DuckDB oracles replicate Spark bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.operators.dedup import with_shingles
from briefly_spark.operators.textstats import _hash16
from briefly_spark.queries import register

# ---- shared dialect helpers ----------------------------------------------

_HEX = "0123456789abcdef"


def _sql_hash16(expr: str) -> str:
    """DuckDB mirror of operators/textstats._hash16 (first 4 md5 nibbles)."""
    nib = lambda j: f"(strpos('{_HEX}', substr(md5({expr}), {j}, 1)) - 1)"  # noqa: E731
    return f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"


def _z_interleave_sql(xb: str, yb: str, dialect: str, bits: int = 8) -> str:
    """Two-dim z-value (x on the odd bits) — the shared N-dim generator
    from functions/layout.py, which the storage write path
    (Warehouse.write_zorder) uses too, so the audit here and the actual
    layout share one definition."""
    from briefly_spark.functions.layout import z_interleave_sql

    return z_interleave_sql([xb, yb], dialect, bits)


# --------------------------------------------------------------------------
# q97 — Bloom-filter decontamination prefilter.
# --------------------------------------------------------------------------
@register(
    "q97_bloom_decontaminate",
    covers=("J3", "A4"),
    oracle=r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(ws) - 2, 0) + 1),
           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shingles
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
        FROM documents)
),
ds AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
bench AS (SELECT DISTINCT s FROM ds WHERE doc_id % 50 = 0),
pos AS (
  SELECT DISTINCT p FROM (
    SELECT {H1} AS p FROM bench
    UNION SELECT {H2} AS p FROM bench)
),
bits AS (
  SELECT p // 32 AS word,
         CAST(sum(CAST(power(2, p % 32) AS BIGINT)) AS BIGINT) AS bits
  FROM pos GROUP BY 1
),
cand AS (SELECT doc_id, s, {H1S} AS p1, {H2S} AS p2
         FROM ds WHERE doc_id % 50 <> 0),
probed AS (
  SELECT cand.doc_id, cand.s,
         CASE WHEN b1.bits IS NOT NULL
                   AND (b1.bits & CAST(power(2, cand.p1 % 32) AS BIGINT)) <> 0
              THEN 1 ELSE 0 END
       * CASE WHEN b2.bits IS NOT NULL
                   AND (b2.bits & CAST(power(2, cand.p2 % 32) AS BIGINT)) <> 0
              THEN 1 ELSE 0 END AS s_hit
  FROM cand
  LEFT JOIN bits b1 ON b1.word = cand.p1 // 32
  LEFT JOIN bits b2 ON b2.word = cand.p2 // 32
),
bloom AS (SELECT doc_id, CAST(max(s_hit) AS BIGINT) AS bloom_hit
          FROM probed GROUP BY doc_id),
exact AS (SELECT DISTINCT c.doc_id
          FROM (SELECT doc_id, s FROM ds WHERE doc_id % 50 <> 0) c
          JOIN bench USING (s))
SELECT bloom.doc_id, bloom_hit,
       CAST(CASE WHEN exact.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS exact_hit
FROM bloom LEFT JOIN exact ON bloom.doc_id = exact.doc_id
""".replace("{H1}", _sql_hash16("s || '#1'"))
   .replace("{H2}", _sql_hash16("s || '#2'"))
   .replace("{H1S}", _sql_hash16("s || '#1'"))
   .replace("{H2S}", _sql_hash16("s || '#2'")),
)
def q97_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a broadcast Bloom prefilter — the 100 TB form
    of q36.  The benchmark shingle set is folded into a 64 Kbit Bloom
    bitset (k=2 md5-nibble hashes; the bitset frame is ≤ 2048 rows of
    32-bit words REGARDLESS of benchmark size) and broadcast; every
    training shingle tests membership map-side via two tiny equi-joins on
    the word index.  Only Bloom-positive docs would proceed to the exact
    postings join (q36's shape), so the expensive shuffle shrinks from
    |corpus| to |positives| — here both columns are emitted per doc so
    the oracle verifies the Bloom's structural guarantee: no false
    negatives (exact_hit=1 ⇒ bloom_hit=1), false positives bounded by
    (k·n/m)^k.  Sum of distinct power-of-two masks == bitwise OR, so the
    bitset build is a plain integer SUM — order-independent and
    engine-exact."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = with_shingles(docs.select("doc_id", "text"), "text", 3)
    ds = sh.select("doc_id", F.explode("shingles").alias("s"))
    # the postings frame feeds three consumers (bitset build, probes,
    # exact audit join) — persist it so the corpus is shingled ONCE
    # (the same persisted-edge-set discipline as the CC operator)
    ds = ds.persist()
    bench = ds.filter(F.col("doc_id") % 50 == 0).select("s").distinct().persist()
    h1 = _hash16(F.concat(F.col("s"), F.lit("#1")))
    h2 = _hash16(F.concat(F.col("s"), F.lit("#2")))
    pos = (
        bench.select(h1.alias("p"))
        .union(bench.select(h2.alias("p")))
        .distinct()
    )
    bits = pos.groupBy(F.expr("p div 32").alias("word")).agg(
        F.sum(F.pow(F.lit(2), F.col("p") % 32).cast("long")).alias("bits")
    )
    cand = ds.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "s", h1.alias("p1"), h2.alias("p2")
    )
    b1 = bits.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bits.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    probed = (
        cand.join(F.broadcast(b1), F.expr("p1 div 32") == F.col("w1"), "left")
        .join(F.broadcast(b2), F.expr("p2 div 32") == F.col("w2"), "left")
        .select(
            "doc_id",
            (
                F.when(
                    F.col("bits1").isNotNull()
                    & (
                        F.col("bits1").bitwiseAND(
                            F.pow(F.lit(2), F.col("p1") % 32).cast("long")
                        )
                        != 0
                    ),
                    1,
                ).otherwise(0)
                * F.when(
                    F.col("bits2").isNotNull()
                    & (
                        F.col("bits2").bitwiseAND(
                            F.pow(F.lit(2), F.col("p2") % 32).cast("long")
                        )
                        != 0
                    ),
                    1,
                ).otherwise(0)
            ).alias("s_hit"),
        )
    )
    bloom = probed.groupBy("doc_id").agg(
        F.max("s_hit").cast("long").alias("bloom_hit")
    )
    exact = (
        ds.filter(F.col("doc_id") % 50 != 0)
        .join(bench, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(1).cast("long"))
    )
    return (
        bloom.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("exact_hit"), F.lit(0).cast("long")).alias("exact_hit"),
        )
    )


# --------------------------------------------------------------------------
# q98 — z-order layout audit: interleave (custkey, order-day) bucket bits,
# range-partition into files, report per-file min-max envelopes.
# --------------------------------------------------------------------------
_Z_SPARK = _z_interleave_sql("xb", "yb", "spark")
_Z_DUCK = _z_interleave_sql("xb", "yb", "duckdb")


@register(
    "q98_zorder_layout",
    covers=("W6", "A4"),
    oracle=f"""
WITH stats AS (
  SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
         min(o_orderdate) AS min_dt,
         date_diff('day', min(o_orderdate), max(o_orderdate)) AS max_d
  FROM orders
),
b AS (
  SELECT ((o_custkey - min_ck) * 256) // (max_ck - min_ck + 1) AS xb,
         (date_diff('day', min_dt, o_orderdate) * 256) // (max_d + 1) AS yb,
         o_custkey, date_diff('day', min_dt, o_orderdate) AS day_off
  FROM orders, stats
),
z AS (SELECT {_Z_DUCK} // 1024 AS file_id, o_custkey, day_off FROM b)
SELECT file_id, count(*) AS n_rows,
       CAST(min(o_custkey) AS BIGINT) AS min_ck,
       CAST(max(o_custkey) AS BIGINT) AS max_ck,
       CAST(min(day_off) AS BIGINT) AS min_day,
       CAST(max(day_off) AS BIGINT) AS max_day
FROM z GROUP BY file_id
""",
)
def q98_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit — the data-layout lever that makes
    min-max file skipping work on TWO dimensions at once.  Each order's
    (custkey, order-day) is bucketized to 8 bits per dim (bucket edges
    from a one-row global stats aggregate, broadcast back), the bucket
    bits are interleaved into a 16-bit z-value with pure integer
    arithmetic, and rows are assigned to 64 "files" by z-range.  The
    emitted per-file envelopes (min/max of BOTH dims) are the pruning
    index: a predicate on either dimension skips every file whose
    envelope misses it — with z-order both envelopes stay ~1/8 of the
    domain, vs. a single-column sort where the second dimension's
    envelope is the full domain in every file.  At 100 TB the same
    z-value is the ``repartitionByRange`` key at write time
    (storage.py layouts); this query is the audit of that layout."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("o_orderdate").alias("min_dt"),
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
        ).alias("max_d"),
    )
    b = (
        orders.crossJoin(F.broadcast(stats))
        .withColumn(
            "day_off", F.datediff(F.to_date("o_orderdate"), F.to_date("min_dt"))
        )
        .withColumn(
            "xb", F.expr("((o_custkey - min_ck) * 256) div (max_ck - min_ck + 1)")
        )
        .withColumn("yb", F.expr("(day_off * 256) div (max_d + 1)"))
    )
    z = b.withColumn("file_id", F.expr(f"{_Z_SPARK} div 1024"))
    return z.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").cast("long").alias("min_ck"),
        F.max("o_custkey").cast("long").alias("max_ck"),
        F.min("day_off").cast("long").alias("min_day"),
        F.max("day_off").cast("long").alias("max_day"),
    )


# --------------------------------------------------------------------------
# q99 — deterministic per-group sample (reproducible eval carving).
# --------------------------------------------------------------------------
@register(
    "q99_group_sample",
    covers=("W4", "P10"),
    oracle="""
WITH r AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
)
SELECT source, doc_id, rk FROM r WHERE rk <= 10
""",
)
def q99_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic n-per-group sample: rank by md5(id) inside each group
    and keep the head — a content-stable 'random' draw that re-runs,
    repartitions and incremental appends reproduce exactly (rows already
    drawn stay drawn; rand()-based samples lose this).  ONE ranking-window
    shuffle on the group key; at 100 TB group count scales the shuffle,
    not group size, and skewed groups split under AQE since only the
    top-10 survive per task after the rank filter."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= 10)
    )


# --------------------------------------------------------------------------
# q101 — exact-percentile winsorization via a value histogram (no global
# row sort).
# --------------------------------------------------------------------------
@register(
    "q101_winsorize_lengths",
    covers=("A4", "P7"),
    oracle="""
WITH h AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
r AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS run,
         (SELECT sum(c) FROM h) AS tot
  FROM h
),
cuts AS (
  SELECT min(CASE WHEN run * 20 >= tot THEN v END) AS lo,
         min(CASE WHEN run * 20 >= 19 * tot THEN v END) AS hi
  FROM r
)
SELECT doc_id,
       CAST(greatest(lo, least(hi, n_chars)) AS BIGINT) AS clamped_chars
FROM documents, cuts
""",
)
def q101_winsorize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize document lengths to the exact [p5, p95] — robust
    normalization for curation scores — WITHOUT sorting the corpus: the
    percentiles come from a VALUE HISTOGRAM (groupBy(n_chars) — at most
    |distinct values| rows however many documents exist), ranked by a
    running count; the cutoffs are integer rank selections
    (run·20 ≥ tot, run·20 ≥ 19·tot), so the result is engine-exact where
    percentile interpolation is not.  The one-row cutoff frame broadcasts
    into a map-side clamp.  This is the exact counterpart of the GK
    sketch the curriculum-bucket query (q66) documents for 100 TB: same
    plan shape, histogram instead of sketch."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    run_w = Window.orderBy("v")
    tot_w = Window.partitionBy()
    r = hist.withColumn("run", F.sum("c").over(run_w)).withColumn(
        "tot", F.sum("c").over(tot_w)
    )
    cuts = r.agg(
        F.min(F.when(F.col("run") * 20 >= F.col("tot"), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("run") * 20 >= 19 * F.col("tot"), F.col("v"))).alias(
            "hi"
        ),
    )
    return docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        F.greatest(
            F.col("lo"), F.least(F.col("hi"), F.col("n_chars"))
        ).cast("long").alias("clamped_chars"),
    )


# --------------------------------------------------------------------------
# q103 — exact per-group median via per-group value histograms.
# --------------------------------------------------------------------------
@register(
    "q103_grouped_median",
    covers=("A4", "W4"),
    oracle="""
WITH h AS (
  SELECT source, n_chars AS v, count(*) AS c
  FROM documents GROUP BY source, n_chars
),
r AS (
  SELECT source, v, c,
         sum(c) OVER (PARTITION BY source ORDER BY v) AS run,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM h
)
SELECT source,
       CAST(min(CASE WHEN run * 2 >= tot THEN v END) AS BIGINT) AS median_chars,
       CAST(min(tot) AS BIGINT) AS n_docs
FROM r GROUP BY source
""",
)
def q103_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source median document length — the q101 histogram trick
    partitioned by group: groupBy(source, value) collapses the corpus to
    |group|·|distinct values| histogram rows, running counts rank within
    each group, and the median is an integer rank selection (run·2 ≥ tot)
    — engine-exact, no percentile interpolation, no per-group row sort.
    ONE corpus shuffle (the histogram aggregate); the rank windows run on
    the histogram frame.  At 100 TB this is how per-domain length/quality
    medians for curation dashboards stay exact — the value domain, not
    the row count, bounds the window input."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    hist = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    run_w = Window.partitionBy("source").orderBy("v")
    tot_w = Window.partitionBy("source")
    r = hist.withColumn("run", F.sum("c").over(run_w)).withColumn(
        "tot", F.sum("c").over(tot_w)
    )
    return r.groupBy("source").agg(
        F.min(F.when(F.col("run") * 2 >= F.col("tot"), F.col("v")))
        .cast("long")
        .alias("median_chars"),
        F.min("tot").cast("long").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# q105 — snapshot diff / change-data-capture between two table versions.
# --------------------------------------------------------------------------
@register(
    "q105_snapshot_diff",
    covers=("U3", "J2", "F9"),
    oracle="""
WITH v1 AS (SELECT doc_id, md5(text) AS row_hash FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END)
           AS row_hash
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v2.doc_id IS NULL THEN 'deleted'
            WHEN v1.doc_id IS NULL THEN 'added'
            ELSE 'changed' END AS change_type
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.row_hash <> v2.row_hash
""",
)
def q105_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table versions (here: the documents
    table vs a deterministic synthetic v2 — every 7th doc deleted, every
    11th revised), the operation that turns K4 bronze snapshots into
    incremental deltas for the merge sinks.  Mechanics: one row hash per
    side (md5 of the content columns — the columns themselves never
    shuffle, only id + 16-byte hash), ONE full-outer equi-join on the
    key, and a residual filter keeping only actual differences.  At
    100 TB both sides partition-prune to the compared partitions and the
    join co-locates on the key (zero exchanges off K6 bucketed
    snapshots); unchanged rows — the overwhelming majority — are dropped
    by the hash compare without any wide-column comparison."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    v1 = docs.select("doc_id", F.md5("text").alias("row_hash"))
    v2 = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
                ).otherwise(F.col("text"))
            ).alias("row_hash"),
        )
    )
    a = v1.select(F.col("doc_id").alias("id1"), F.col("row_hash").alias("h1"))
    b = v2.select(F.col("doc_id").alias("id2"), F.col("row_hash").alias("h2"))
    joined = a.join(b, a.id1 == b.id2, "full_outer")
    return joined.filter(
        F.col("id1").isNull() | F.col("id2").isNull() | (F.col("h1") != F.col("h2"))
    ).select(
        F.coalesce(F.col("id1"), F.col("id2")).alias("doc_id"),
        F.when(F.col("id2").isNull(), "deleted")
        .when(F.col("id1").isNull(), "added")
        .otherwise("changed")
        .alias("change_type"),
    )


# --------------------------------------------------------------------------
# q106 — weighted sample without replacement (Efraimidis–Spirakis keys on
# deterministic hash randomness).
# --------------------------------------------------------------------------
_WS_KEY_SPARK = """((((CAST((length(bin(CAST((h + 1) AS BIGINT))) - 1) AS DOUBLE) * 0.6931471805599453) + ((2.0 * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (1.0 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.3333333333333333 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.2 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.14285714285714285 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.1111111111111111 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.09090909090909091 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.07692307692307693 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * 0.06666666666666667))))))))))))))))) - (((CAST((length(bin(CAST((65536) AS BIGINT))) - 1) AS DOUBLE) * 0.6931471805599453) + ((2.0 * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (1.0 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.3333333333333333 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.2 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.14285714285714285 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.1111111111111111 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.09090909090909091 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.07692307692307693 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * 0.06666666666666667)))))))))))))))))) / CAST(n_chars AS DOUBLE)"""
_WS_KEY_DUCK = """((((CAST((length(bin(CAST((h + 1) AS BIGINT))) - 1) AS DOUBLE) * 0.6931471805599453) + ((2.0 * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (1.0 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.3333333333333333 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.2 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.14285714285714285 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.1111111111111111 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.09090909090909091 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.07692307692307693 + (((((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((h + 1) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((h + 1) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * 0.06666666666666667))))))))))))))))) - (((CAST((length(bin(CAST((65536) AS BIGINT))) - 1) AS DOUBLE) * 0.6931471805599453) + ((2.0 * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (1.0 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.3333333333333333 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.2 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.14285714285714285 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.1111111111111111 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.09090909090909091 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * (0.07692307692307693 + (((((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) - 1.0) / ((CAST(CAST((65536) AS BIGINT) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(bin(CAST((65536) AS BIGINT))) - 1)) AS DOUBLE)) + 1.0))) * 0.06666666666666667)))))))))))))))))) / CAST(n_chars AS DOUBLE)"""


@register(
    "q106_weighted_sample",
    covers=("W1", "P7"),
    oracle=f"""
WITH s AS (
  SELECT doc_id, n_chars, {_sql_hash16("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars, ({_WS_KEY_DUCK}) AS skey FROM s
) ORDER BY skey DESC, doc_id LIMIT 50
""",
)
def q106_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, deterministic:
    Efraimidis–Spirakis keys ln(u)/w ranked descending (u from the
    content-stable hash16, w = n_chars), top-50 — inclusion probability
    proportional to weight, no sequential draw loop.  Engine-exact where
    rand() is not even re-run-stable: u's log splits into two INTEGER
    det_ln calls (numerics.det_ln_sql — bit-reproducible), subtraction
    and the division by w are single IEEE ops, so both engines compute
    bit-identical keys and the top-k set is unambiguous (doc_id
    tiebreak).  Plans as TakeOrderedAndProject — per-partition heaps +
    driver merge, never a global sort; at 100 TB the same keys feed a
    per-group rank window for stratified variants (q38's shape)."""
    from briefly_spark.operators.textstats import _hash16

    docs = spread(load_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id", "n_chars", _hash16(F.col("doc_id").cast("string")).alias("h")
    ).withColumn("skey", F.expr(_WS_KEY_SPARK))
    return (
        staged.orderBy(F.col("skey").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars")
    )


# --------------------------------------------------------------------------
# q119 — rank fusion of curation signals WITHOUT a global sort.
# --------------------------------------------------------------------------
@register(
    "q119_rank_fusion",
    covers=("A3", "W1"),
    oracle="""
WITH sig AS (
  SELECT doc_id, n_chars,
         (len(list_distinct(toks)) * 10000) // len(toks) AS ttr_fp
  FROM (SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS toks
        FROM documents)
  WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS len_rank,
       CAST(rank() OVER (ORDER BY ttr_fp) AS BIGINT) AS ttr_rank,
       CAST(rank() OVER (ORDER BY n_chars) + rank() OVER (ORDER BY ttr_fp)
            AS BIGINT) AS fused
FROM sig
""",
)
def q119_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda rank fusion of curation signals (length, type-token ratio) —
    the standard way to blend incommensurable quality scores into one
    ordering.  The oracle is the naive global rank() windows; the Spark
    plan computes the IDENTICAL ranks with NO corpus sort: each signal's
    VALUE HISTOGRAM (dimension-sized, the q101 discipline) gets a running
    count over value order, rank(v) = run(v) − c(v) + 1 (exactly SQL
    rank()'s strictly-smaller-plus-one tie semantics), and the
    |distinct values|-row rank maps broadcast back into map-side joins.
    Signals are integers (chars; (distinct·10⁴) div tokens), so ranks,
    and therefore the fusion, are engine-exact."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    sig = (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            "n_chars",
            F.expr("(size(array_distinct(t)) * 10000) div size(t)").alias("ttr_fp"),
        )
    )
    sig = sig.persist()

    def rank_map(col: str) -> DataFrame:
        hist = sig.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        run_w = Window.orderBy("v")
        return hist.withColumn("run", F.sum("c").over(run_w)).select(
            F.col("v").alias(col),
            (F.col("run") - F.col("c") + 1).alias(f"{col}_rank"),
        )

    fused = (
        sig.join(F.broadcast(rank_map("n_chars")), "n_chars")
        .join(F.broadcast(rank_map("ttr_fp")), "ttr_fp")
        .select(
            "doc_id",
            F.col("n_chars_rank").alias("len_rank"),
            F.col("ttr_fp_rank").alias("ttr_rank"),
            (F.col("n_chars_rank") + F.col("ttr_fp_rank")).alias("fused"),
        )
    )
    return fused
