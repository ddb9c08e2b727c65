"""Work-list & config pack — the sensor/scheduler surface (SURVEY §2.1
S1/S6/S7, §2.6 W3, §2.8 F13/F14, §2.4 J7) as oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.queries import register


# --------------------------------------------------------------------------
# q92 — config scan: JSON → exploded feed triples (S1/F13/F14/A1).
# --------------------------------------------------------------------------
@register(
    "q92_feeds_config",
    covers=("S1", "F13", "F14", "A1", "A2"),
    oracle="""
WITH cfg AS (SELECT DISTINCT source FROM documents),
flat AS (
  SELECT source, t.topic,
         'https://ex/' || source || '/' || t.topic || '.rss' AS url
  FROM cfg, (VALUES ('news'), ('sport')) AS t(topic)
)
SELECT source, topic, url, md5(url) AS fetch_order_key
FROM flat
""",
)
def q92_feeds_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-tree scan (rss_feeds.py:9-15): a JSON source→topic→url map
    parsed with an explicit schema, exploded to (source, topic, url)
    triples (F13 — the map flatten of raw_articles.py:72-75), plus a
    deterministic fetch-order key replacing random.shuffle (F14, SURVEY
    §7.2): ordering by md5(url) spreads load identically on every run."""
    docs = load_table(spark, sf_dir, "documents")
    cfg = docs.select("source").distinct().select(
        "source",
        F.concat(
            F.lit('{"news": "https://ex/'),
            F.col("source"),
            F.lit('/news.rss", "sport": "https://ex/'),
            F.col("source"),
            F.lit('/sport.rss"}'),
        ).alias("topics_json"),
    )
    parsed = cfg.select(
        "source", F.from_json("topics_json", "map<string,string>").alias("topics")
    )
    flat = parsed.select("source", F.explode("topics").alias("topic", "url"))
    return flat.select("source", "topic", "url", F.md5("url").alias("fetch_order_key"))


# --------------------------------------------------------------------------
# q93 — two-tier priority work-list (W3/S7/T1).
# --------------------------------------------------------------------------
@register(
    "q93_two_tier_worklist",
    covers=("W3", "S7", "W2", "T1", "T4", "P4"),
    oracle="""
WITH tiers AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS tier
  FROM documents
  WHERE doc_id % 5 = 0 OR doc_id % 7 = 0
),
ranked AS (
  SELECT doc_id, tier,
         row_number() OVER (ORDER BY tier, n_chars DESC, doc_id) AS rn
  FROM tiers
)
SELECT doc_id, tier, rn FROM ranked WHERE rn <= 50
""",
)
def q93_two_tier_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The related-articles sensor's two-tier batch fill
    (related_articles_sensor.py:85-104): priority tier (never processed —
    here doc_id%5=0 stands for `related_ids IS NULL`) is taken first, the
    remainder of the batch filled from the refresh tier (stale TTL —
    doc_id%7=0 for `updated_at < now − 1d`), with a total order inside
    each tier.

    The batch semantics need a total order, but NOT a total sort: the
    ``orderBy().limit(50)`` compiles to TakeOrderedAndProject — every
    partition keeps its local top-50 and only 50·partitions rows reach the
    merge — so no single-partition sort ever sees the full eligible set.
    The rank over the ≤50 survivors is assigned without a global window
    (WindowExec with an empty partition spec warns regardless of the
    GlobalLimit bound): pack the bounded batch into one sorted struct array
    and posexplode — position = rank.  Catalyst pushes the tier predicates
    into the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    tiers = docs.filter((F.col("doc_id") % 5 == 0) | (F.col("doc_id") % 7 == 0)).select(
        "doc_id",
        "n_chars",
        F.when(F.col("doc_id") % 5 == 0, 0).otherwise(1).alias("tier"),
    )
    top = tiers.orderBy("tier", F.desc("n_chars"), F.asc("doc_id")).limit(50)
    # struct fields encode the sort key (asc, asc, asc): negate n_chars
    packed = top.agg(
        F.array_sort(
            F.collect_list(F.struct("tier", (-F.col("n_chars")).alias("neg_chars"), "doc_id"))
        ).alias("batch")
    )
    return packed.select(F.posexplode("batch").alias("pos", "r")).select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.tier").alias("tier"),
        (F.col("pos") + 1).alias("rn"),
    )


# --------------------------------------------------------------------------
# q94 — point lookup + work-list hydration join (S6/J7).
# --------------------------------------------------------------------------
@register(
    "q94_worklist_hydration",
    covers=("S6", "J7", "P1", "P2"),
    oracle="""
WITH worklist AS (
  SELECT 'https://ex/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id % 11 = 0
),
articles AS (
  SELECT 'https://ex/' || CAST(doc_id AS VARCHAR) AS url, source, n_chars, text
  FROM documents
)
SELECT w.url, a.source, a.n_chars, substr(a.text, 1, 40) AS head
FROM worklist w JOIN articles a ON w.url = a.url
""",
)
def q94_worklist_hydration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-URL `find_one` point lookups (S6 — one Mongo
    round-trip per sensor-emitted partition key) become ONE hydration join
    of the whole work-list against the table (J7): the N+1 pattern
    disappears, the key column prunes to a broadcast-able work-list, and
    the text column is projected only after the join."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://ex/"), F.col("doc_id").cast("string"))
    articles = docs.select(url.alias("url"), "source", "n_chars", "text")
    worklist = docs.filter(F.col("doc_id") % 11 == 0).select(url.alias("url"))
    return (
        F.broadcast(worklist)
        .join(articles, "url")
        .select("url", "source", "n_chars", F.substring("text", 1, 40).alias("head"))
    )
