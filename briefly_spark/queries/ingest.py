"""Ingest pack — the §3.1 ingest/normalize flow end-to-end: RSS parse
(UDTF shape), double-unescape (F3), image extraction (S4), lenient
timestamp parse (F4), HTML strip (F11), validation filter (P7), dedup
anti-join (J2/P5), broadcast dim join (J1) and FK semi-join (J3), as ONE
set-oriented query.

Feed XML is synthesized deterministically from ``documents`` (per-source
channels, three date formats cycling per item, double-escaped entities),
parsed with the real stdlib UDF — and the oracle *reconstructs the
expected pipeline output* directly from the base table, certifying the
whole parse→normalize→join chain, not just individual expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.functions.text import extract_img_src
from briefly_spark.operators.ingest import lenient_ts, parse_rss_udf, unescape2_expr
from briefly_spark.queries import register


def _item_xml() -> F.Column:  # type: ignore[name-defined]
    """Deterministic RSS <item> per document (double-escaped title entity,
    embedded HTML description, pubDate format cycling by doc_id % 3)."""
    did = F.col("doc_id")
    day = F.lpad((did % 28 + 1).cast("string"), 2, "0")
    rfc = F.concat(F.lit("Mon, "), day, F.lit(" Jan 2024 10:30:00 +0000"))
    iso = F.concat(F.lit("2024-02-"), day, F.lit("T08:15:30+00:00"))
    epoch = (F.lit(1705000000) + did).cast("string")
    pub = (
        F.when(did % 3 == 0, rfc).when(did % 3 == 1, iso).otherwise(epoch)
    )
    return F.concat(
        F.lit("<item><title>T &amp;amp; "),
        F.substring("text", 1, 20),
        F.lit("</title><link>https://ex/"),
        did.cast("string"),
        F.lit("</link><description>&lt;p&gt;"),
        F.col("text"),
        F.lit('&lt;/p&gt;&lt;img src="https://img/'),
        did.cast("string"),
        F.lit('.jpg" /&gt;</description><pubDate>'),
        pub,
        F.lit("</pubDate></item>"),
    )


@register(
    "q90_ingest_normalize",
    covers=("S2", "S4", "F3", "F4", "F11", "P5", "P6", "P7", "J1", "J2", "J3", "A1"),
    oracle=r"""
WITH base AS (
  SELECT doc_id, source, text,
         'https://ex/' || CAST(doc_id AS VARCHAR) AS url,
         'T & ' || substr(text, 1, 20) AS title,
         'https://img/' || CAST(doc_id AS VARCHAR) || '.jpg' AS img,
         trim(regexp_replace('<p>' || text || '</p><img src="https://img/' ||
                             CAST(doc_id AS VARCHAR) || '.jpg" />', '<[^>]+>', ' ', 'g')) AS content,
         CAST(CASE
           WHEN doc_id % 3 = 0 THEN make_timestamp(2024, 1, CAST(doc_id % 28 + 1 AS INT), 10, 30, 0)
           WHEN doc_id % 3 = 1 THEN make_timestamp(2024, 2, CAST(doc_id % 28 + 1 AS INT), 8, 15, 30)
           ELSE to_timestamp(1705000000 + doc_id)
         END AS TIMESTAMP) AS published
  FROM documents
)
SELECT url, title, img, published,
       md5(source) AS source_id,
       length(content) AS content_chars
FROM base
WHERE doc_id % 7 <> 0           -- dedup anti-join vs existing urls
  AND length(content) >= 20     -- validation filter
""",
)
def q90_ingest_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest/normalize as one DAG (raw_articles.py:66-149 set-oriented):
    per-source feed XML → stdlib-UDF parse → explode entries →
    double-unescape titles → regexp image extraction → lenient 3-format
    timestamp parse → HTML-strip content → validation filter → anti-join
    dedup vs existing URLs → broadcast dim join for source_id → FK
    semi-join.  One shuffle (the per-source groupBy building feeds); dims
    broadcast; everything else is map-side."""
    docs = spread(load_table(spark, sf_dir, "documents"))

    # per-source channel XML (the fetch result; transport-injected fetch of
    # real feeds shares this exact downstream, see operators/ingest.py)
    items = docs.select("source", "doc_id", _item_xml().alias("item"))
    feeds = items.groupBy("source").agg(
        F.concat(
            F.lit("<rss><channel>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "item"))),
                    lambda s: s["item"],
                ),
                "",
            ),
            F.lit("</channel></rss>"),
        ).alias("xml")
    )

    entries = feeds.select(
        "source", F.explode(parse_rss_udf(F.col("xml"))).alias("e")
    ).select(
        "source",
        F.col("e.link").alias("url"),
        unescape2_expr(F.col("e.title")).alias("title"),
        extract_img_src(F.col("e.description")).alias("img"),
        lenient_ts(F.col("e.pub_date")).alias("published"),
        F.trim(F.regexp_replace(F.col("e.description"), "<[^>]+>", " ")).alias("content"),
    )

    # dims (A1) + J1 broadcast attach + J3 FK semi-join
    sources = docs.select("source").distinct().select(
        "source", F.md5("source").alias("source_id")
    )
    existing = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(F.lit("https://ex/"), F.col("doc_id").cast("string")).alias("url")
    )
    return (
        entries.filter(F.length("content") >= 20)          # P7
        .join(existing, "url", "left_anti")                # J2/P5
        .join(F.broadcast(sources), "source")              # J1
        .join(F.broadcast(sources.select("source")), "source", "left_semi")  # J3
        .select(
            "url",
            "title",
            "img",
            "published",
            "source_id",
            F.length("content").cast("long").alias("content_chars"),
        )
    )
