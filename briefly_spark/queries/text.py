"""Text/scalar pack — SURVEY §2.7 U5 + §2.8 F-series over ``documents``.

The synthetic documents have no punctuation, so several queries first build
a deterministic composite string (same expression on both engines) to
exercise sentence boundaries, bullets, or HTML — the operator under test is
the cleaning/splitting expression, not the construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.functions.text import (
    VIET_DST,
    VIET_SRC,
    alias_initials,
    clean_summary,
    clean_text,
    extract_img_src,
    md5_uuid,
    slugify,
    split_bullets,
)
from briefly_spark.operators.chunking import chunk_fixed_expr
from briefly_spark.queries import register


# --------------------------------------------------------------------------
# q20 — clean_text: normalization chain + order-preserving sentence dedup.
# --------------------------------------------------------------------------
@register(
    "q20_clean_documents",
    covers=("F5", "U5"),
    oracle="""
WITH synth AS (
  SELECT doc_id,
         substr(text, 1, 40) || '. ' || substr(text, 1, 40) || '. ' ||
         substr(text, 41, 40) || '. Ảnh: Hoài Thanh' AS raw
  FROM documents
), norm AS (
  SELECT doc_id,
         regexp_replace(
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(raw, 'Ảnh: [^\\.]+', '', 'g'),
               '[^\\p{L}\\p{N}_\\s.!?]', ' ', 'g'),
             '\\s+', ' ', 'g')),
           '\\.+', '.', 'g') AS n
  FROM synth
), sent AS (
  SELECT doc_id,
         list_transform(string_split(n, '. '), s -> regexp_replace(s, '\\.+$', '')) AS sents
  FROM norm
), uniq AS (
  SELECT doc_id,
         list_filter(sents, (x, i) -> x <> '' AND list_position(sents, x) = i) AS u
  FROM sent
)
SELECT doc_id,
       CASE WHEN len(u) > 0 THEN array_to_string(u, '. ') || '. ' ELSE '' END AS cleaned
FROM uniq
""",
)
def q20_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text (text_cleaner.py:8-35): photo-credit strip, symbol fold,
    whitespace/dot collapse, order-preserving sentence dedup — entirely
    native Column expressions (split + index lambda + array_position)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(". "),
        F.substring("text", 1, 40),
        F.lit(". "),
        F.substring("text", 41, 40),
        F.lit(". Ảnh: Hoài Thanh"),
    )
    return docs.select("doc_id", clean_text(raw).alias("cleaned"))


# --------------------------------------------------------------------------
# q21 — native sliding-window chunk + posexplode (M1 scale path).
# --------------------------------------------------------------------------
@register(
    "q21_chunk_fixed",
    covers=("M1",),
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_filter(
           list_transform(range(0, greatest(length(text) - 1, 0) + 1, 350),
                          i -> substr(text, i + 1, 400)),
           ch -> length(ch) > 10) AS chunks
  FROM documents
)
SELECT doc_id, u['pos'] AS pos, u['chunk'] AS chunk
FROM (
  SELECT doc_id,
         unnest(list_transform(chunks, (x, i) -> struct_pack(pos := i - 1, chunk := x))) AS u
  FROM c
)
""",
)
def q21_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed sliding-window chunking (chunk 400 / overlap 50 per
    chunk_splitter.py:16-21 params) as pure codegen: sequence → transform →
    substring → posexplode.  The separator-aware variant (chunk_text_udf)
    shares the output contract; see q22_chunk_recursive."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", F.posexplode(chunk_fixed_expr(F.col("text"))).alias("pos", "chunk")
    )


# --------------------------------------------------------------------------
# q22 — separator-aware recursive chunker (pandas UDF) under a golden-
# fixture oracle.
# --------------------------------------------------------------------------
#: golden fixture resolved relative to this checkout (hardcoding an
#: absolute path would break the oracle for any other clone location)
_Q22_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "q22_chunks_sf001.parquet",
)


@register(
    "q22_chunk_recursive",
    covers=("M1", "M2"),
    oracle=f"""
SELECT doc_id, pos, chunk
FROM read_parquet('{_Q22_FIXTURE}')
""",
    oracle_sf="sf0.01",
)
def q22_chunk_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-contract recursive chunker over sentence-composited text
    (chunk_splitter.py:14-64 contract).  Arrow-batched UDF → posexplode.

    The recursion (separator hierarchy + greedy overlap merge + token
    re-split) is pure and deterministic but not SQL-expressible, so the
    oracle is a golden parquet fixture of the exact sf0.01 output
    (regenerate: tools/make_q22_fixture.py) — the driver gate runs at
    sf=0.01, where fixture equality pins full observable behavior.  The
    algorithm itself is held honest by hand-computed golden cases in
    tests/test_text_ops.py; at any other sf_dir this oracle intentionally
    mismatches (the fixture is SF-specific)."""
    from briefly_spark.operators.chunking import chunk_text_udf

    docs = spread(load_table(spark, sf_dir, "documents"))
    # build multi-sentence text so separator logic matters
    raw = F.concat_ws(
        ". ", F.col("text"), F.col("text"), F.col("text"), F.col("text")
    )
    return docs.select(
        "doc_id", F.posexplode(chunk_text_udf(raw)).alias("pos", "chunk")
    )


# --------------------------------------------------------------------------
# q23 — dimension build with slugify + initials (A1/A2/F1/F2).
# --------------------------------------------------------------------------
@register(
    "q23_doc_source_dims",
    covers=("A1", "A2", "F1", "F2", "F9"),
    oracle=f"""
WITH names AS (SELECT DISTINCT 'Thời sự ' || source AS name FROM documents)
SELECT name,
       replace(translate(lower(name), '{VIET_SRC}', '{VIET_DST}'), ' ', '') AS alias,
       array_to_string(list_transform(list_filter(string_split_regex(name, '\\s+'), w -> w <> ''),
                                      w -> lower(w[1])), '') AS initials,
       md5(name) AS source_id
FROM names
ORDER BY name
""",
)
def q23_doc_source_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension build (sources_and_topics.py:15-47): distinct names +
    slugify (Vietnamese fold, extract_utils.py:63-78) + initials alias
    (extract_utils.py:81-82) + md5 surrogate key — zero UDFs."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    name = F.col("name")
    return (
        docs.select(F.concat(F.lit("Thời sự "), F.col("source")).alias("name"))
        .distinct()
        .select(
            "name",
            slugify(name).alias("alias"),
            alias_initials(name).alias("initials"),
            F.md5(name).alias("source_id"),
        )
        .orderBy("name")
    )


# --------------------------------------------------------------------------
# q24 — clean_summary + bullet split/count (F6/F7/F8).
# --------------------------------------------------------------------------
@register(
    "q24_summary_bullets",
    covers=("F6", "F7", "F8"),
    oracle="""
WITH synth AS (
  SELECT doc_id,
         'Key points:' || chr(10) || '• ' || substr(text, 1, 30) || chr(10) ||
         '- ' || substr(text, 31, 30) || chr(10) || chr(10) || '* ' || substr(text, 61, 30) AS raw
  FROM documents
), cleaned AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(raw, '(?i)^Here are the \\d+ concise points in Vietnamese:[\\s\\n]*', ''),
                   '(?i)^Here are \\d+ concise points:[\\s\\n]*', ''),
                 '(?i)^Summary in \\d+ points:[\\s\\n]*', ''),
               '(?i)^Key points:[\\s\\n]*', ''),
             '(?m)^[•\\-*–—]\\s*', '', 'g'),
           '\\n{2,}', chr(10), 'g')) AS s
  FROM synth
), bullets AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(s, chr(10)), x -> trim(x)), x -> x <> '') AS b
  FROM cleaned
)
SELECT doc_id, len(b) AS n_bullets, array_to_string(b, '. ') AS joined
FROM bullets
""",
)
def q24_summary_bullets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_summary (clean_summary.py:3-24) then split-to-bullets
    (summarize_utils.py:78) and re-join (embedded_articles.py:65-68)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    raw = F.concat(
        F.lit("Key points:\n• "),
        F.substring("text", 1, 30),
        F.lit("\n- "),
        F.substring("text", 31, 30),
        F.lit("\n\n* "),
        F.substring("text", 61, 30),
    )
    bullets = split_bullets(clean_summary(raw))
    return docs.select(
        "doc_id",
        F.size(bullets).alias("n_bullets"),
        F.array_join(bullets, ". ").alias("joined"),
    )


# --------------------------------------------------------------------------
# q25 — image-src extraction from HTML (S4) + md5-UUID point ids (F9).
# --------------------------------------------------------------------------
@register(
    "q25_img_and_ids",
    covers=("S4", "F9", "F12"),
    oracle="""
SELECT doc_id,
       regexp_extract('<div><p>x</p><img class="thumb" src="' || source || '/img/' ||
                      CAST(doc_id AS VARCHAR) || '.jpg" /></div>',
                      '<img[^>]*\\ssrc="([^"]+)"', 1) AS img,
       concat_ws('-', substr(md5('https://ex/' || CAST(doc_id AS VARCHAR)), 1, 8),
                      substr(md5('https://ex/' || CAST(doc_id AS VARCHAR)), 9, 4),
                      substr(md5('https://ex/' || CAST(doc_id AS VARCHAR)), 13, 4),
                      substr(md5('https://ex/' || CAST(doc_id AS VARCHAR)), 17, 4),
                      substr(md5('https://ex/' || CAST(doc_id AS VARCHAR)), 21, 12)) AS point_id
FROM documents
""",
)
def q25_img_and_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS description <img src> extraction as a native regexp
    (extract_utils.py:50-59) and the md5→UUID point-id derivation
    (embedded_articles.py:193-194)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit('<div><p>x</p><img class="thumb" src="'),
        F.col("source"),
        F.lit("/img/"),
        F.col("doc_id").cast("string"),
        F.lit('.jpg" /></div>'),
    )
    url = F.concat(F.lit("https://ex/"), F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id", extract_img_src(html).alias("img"), md5_uuid(url).alias("point_id")
    )


# --------------------------------------------------------------------------
# q26 — URL canonicalization (dedup key normalization).
# --------------------------------------------------------------------------
@register(
    "q26_url_canonical",
    covers=("F9", "P5"),
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'https://EX.com' ELSE 'https://ex.com' END)
           || '/news/' || CAST(doc_id AS VARCHAR)
           || '/?utm_source=feed&utm_medium=rss&id=' || CAST(doc_id % 7 AS VARCHAR)
           || '#frag' AS url
  FROM documents
),
c AS (
  SELECT doc_id, url,
         lower(split_part(url, '://', 1)) AS scheme,
         split_part(url, '://', 2) AS rest
  FROM u
),
d AS (
  SELECT doc_id, url, scheme,
         lower(split_part(split_part(split_part(rest, '/', 1), '?', 1), '#', 1)) AS host,
         substr(rest, len(split_part(split_part(split_part(rest, '/', 1), '?', 1), '#', 1)) + 1) AS tail
  FROM c
),
e AS (
  SELECT doc_id, url, scheme, host,
         regexp_replace(tail, '#.*$', '') AS t1
  FROM d
),
e2 AS (
  SELECT doc_id, url, scheme, host,
         regexp_replace(
           CASE WHEN contains(t1, '?') AND len(plist) > 0
                THEN split_part(t1, '?', 1) || '?' || array_to_string(plist, '&')
                ELSE split_part(t1, '?', 1) END,
           '/$', '') AS tail
  FROM (
    SELECT doc_id, url, scheme, host, t1,
           list_sort(list_filter(
             string_split(substr(t1, len(split_part(t1, '?', 1)) + 2), '&'),
             p -> p <> '' AND NOT regexp_matches(p, '^utm_[A-Za-z]+='))) AS plist
    FROM e
  )
)
SELECT doc_id, scheme || '://' || host || tail AS canon,
       (scheme || '://' || host || tail <> url) AS changed
FROM e2
""",
)
def q26_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization as the dedup-key normalizer (the reference
    keys articles by raw url; at corpus scale case-variant hosts, utm_*
    tracking params and fragments make one article look like many):
    lowercase scheme+host, strip fragment + tracking params, trim trailing
    separators — all native string algebra, mirrored step-for-step in the
    oracle.  URLs are synthesized deterministically per doc_id (mixed-case
    host on evens) so every rule fires."""
    from briefly_spark.functions.text import canonical_url

    docs = spread(load_table(spark, sf_dir, "documents"))
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://EX.com")).otherwise(
            F.lit("https://ex.com")
        ),
        F.lit("/news/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&utm_medium=rss&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#frag"),
    )
    staged = docs.select("doc_id", url.alias("url"))
    canon = canonical_url(F.col("url"))
    return staged.select(
        "doc_id", canon.alias("canon"), (canon != F.col("url")).alias("changed")
    )


# --------------------------------------------------------------------------
# q27 — paragraph-scoped content extraction (reference full-page fidelity).
# --------------------------------------------------------------------------
@register(
    "q27_paragraph_extract",
    covers=("S3", "F11"),
    oracle=r"""
WITH e AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace('Lead: ' || substr(text, 1, 40) || ' ' || text,
                          '<[^>]+>', '', 'g'),
           '\s+', ' ', 'g')) AS content
  FROM documents
)
SELECT doc_id, content, len(content) AS content_chars FROM e
""",
)
def q27_paragraph_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-page content extraction at reference fidelity
    (extract_utils.py:21-44): non-content blocks (script/style/iframe/nav/
    header/footer) decomposed with their contents, then ONLY ``<p>``/
    ``<article>`` element text joined — sidebars and banners outside
    content containers never reach the corpus.  Pages are synthesized
    deterministically around each document (banner + nav + lead paragraph
    + sidebar div + article body + comment + footer) and the oracle
    reconstructs the expected extraction directly from the base text —
    including the residual inline-tag strip, so an angle-bracket span
    inside document text ('a < b > c') hashes identically on both engines
    — and a leak of ANY non-content region breaks the hash.  (Text
    containing a literal closing tag of a content container would close
    the synthesized block early — outside the synthesized-page contract.)
    Map-only at any scale."""
    from briefly_spark.functions.text import paragraph_text

    docs = spread(load_table(spark, sf_dir, "documents"))
    page = F.concat(
        F.lit('<html><head><title>T</title><style>.x { color: red }</style></head>'
              '<body><header>Site banner</header><nav><a href="/">Home</a></nav>'
              '<p>Lead: '),
        F.substring("text", 1, 40),
        F.lit('</p><div class="sidebar">Trending '),
        F.col("doc_id").cast("string"),
        F.lit("</div><article>"),
        F.col("text"),
        F.lit("</article><!-- tracking --><footer>© feed</footer></body></html>"),
    )
    staged = docs.select("doc_id", paragraph_text(page).alias("content"))
    return staged.select(
        "doc_id", "content", F.length("content").cast("long").alias("content_chars")
    )
