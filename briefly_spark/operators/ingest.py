"""Ingest operators — SURVEY §2.1 S2/S3 (feed fetch + parse), §2.8 F3
(double HTML-unescape), F4 (lenient date parse), and the fetch-transport
harness with retries (§2.10 T7).

The reference fetches 91 RSS feeds in a serial loop with sleeps
(raw_articles.py:78-97); here fetching is a ``mapInPandas`` stage whose
parallelism is the partition count, with the HTTP transport *injected* so
tests (and the DuckDB oracle) run against deterministic local content —
the same seam that makes the LLM operators testable.  Parsing uses stdlib
``xml.etree`` with a tag-soup regex recovery path for malformed feeds
(feedparser isn't shipped; real feeds are often not well-formed XML);
politeness delays and retries live inside the UDF per SURVEY §4.
"""

from __future__ import annotations

import html
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENTRY_SCHEMA = (
    "array<struct<title:string, link:string, description:string, pub_date:string>>"
)


# ---------------------------------------------------------------------------
# S2 — fetch with injectable transport + retries (T7)
# ---------------------------------------------------------------------------
def fetch_documents(
    df: DataFrame,
    url_col: str,
    *,
    transport: Callable[[str], str] | None = None,
    retries: int = 3,
    backoff_s: float = 0.0,
) -> DataFrame:
    """(url) → (url, body, fetch_status): Arrow-batched fetch with
    per-request retry/backoff inside the UDF (tenacity-style, T7) and task
    retries above it.  ``transport`` defaults to urllib GET with a browser
    UA and 10s timeout (extract_utils.py:84-100 semantics); tests inject a
    pure function.  Failures yield status='failed' dead-letter rows, never
    dropped rows (SURVEY §7.2)."""
    def default_transport(url: str) -> str:  # pragma: no cover - network
        from urllib.request import Request, urlopen

        req = Request(url, headers={"User-Agent": "Mozilla/5.0 (briefly-spark)"})
        with urlopen(req, timeout=10) as resp:
            return resp.read().decode("utf-8", errors="replace")

    fetch = transport or default_transport

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            bodies, statuses = [], []
            for url in pdf[url_col]:
                body, status = "", "failed"
                for attempt in range(retries):
                    try:
                        body, status = fetch(url), "ok"
                        break
                    except Exception:
                        if backoff_s:
                            time.sleep(backoff_s * (2**attempt))
                bodies.append(body)
                statuses.append(status)
            yield pd.DataFrame(
                {url_col: pdf[url_col], "body": bodies, "fetch_status": statuses}
            )

    return df.select(url_col).mapInPandas(
        gen, schema=f"`{url_col}` string, body string, fetch_status string"
    )


# ---------------------------------------------------------------------------
# S2 — RSS/Atom parse (stdlib, deterministic)
# ---------------------------------------------------------------------------
def _soup_field(block: str, tag: str) -> str:
    import re

    m = re.search(rf"<{tag}\b[^>]*>(.*?)</{tag}\s*>", block, re.S | re.I)
    if not m:
        return ""
    val = m.group(1)
    cd = re.search(r"<!\[CDATA\[(.*?)\]\]>", val, re.S)
    return (cd.group(1) if cd else val).strip()


def parse_rss_soup(xml_text: str) -> list[dict]:
    """Tag-soup recovery parse for malformed feeds: regex entry split on
    RSS ``<item>…</item>`` or Atom ``<entry>…</entry>`` blocks +
    per-field extraction with CDATA unwrap.  Real-world feeds are
    frequently not well-formed XML (unescaped ampersands, stray tags);
    feedparser tolerates that — and handles both dialects — (the reference
    relies on it, extract_utils.py:84-100) while strict ElementTree rejects
    the whole document.  This recovers every entry whose block is intact —
    deterministic, no dependency."""
    import re

    out = []
    for m in re.finditer(
        r"<(item|entry)\b[^>]*>(.*?)</\1\s*>", xml_text, re.S | re.I
    ):
        kind, block = m.group(1).lower(), m.group(2)
        if kind == "item":
            link = _soup_field(block, "link")
            desc = _soup_field(block, "description")
            pub = _soup_field(block, "pubDate")
        else:  # Atom: <link href=…/>, <summary>/<content>, <updated>
            # rel="alternate" (or rel-less) is the article link; a bare
            # first-href would return the feed's own rel="self" URL and
            # collapse every entry to one dedup key downstream — mirror
            # the well-formed ElementTree path's preference.
            link_tags = re.findall(r"<link\b[^>]*>", block, re.I)
            def href_rel(tag: str) -> tuple[str | None, str | None]:
                h = re.search(r"""\bhref=["']([^"']+)["']""", tag, re.I)
                rl = re.search(r"""\brel=["']([^"']+)["']""", tag, re.I)
                return (h.group(1) if h else None, rl.group(1).lower() if rl else None)
            hrefs = [href_rel(t) for t in link_tags]
            alt = [h for h, rl in hrefs if h and rl in (None, "alternate")]
            any_href = [h for h, _ in hrefs if h]
            link = (alt or any_href or [_soup_field(block, "link")])[0]
            desc = _soup_field(block, "summary") or _soup_field(block, "content")
            pub = _soup_field(block, "updated") or _soup_field(block, "published")
        out.append(
            {
                "title": _soup_field(block, "title"),
                "link": link,
                "description": desc,
                "pub_date": pub,
            }
        )
    return out


def parse_rss_py(xml_text: str) -> list[dict]:
    """RSS ``channel/item`` or Atom ``feed/entry`` →
    [{title, link, description, pub_date}] via stdlib ElementTree, matching
    on namespace-stripped local tag names (Atom elements live under
    ``http://www.w3.org/2005/Atom``, so literal tag lookups see nothing).
    Field mapping mirrors feedparser's normalization (the reference's
    parser, extract_utils.py:84-100): Atom ``link[@href]``
    (rel="alternate" preferred), ``summary``/``content``,
    ``updated``/``published``.  Malformed XML falls back to the tag-soup
    recovery path (:func:`parse_rss_soup`) so a single bad entity no longer
    drops the whole feed — a feed is [] only when even recovery finds no
    entries."""
    import xml.etree.ElementTree as ET

    def local(tag) -> str:
        return tag.rsplit("}", 1)[-1].lower() if isinstance(tag, str) else ""

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return parse_rss_soup(xml_text)
    out = []
    for item in root.iter():
        kind = local(item.tag)
        if kind not in ("item", "entry"):
            continue
        children: dict[str, list] = {}
        for child in item:
            children.setdefault(local(child.tag), []).append(child)

        def txt(name: str) -> str:
            els = children.get(name)
            return (els[0].text or "") if els else ""

        if kind == "item":
            link, desc, pub = txt("link"), txt("description"), txt("pubdate")
        else:
            links = children.get("link", [])
            alt = [e for e in links if e.get("rel") in (None, "alternate")]
            pick = (alt or links)[:1]
            link = (pick[0].get("href") or pick[0].text or "") if pick else ""
            desc = txt("summary") or txt("content")
            pub = txt("updated") or txt("published")
        out.append(
            {"title": txt("title"), "link": link, "description": desc, "pub_date": pub}
        )
    return out


def parse_rss_udf(xml_col: Column) -> Column:
    """Arrow-batched RSS parse: one feed document → array of entry structs
    (explode downstream: the UDTF shape of §2.11)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ENTRY_SCHEMA)
    def parse(xmls: pd.Series) -> pd.Series:
        return xmls.map(lambda x: parse_rss_py(x or ""))

    return parse(xml_col)


# ---------------------------------------------------------------------------
# F3 — double HTML-unescape
# ---------------------------------------------------------------------------
#: the entity set the native mirror handles (covers standard feeds; the
#: UDF handles the full table)
_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def unescape2_expr(col: Column) -> Column:
    """Native double-unescape for the common entity set: two passes of the
    replace chain, mirroring ``html.unescape(html.unescape(x))``
    (raw_articles.py:99) for standard-entity input.  Entity order matters:
    && first so '&amp;amp;' resolves in two passes like the stdlib."""
    out = col
    for _ in range(2):
        for src, dst in _ENTITIES:
            out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def unescape2_udf(col: Column) -> Column:
    """Full-fidelity stdlib fallback (numeric/named entities beyond the
    common set)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def un(s: pd.Series) -> pd.Series:
        return s.map(lambda x: html.unescape(html.unescape(x or "")))

    return un(col)


# ---------------------------------------------------------------------------
# F4 — lenient timestamp parse
# ---------------------------------------------------------------------------
#: formats seen across real RSS feeds, tried in order
TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",      # ISO 8601 / Atom
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
)


def lenient_ts(col: Column) -> Column:
    """``coalesce`` over ``try_to_timestamp`` formats + RFC-822 (RSS
    pubDate) + integer-epoch fallbacks — the native fast path of
    dateutil-style lenient parsing (raw_articles.py:113-114); unparseable
    → NULL (dead-letter predicate upstream, not a crash).

    Spark ≥3 forbids 'EEE' in *parse* patterns, so RFC 822 is handled by
    stripping the redundant weekday prefix first."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in TS_FORMATS]
    rfc822 = F.try_to_timestamp(
        F.regexp_replace(col, r"^[A-Za-z]{3},\s*", ""), F.lit("dd MMM yyyy HH:mm:ss Z")
    )
    epoch = F.when(
        col.rlike(r"^\d{9,11}$"), F.timestamp_seconds(col.cast("long"))
    )
    return F.coalesce(*attempts, rfc822, epoch)


def lenient_ts_udf(col: Column) -> Column:
    """dateutil fallback for formats outside TS_FORMATS (full leniency)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def parse(s: pd.Series) -> pd.Series:
        from dateutil import parser as dp

        def one(x):
            try:
                return dp.parse(x) if x else None
            except (ValueError, OverflowError):
                return None

        return s.map(one)

    return parse(col)
