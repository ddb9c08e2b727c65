"""Text scalar functions (SURVEY §2.8 F1–F12, §2.7 U5).

All pure Column expressions — no UDFs except :func:`html_unescape` (stdlib
``html.unescape`` has no Spark builtin).  Each function documents the
reference behavior it reproduces (file:line under /root/reference) and any
deliberate divergence (SURVEY §7.2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Vietnamese diacritic folding (ref: utils/extraction/extract_utils.py:63-78).
# The reference folds the plain-accent families; we fold the complete set
# (adds ă/â families) so e.g. "Đà Nẵng" → "danang" — a documented superset.
# ---------------------------------------------------------------------------
_FOLD = {
    "a": "áàảãạăắằẳẵặâấầẩẫậ",
    "e": "éèẻẽẹêếềểễệ",
    "i": "íìỉĩị",
    "o": "óòỏõọôốồổỗộơớờởỡợ",
    "u": "úùủũụưứừửữự",
    "y": "ýỳỷỹỵ",
    "d": "đ",
}
VIET_SRC = "".join("".join(chars) for chars in _FOLD.values())
VIET_DST = "".join(base * len(chars) for base, chars in _FOLD.items())


def fold_diacritics(col: Column) -> Column:
    """Lower-case Vietnamese diacritics → ASCII (single JVM translate)."""
    return F.translate(col, VIET_SRC, VIET_DST)


def slugify(col: Column) -> Column:
    """lower → fold diacritics → drop spaces (extract_utils.py:63-78)."""
    return F.replace(fold_diacritics(F.lower(col)), F.lit(" "), F.lit(""))


def alias_initials(col: Column) -> Column:
    """First letter of each word, lowered, joined (extract_utils.py:81-82)."""
    words = F.split(col, r"\s+")
    return F.array_join(
        F.transform(
            F.filter(words, lambda w: w != ""), lambda w: F.lower(F.substring(w, 1, 1))
        ),
        "",
    )


# ---------------------------------------------------------------------------
# clean_text (ref: utils/embedding/text_cleaner.py:8-35): photo-credit strip,
# symbol strip, whitespace/dot collapse, then ORDER-PRESERVING sentence dedup
# (U5) — all native: split + index-aware filter + array_join.
# NOTE the char class uses \p{L}\p{N}_ (unicode-aware in both Java regex and
# RE2) rather than Python's \w, so Spark and the DuckDB oracle agree.
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    c = F.regexp_replace(col, r"Ảnh: [^\.]+", "")
    c = F.regexp_replace(c, r"[^\p{L}\p{N}_\s.!?]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.regexp_replace(c, r"\.+", ".")


def dedup_sentences(col: Column) -> Column:
    """Drop repeated '. '-separated sentences keeping first occurrence;
    result re-joined with a trailing '. ' (text_cleaner.py:23-32).

    Deliberate divergence (SURVEY §7.2): each sentence is normalized by
    stripping trailing periods BEFORE the seen-check.  The reference's
    literal implementation keeps the final sentence's trailing '.' and so
    fails to dedup it — its own golden test (src/tests/test_embedding.py:4-8,
    expects "Đây là câu. ") encodes the intent we implement here."""
    raw = F.split(col, r"\. ")
    sents = F.transform(raw, lambda s: F.regexp_replace(s, r"\.+$", ""))
    uniq = F.filter(sents, lambda s, i: (s != "") & (F.array_position(sents, s) == i + 1))
    return F.when(F.size(uniq) > 0, F.concat(F.array_join(uniq, ". "), F.lit(". "))).otherwise(
        F.lit("")
    )


def clean_text(col: Column) -> Column:
    return dedup_sentences(normalize_text(col))


# ---------------------------------------------------------------------------
# clean_summary (ref: utils/summarization/clean_summary.py:3-24).
# ---------------------------------------------------------------------------
def clean_summary(col: Column) -> Column:
    c = col
    for pat in (
        r"(?i)^Here are the \d+ concise points in Vietnamese:[\s\n]*",
        r"(?i)^Here are \d+ concise points:[\s\n]*",
        r"(?i)^Summary in \d+ points:[\s\n]*",
        r"(?i)^Key points:[\s\n]*",
    ):
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, r"(?m)^[•\-*–—]\s*", "")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.trim(c)


def split_bullets(col: Column) -> Column:
    """Summary text → array of non-empty trimmed bullet lines
    (ref: summarize_utils.py:78)."""
    # NB: must be a 1-arg lambda — passing F.trim directly would receive the
    # element index as trim's second (trim-characters) argument.
    return F.filter(F.transform(F.split(col, r"\n"), lambda x: F.trim(x)), lambda x: x != "")


def join_bullets(col: Column, sep: str = ". ") -> Column:
    """Array of bullets → text (ref: embedded_articles.py:65-68)."""
    return F.array_join(col, sep)


# ---------------------------------------------------------------------------
# Misc extraction helpers.
# ---------------------------------------------------------------------------
def extract_img_src(col: Column) -> Column:
    """First <img src> in an HTML snippet (ref: extract_utils.py:50-59),
    as a native regexp instead of an HTML parser — returns '' when absent."""
    return F.regexp_extract(col, r"""<img[^>]*\ssrc=["']([^"']+)["']""", 1)


#: non-content containers the reference's bs4 pass decomposes WITH their
#: contents (extract_utils.py:30-33: script/style/iframe/nav/header/footer).
#: The \b after the tag name keeps '<header>' from matching '<head>'.
_DROP_BLOCKS = ("script", "style", "iframe", "nav", "header", "footer")


def _strip_noncontent(col: Column) -> Column:
    """Shared prelude of :func:`strip_html_tags` and :func:`paragraph_text`:
    drop the non-content blocks *including their contents* (what bs4
    ``decompose()`` does — a bare tag-strip would leak JS/CSS text into the
    corpus), then comments.  (?is) = case-insensitive + dotall so
    multi-line blocks match."""
    c = col
    for tag in _DROP_BLOCKS:
        c = F.regexp_replace(c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
    return F.regexp_replace(c, r"(?s)<!--.*?-->", " ")


def strip_html_tags(col: Column) -> Column:
    """Stored-HTML → text (ref S3/F11, extract_utils.py:21-45): drop
    non-content blocks + comments (:func:`_strip_noncontent`), then
    remaining tags, then collapse whitespace.  Native regexp chain."""
    c = F.regexp_replace(_strip_noncontent(col), r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def paragraph_text(col: Column) -> Column:
    """Paragraph-scoped content extraction — the reference's full-page
    fidelity (extract_utils.py:36-44: join the text of ``<p>``/``<article>``
    elements only) rather than :func:`strip_html_tags`'s keep-everything
    approximation: on a noisy page, sidebars/figure captions/cookie banners
    outside content containers never enter the corpus (and so never pollute
    dedup shingles or embeddings downstream).

    Native chain: drop non-content blocks with contents
    (:func:`_strip_noncontent`), extract every ``<p>``/``<article>`` block,
    strip residual inline tags, collapse whitespace.  The closing tag is a
    BACKREFERENCE to the opening one, so ``<article>Intro <p>Nested</p>
    Outro</article>`` matches through its own ``</article>`` and yields
    'Intro Nested Outro' (the inner ``<p>`` is consumed by the article
    match rather than re-extracted — bs4 fidelity minus find_all's
    parent+child text duplication), and a mismatched pair like
    ``<p>…</article>`` cannot cross-match."""
    c = _strip_noncontent(col)
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?is)<(p|article)\b[^>]*>(.*?)</\1\s*>"), 2
    )
    # residual inline tags strip to EMPTY (bs4 get_text concatenates text
    # nodes with no separator: 'First <b>para</b>.' → 'First para.');
    # paragraph boundaries themselves are joined with ' ' above.
    joined = F.regexp_replace(F.array_join(blocks, " "), r"<[^>]+>", "")
    return F.trim(F.regexp_replace(joined, r"\s+", " "))


def md5_uuid(col: Column) -> Column:
    """md5(url) formatted as a dashed UUID — the reference's Qdrant point id
    (embedded_articles.py:193-194: uuid.UUID(md5(url)[:32]))."""
    h = F.md5(col)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


@F.pandas_udf(T.StringType())
def html_unescape(s: pd.Series) -> pd.Series:
    """Double HTML-unescape (ref: raw_articles.py:99 —
    html.unescape(html.unescape(title))).  The full named/numeric entity
    table has no Spark builtin; Arrow-batched pandas UDF (the package's
    only Python call site) instead of a row-at-a-time scalar UDF."""
    import html

    return s.map(lambda x: html.unescape(html.unescape(x)) if x is not None else None)


def canonical_url(col: Column) -> Column:
    """URL canonicalization for URL-keyed dedup (the reference keys
    articles by url, raw_articles.py:104-110; at corpus scale the same url
    arrives with case-variant hosts, tracking params and fragments):
    lowercase scheme+host, drop the #fragment, strip utm_* tracking params,
    sort the surviving query params into one canonical order, and trim a
    trailing '?' or '/'.  Pure native string algebra — the same step
    sequence is mirrored in the q26 oracle, so both engines agree
    byte-for-byte."""
    scheme = F.lower(F.substring_index(col, "://", 1))
    rest = F.substring_index(col, "://", -1)  # everything after '://'
    # host ends at the first '/', '?' OR '#' — a path-less URL like
    # 'ex.com?id=3' must not swallow its query string into the host
    host = F.lower(
        F.substring_index(F.substring_index(F.substring_index(rest, "/", 1), "?", 1), "#", 1)
    )
    tail = rest.substr(F.length(host) + 1, F.length(rest))
    tail = F.regexp_replace(tail, "#.*$", "")
    # Structural path/query handling instead of string surgery: split at
    # the first '?', filter utm_* params OUT of the param LIST, sort the
    # survivors into one canonical order (binary collation, identical in
    # DuckDB's list_sort), and rejoin.  No dangling-'&' repair pass — a
    # leading utm param can't orphan its successor — and a literal '&' in
    # a query-less path (legal per RFC 3986) survives untouched instead of
    # being rewritten into a fake '?'.
    path = F.substring_index(tail, "?", 1)
    raw_q = tail.substr(F.length(path) + 2, F.length(tail))
    params = F.filter(
        F.split(raw_q, "&"), lambda p: (p != "") & ~p.rlike(r"^utm_[A-Za-z]+=")
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    tail = F.when(
        tail.contains("?") & (qsorted != ""), F.concat(path, F.lit("?"), qsorted)
    ).otherwise(path)
    tail = F.regexp_replace(tail, r"/$", "")
    return F.concat(scheme, F.lit("://"), host, tail)
