"""Golden tests for the text operators — fixtures from FIXTURES.md /
the reference's own test expectations (src/tests/test_embedding.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from briefly_spark.functions.text import (
    alias_initials,
    clean_summary,
    clean_text,
    extract_img_src,
    html_unescape,
    md5_uuid,
    slugify,
    split_bullets,
)
from briefly_spark.operators.chunking import chunk_fixed_expr, chunk_text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_clean_text_golden(spark):
    # reference golden: dedup repeated sentence + drop photo credit
    # (src/tests/test_embedding.py:4-8)
    got = _one(spark, clean_text(F.lit("Đây là câu. Đây là câu. Ảnh: Hoài Thanh")))
    assert got == "Đây là câu. "


def test_clean_text_empty(spark):
    assert _one(spark, clean_text(F.lit(""))) == ""


@pytest.mark.parametrize(
    "name,expected",
    [
        ("Tuổi Trẻ", "tuoitre"),
        ("Thời sự", "thoisu"),
        ("Giáo dục", "giaoduc"),
        ("Đà Nẵng", "danang"),
    ],
)
def test_slugify_fixtures(spark, name, expected):
    assert _one(spark, slugify(F.lit(name))) == expected


def test_alias_initials(spark):
    assert _one(spark, alias_initials(F.lit("Thời sự"))) == "ts"
    assert _one(spark, alias_initials(F.lit("Giáo dục Việt Nam"))) == "gdvn"


def test_clean_summary_and_bullets(spark):
    raw = "Key points:\n• one point here \n- two\n\n* three"
    bullets = _one(spark, split_bullets(clean_summary(F.lit(raw))))
    assert bullets == ["one point here", "two", "three"]


def test_html_unescape_double(spark):
    # &amp;amp; needs two passes — the reference unescapes twice
    assert _one(spark, html_unescape(F.lit("a &amp;amp; b"))) == "a & b"


def test_extract_img_src(spark):
    html = '<p>t</p><img alt="x" src="https://e/i.jpg" />'
    assert _one(spark, extract_img_src(F.lit(html))) == "https://e/i.jpg"
    assert _one(spark, extract_img_src(F.lit("<p>no image</p>"))) == ""


def test_md5_uuid_shape(spark):
    got = _one(spark, md5_uuid(F.lit("https://example.com/a")))
    parts = got.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    assert got == got.lower()


# ---------------------------------------------------------------------------
# chunker: reference-contract properties (test_embedding.py:10-14 semantics)
# ---------------------------------------------------------------------------
def test_chunk_text_properties():
    text = "Câu một dài hơn mười ký tự. " * 50
    chunks = chunk_text(text)
    assert len(chunks) >= 1
    assert all(len(c) > 10 for c in chunks)
    assert all(len(c) <= 400 + 50 for c in chunks)


def test_chunk_text_short_and_empty():
    assert chunk_text("") == []
    assert chunk_text("tiny") == []  # ≤ 10 chars dropped
    assert chunk_text("a sentence longer than ten characters") == [
        "a sentence longer than ten characters"
    ]


def test_chunk_text_overlap_continuity():
    # consecutive chunks share content (overlap ≤ 50 chars)
    text = ". ".join(f"sentence number {i} with content" for i in range(60))
    chunks = chunk_text(text)
    assert len(chunks) > 1
    joined = "".join(chunks)
    # every sentence appears somewhere
    for i in range(60):
        assert f"sentence number {i}" in joined


def test_chunk_fixed_expr(spark):
    df = spark.createDataFrame([("x" * 1000,)], ["text"])
    chunks = df.select(chunk_fixed_expr(F.col("text")).alias("c")).collect()[0].c
    # windows start at 0, 350, 700 → lengths 400, 400, 300
    assert [len(c) for c in chunks] == [400, 400, 300]


def test_canonical_url(spark):
    from briefly_spark.functions.text import canonical_url

    cases = {
        "https://EX.com/a/1/?utm_source=x&utm_medium=y&id=3#frag": "https://ex.com/a/1/?id=3",
        "HTTPS://News.EX.com/path/": "https://news.ex.com/path",
        "https://ex.com/a?utm_campaign=z": "https://ex.com/a",
        "https://ex.com/a?id=1&utm_term=q": "https://ex.com/a?id=1",
        "https://ex.com/clean?id=2": "https://ex.com/clean?id=2",
        # no-trailing-slash path with a LEADING utm param: stripping it
        # must promote the next param's '&' to '?' — both param orders of
        # the same logical URL canonicalize to the same dedup key
        "https://ex.com/a?utm_source=x&id=3": "https://ex.com/a?id=3",
        "https://ex.com/a?id=3&utm_source=x": "https://ex.com/a?id=3",
        # params sort into one canonical order
        "https://ex.com/a?b=2&a=1": "https://ex.com/a?a=1&b=2",
        # path-less URL: query must not be swallowed into the host
        "https://EX.com?id=3&utm_source=x": "https://ex.com?id=3",
        # literal '&' in a query-less path (legal) must NOT become a '?'
        "https://ex.com/a&b": "https://ex.com/a&b",
        "https://ex.com/a&b?utm_campaign=z": "https://ex.com/a&b",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    got = {r.u: r.c for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()}
    assert got == cases


# ---------------------------------------------------------------------------
# hypothesis property tests — chunker invariants hold for ALL inputs, not
# just the fixture corpus
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _texts = st.lists(
        st.sampled_from(list("abcdef .!?\n") + ["xyzzy", "lorem "]),
        max_size=600,
    ).map("".join)

    @given(_texts)
    @settings(max_examples=200, deadline=None)
    def test_chunk_text_invariants(text):
        from briefly_spark.operators.chunking import (
            CHUNK_SIZE,
            MIN_CHUNK_CHARS,
            chunk_text,
        )

        chunks = chunk_text(text)
        for c in chunks:
            # never emits sub-minimum fragments
            assert len(c) > MIN_CHUNK_CHARS
            # every chunk is a contiguous substring of the input: splits keep
            # separators, merges join adjacent pieces, strips only trim ends
            assert c in text
            # character budget holds (token re-split only shrinks chunks on
            # whitespace-token inputs)
            assert len(c) <= CHUNK_SIZE
        # deterministic
        assert chunks == chunk_text(text)

    @given(_texts)
    @settings(max_examples=200, deadline=None)
    def test_chunk_text_coverage(text):
        from briefly_spark.operators.chunking import chunk_text

        chunks = chunk_text(text)
        # any long input must produce chunks (nothing silently dropped
        # beyond short fragments and whitespace)
        if len(text.strip()) > 60:
            assert chunks, f"no chunks for {text!r}"

except ImportError:  # pragma: no cover - hypothesis always shipped here
    pass


def test_strip_html_tags_drops_noncontent_blocks(spark):
    from briefly_spark.functions.text import strip_html_tags

    html_doc = (
        "<html><head><STYLE>body { color: red }</STYLE>"
        "<script type='text/js'>\nvar leak = 'SECRET';\n</script></head>"
        "<body><header>Site banner</header><nav><a href='/'>Home</a></nav>"
        "<!-- hidden comment --><p>Real <b>content</b> here.</p>"
        "<iframe src='x'>fallback junk</iframe>"
        "<footer>© 2024 boilerplate</footer></body></html>"
    )
    got = spark.createDataFrame([(html_doc,)], ["h"]).select(
        strip_html_tags(F.col("h")).alias("t")
    ).collect()[0].t
    assert got == "Real content here."


def test_paragraph_text_keeps_only_content_containers(spark):
    from briefly_spark.functions.text import paragraph_text

    html_doc = (
        "<html><head><style>.x{}</style></head><body>"
        "<header>Banner</header><nav>Menu</nav>"
        "<div class='sidebar'>Trending junk</div>"
        "<p>First <b>para</b>.</p>"
        "<aside>caption junk</aside>"
        "<article>Body text here.</article>"
        "<!-- note --><footer>© boilerplate</footer></body></html>"
    )
    got = spark.createDataFrame([(html_doc,)], ["h"]).select(
        paragraph_text(F.col("h")).alias("t")
    ).collect()[0].t
    assert got == "First para. Body text here."


def test_paragraph_text_no_content_containers_is_empty(spark):
    from briefly_spark.functions.text import paragraph_text

    got = spark.createDataFrame([("<div>only divs</div>",)], ["h"]).select(
        paragraph_text(F.col("h")).alias("t")
    ).collect()[0].t
    assert got == ""


# canonical_url property tests: idempotence and utm-order invariance for
# ALL urls of this shape, not just the fixture table
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _params = st.lists(
        st.sampled_from(
            ["id=3", "a=1", "b=xy", "utm_source=x", "utm_medium=rss", "utm_campaign=z"]
        ),
        max_size=4,
        unique=True,
    )

    @given(
        st.sampled_from(["https://EX.com", "http://news.ex.com"]),
        st.sampled_from(["/a", "/a/", "/news/55", ""]),
        _params,
        st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_canonical_url_idempotent_and_order_invariant(scheme_host, path, params, frag):
        import itertools

        from briefly_spark.functions.text import canonical_url
        from briefly_spark.session import get_spark

        spark = get_spark()
        url = scheme_host + path
        variants = [
            url + ("?" + "&".join(p) if p else "") + ("#f" if frag else "")
            for p in itertools.permutations(params)
        ] or [url + ("#f" if frag else "")]
        df = spark.createDataFrame([(u,) for u in variants], ["u"])
        out = [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
        # every param order of the same logical URL → ONE dedup key
        assert len(set(out)) == 1, (variants, out)
        # idempotent: canonicalizing the canonical form is a no-op
        df2 = spark.createDataFrame([(out[0],)], ["u"])
        again = df2.select(canonical_url(F.col("u")).alias("c")).collect()[0].c
        assert again == out[0]

except ImportError:  # pragma: no cover
    pass


def test_paragraph_text_nested_p_inside_article(spark):
    from briefly_spark.functions.text import paragraph_text

    html_doc = "<article>Intro <p>Nested</p> Outro</article><p>After.</p>"
    got = spark.createDataFrame([(html_doc,)], ["h"]).select(
        paragraph_text(F.col("h")).alias("t")
    ).collect()[0].t
    # the article block matches through its OWN closing tag: no text lost,
    # no parent+child duplication
    assert got == "Intro Nested Outro After."
