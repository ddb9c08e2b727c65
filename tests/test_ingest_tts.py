"""Ingest + TTS operator tests: fetch-transport retries and dead-letter
rows, RSS parse goldens, unescape/lenient-date edges, upload-sink
idempotency and token lifecycle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.operators.ingest import (
    fetch_documents,
    lenient_ts,
    lenient_ts_udf,
    parse_rss_py,
    unescape2_expr,
    unescape2_udf,
)
from briefly_spark.operators.tts import synthesize_speech, upload_audio_sink


def test_fetch_transport_retries_and_dead_letter(spark):
    urls = spark.createDataFrame([("u/ok",), ("u/flaky",), ("u/dead",)], ["url"])

    attempts: dict[str, int] = {}

    def transport(url: str) -> str:
        attempts[url] = attempts.get(url, 0) + 1
        if url == "u/dead":
            raise OSError("down")
        if url == "u/flaky" and attempts[url] < 3:
            raise OSError("flaky")
        return f"body-of-{url}"

    out = {
        r["url"]: (r["body"], r["fetch_status"])
        for r in fetch_documents(
            urls.coalesce(1), "url", transport=transport, retries=3
        ).collect()
    }
    assert out["u/ok"] == ("body-of-u/ok", "ok")
    assert out["u/flaky"] == ("body-of-u/flaky", "ok")  # succeeded on retry
    assert out["u/dead"] == ("", "failed")  # dead-letter row, not dropped


def test_parse_rss_golden_and_malformed():
    xml = (
        "<rss><channel><item><title>A</title><link>l1</link>"
        "<description>d1</description><pubDate>p1</pubDate></item>"
        "<item><title>B</title><link>l2</link></item></channel></rss>"
    )
    got = parse_rss_py(xml)
    assert got[0] == {"title": "A", "link": "l1", "description": "d1", "pub_date": "p1"}
    assert got[1]["link"] == "l2" and got[1]["description"] == ""
    assert parse_rss_py("<not xml") == []


def test_parse_rss_malformed_feed_recovers_entries():
    # unescaped ampersand + stray unclosed tag make this invalid XML
    # (ElementTree raises); real feeds look like this and feedparser copes —
    # the tag-soup fallback must recover every intact item block.
    soup = (
        "<rss><channel><lastBuildDate>now<item>"
        "<title><![CDATA[Tom & Jerry]]></title><link>http://x/1?a=1&b=2</link>"
        "<description>R&D news</description><pubDate>p1</pubDate></item>"
        "<item><title>Second</title><link>l2</link></item>"
        "</channel></rss>"
    )
    got = parse_rss_py(soup)
    assert len(got) == 2
    assert got[0]["title"] == "Tom & Jerry"  # CDATA unwrapped
    assert got[0]["link"] == "http://x/1?a=1&b=2"
    assert got[1] == {"title": "Second", "link": "l2", "description": "", "pub_date": ""}


def test_parse_atom_feed_namespaced():
    # Well-formed Atom: namespaced tags, link via href (rel=alternate
    # preferred over rel=self), summary + updated mapped onto the RSS
    # field contract.
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>Blog</title>'
        '<entry><title>First</title>'
        '<link rel="self" href="http://x/self.xml"/>'
        '<link rel="alternate" href="http://x/posts/1"/>'
        "<summary>s1</summary><updated>2024-01-05T10:00:00Z</updated></entry>"
        '<entry><title>Second</title><link href="http://x/posts/2"/>'
        "<content>c2</content><published>2024-01-06T10:00:00Z</published></entry>"
        "</feed>"
    )
    got = parse_rss_py(xml)
    assert got == [
        {
            "title": "First",
            "link": "http://x/posts/1",
            "description": "s1",
            "pub_date": "2024-01-05T10:00:00Z",
        },
        {
            "title": "Second",
            "link": "http://x/posts/2",
            "description": "c2",
            "pub_date": "2024-01-06T10:00:00Z",
        },
    ]


def test_parse_atom_malformed_recovers_entries():
    # invalid XML (unescaped &) → tag-soup path must still see <entry>,
    # and must prefer rel="alternate" over the feed's own rel="self" link
    # exactly like the well-formed path
    soup = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><entry><title>A & B</title>'
        '<link rel="self" href="http://x/feed.xml"/>'
        '<link rel="alternate" href="http://x/1"/><summary>s</summary>'
        "<updated>u1</updated></entry></feed>"
    )
    got = parse_rss_py(soup)
    assert got == [
        {"title": "A & B", "link": "http://x/1", "description": "s", "pub_date": "u1"}
    ]


def test_unescape2_matches_stdlib_on_common_entities(spark):
    cases = ["T &amp;amp; B", "&lt;b&gt;", "a &quot;q&quot; &#39;s&#39;", "plain"]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = df.select(
        unescape2_expr(F.col("t")).alias("native"), unescape2_udf(F.col("t")).alias("udf")
    ).collect()
    for r in got:
        assert r["native"] == r["udf"]
    assert got[0]["native"] == "T & B"


def test_lenient_ts_formats(spark):
    cases = [
        "Mon, 15 Jan 2024 10:30:00 +0000",
        "2024-02-05T08:15:30+00:00",
        "2024-03-01 07:00:00",
        "2024-04-01",
        "1705000000",
        "not a date",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = [r["ts"] for r in df.select(lenient_ts(F.col("t")).alias("ts")).collect()]
    assert [g is not None for g in got] == [True, True, True, True, True, False]
    assert str(got[0]) == "2024-01-15 10:30:00"
    assert str(got[4]) == "2024-01-11 19:06:40"
    # the dateutil UDF fallback parses what the native path can't
    extra = df.filter(F.col("t") == "not a date").select(
        lenient_ts_udf(F.lit("March 5 2024 10:00am")).alias("ts")
    )
    assert str(extra.first()["ts"]).startswith("2024-03-05 10:00")


def test_upload_sink_idempotent_with_token_lifecycle(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    audio = synthesize_speech(docs, "text", "doc_id", backend="fake")
    out = str(tmp_path / "uploads")

    # foreachPartition executes on executors: observe the token lifecycle
    # through sidecar files, not driver-side counters.
    import itertools

    counter = itertools.count(1)

    def refresh() -> str:
        return f"tok-{next(counter)}"

    def uploader(key: str, token: str, payload: bytes) -> None:
        with open(os.path.join(out, f"{key}.bin"), "wb") as f:
            f.write(payload)
        with open(os.path.join(out, f"{key}.tok"), "w") as f:
            f.write(token)

    def tokens() -> set[str]:
        return {
            open(os.path.join(out, f)).read() for f in os.listdir(out) if f.endswith(".tok")
        }

    single = audio.coalesce(1)
    upload_audio_sink(single, out, id_col="doc_id", refresh_fn=refresh, uploader=uploader)
    files = set(os.listdir(out))
    assert sum(1 for f in files if f.endswith(".bin")) == 10
    # one refresh per partition (ttl not hit), token reused across records
    assert tokens() == {"tok-1"}
    # re-delivery (at-least-once) overwrites by idempotency key: no dupes
    upload_audio_sink(single, out, id_col="doc_id", refresh_fn=refresh, uploader=uploader)
    assert set(os.listdir(out)) == files
    # expired ttl forces a refresh per record
    upload_audio_sink(
        single, out, id_col="doc_id", refresh_fn=refresh, uploader=uploader, token_ttl_s=0.0
    )
    assert len(tokens()) == 10
