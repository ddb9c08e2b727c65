"""X133 dataset release datasheet — hand-computed legs, the DuckDB
mirror on real testdata, optional-column behavior, and the
bounded-output contract."""

from __future__ import annotations

from briefly_spark.operators.datasheet import (
    dataset_datasheet,
    sql_dataset_datasheet,
)


def _sheet(df):
    return {
        (r["section"], r["metric"], r["k"]): r["value"] for r in df.collect()
    }


def test_hand_computed_legs(spark):
    rows = [
        (1, "hello world", "en", "a"),
        (2, "hello world", "en", "a"),     # exact dup of doc 1
        (3, "xin chao the gioi bon ba", "vi", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING, source STRING")
    got = _sheet(dataset_datasheet(
        df, id_col="doc_id", text_col="text", lang_col="lang",
        source_col="source", length_bucket=3,
    ))
    assert got[("volume", "n_docs", "")] == 3
    assert got[("volume", "n_tokens", "")] == 2 + 2 + 6
    assert got[("volume", "n_chars", "")] == 11 + 11 + 24
    assert got[("volume", "n_distinct_texts", "")] == 2
    assert got[("volume", "n_exact_dup_docs", "")] == 1
    assert got[("language", "n_docs", "en")] == 2
    assert got[("language", "n_docs", "vi")] == 1
    assert got[("source", "n_docs", "a")] == 2
    # token-length buckets of width 3: docs 1,2 (2 toks -> 0), doc 3 (6 -> 6)
    assert got[("length_hist", "n_docs", "0")] == 2
    assert got[("length_hist", "n_docs", "6")] == 1


def test_optional_columns_omit_sections(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    got = _sheet(dataset_datasheet(df, id_col="doc_id", text_col="text"))
    sections = {s for s, _, _ in got}
    assert sections == {"volume", "length_hist"}


def test_duckdb_mirror_on_testdata(spark, sf_dir):
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    docs = load_table(spark, sf_dir, "documents")
    got = _sheet(dataset_datasheet(
        docs, id_col="doc_id", text_col="text", lang_col="lang",
        source_col="source",
    ))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(sql_dataset_datasheet(
            "documents", id_col="doc_id", text_col="text", lang_col="lang",
            source_col="source",
        )).fetchall()
    }
    assert got == want
    assert got[("volume", "n_docs", "")] > 0
    assert len([1 for s, _, _ in got if s == "language"]) > 1


def test_output_is_bounded_not_row_scaled(spark, sf_dir):
    """The frame is (constants + languages + sources + buckets)-bounded —
    the release-card contract: rows don't scale with the corpus."""
    from briefly_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    sheet = dataset_datasheet(
        docs, id_col="doc_id", text_col="text", lang_col="lang",
        source_col="source",
    )
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    assert sheet.count() <= 5 + n_lang + n_src + 64  # 64 >> bucket count
