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


# -- X137: the incremental datasheet registry ---------------------------------

def _docs(spark, lo, hi):
    from pyspark.sql import functions as F

    # deterministic text with cross-batch exact duplicates (id % 40)
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 40).cast("string"),
                 F.lit(" body text")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("vi").alias("lang"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )


def test_registry_fold_matches_oneshot(spark):
    from briefly_spark.operators.datasheet import (
        dataset_datasheet,
        datasheet_batch_block,
        datasheet_registry_fold,
    )

    kw = dict(id_col="doc_id", text_col="text", lang_col="lang",
              source_col="source", length_bucket=2)
    whole = _docs(spark, 0, 120)
    oneshot = _sheet(dataset_datasheet(whole, **kw))
    reg = None
    for b, (lo, hi) in enumerate(((0, 40), (40, 80), (80, 120))):
        blk = datasheet_batch_block(_docs(spark, lo, hi), batch_id=b, **kw)
        reg = blk if reg is None else reg.unionByName(blk)
    folded = _sheet(datasheet_registry_fold(reg))
    # exact legs: bit-identical to the one-shot
    for key, v in oneshot.items():
        if key[1] not in ("n_distinct_texts", "n_exact_dup_docs"):
            assert folded[key] == v, key
    # distinct leg: the folded HLL estimate equals the true distinct count
    # at this cardinality (40 distinct texts — sparse-mode exactness), so
    # fold == one-shot == exact
    assert folded[("volume", "n_distinct_texts_est", "")] \
        == oneshot[("volume", "n_distinct_texts", "")] == 40
    assert folded[("volume", "n_exact_dup_docs_est", "")] == 120 - 40
    # replaying a block changes nothing: sums group-replace on batch_id
    # upstream (warehouse merge); at the frame level union idempotence
    # holds for the sketch leg by register determinism
    refold = _sheet(datasheet_registry_fold(reg.unionByName(
        datasheet_batch_block(_docs(spark, 40, 80), batch_id=99, **kw)
    ).filter("batch_id != 99")))
    assert refold == folded


def test_datasheet_stream_matches_batch_and_rerun_noop(spark, tmp_path):
    import time

    from briefly_spark.operators.datasheet import (
        dataset_datasheet,
        datasheet_registry_fold,
        datasheet_stream,
    )
    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming.incremental import read_parquet_stream

    src = tmp_path / "ds_batches"
    src.mkdir()
    for j, (lo, hi) in enumerate(((0, 40), (40, 80), (80, 120))):
        _docs(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{j}")
        )
        time.sleep(1.1)
    wh = Warehouse(spark, str(tmp_path / "wh_ds"))
    kw = dict(id_col="doc_id", text_col="text", lang_col="lang",
              source_col="source", length_bucket=2)
    ckpt = str(tmp_path / "ds_ckpt")
    run = lambda: datasheet_stream(  # noqa: E731
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, registry_table="ds_reg", checkpoint=ckpt, **kw,
    )
    run()
    folded = _sheet(datasheet_registry_fold(wh.read("ds_reg")))
    oneshot = _sheet(dataset_datasheet(_docs(spark, 0, 120), **kw))
    for key, v in oneshot.items():
        if key[1] not in ("n_distinct_texts", "n_exact_dup_docs"):
            assert folded[key] == v, key
    assert folded[("volume", "n_distinct_texts_est", "")] \
        == oneshot[("volume", "n_distinct_texts", "")]
    state = sorted(
        map(tuple, wh.read("ds_reg").drop("sketch").collect())
    )
    run()  # nothing new
    assert sorted(
        map(tuple, wh.read("ds_reg").drop("sketch").collect())
    ) == state


def test_batch_blocks_fused_equals_per_batch_union(spark):
    """r16 fusion pin (guide §2.1): the grouped-by-batch builder must
    produce the same registry rows as the per-batch loop (minus the
    distinct legs the per-batch form filters out anyway), sketch
    registers included (register state is deterministic for identical
    inputs), and the fold over either registry must agree."""
    from pyspark.sql import functions as F

    from briefly_spark.operators.datasheet import (
        datasheet_batch_block,
        datasheet_batch_blocks,
        datasheet_registry_fold,
    )

    kw = dict(id_col="doc_id", text_col="text", lang_col="lang",
              source_col="source", length_bucket=2)
    whole = _docs(spark, 0, 120)
    fused = datasheet_batch_blocks(
        whole, batch_col=F.col("doc_id") % 3, **kw
    )
    loop = None
    for b in range(3):
        blk = datasheet_batch_block(
            whole.filter(F.col("doc_id") % 3 == b), batch_id=b, **kw
        )
        loop = blk if loop is None else loop.unionByName(blk)
    rows = lambda df: sorted(
        (r["batch_id"], r["section"], r["metric"], r["k"], r["value"],
         bytes(r["sketch"]) if r["sketch"] is not None else None)
        for r in df.collect()
    )
    assert rows(fused) == rows(loop)
    assert _sheet(datasheet_registry_fold(fused)) == _sheet(
        datasheet_registry_fold(loop)
    )
