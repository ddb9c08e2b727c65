"""docs/COOKBOOK.md executable pin — the representative flows the
cookbook shows a migrating user must actually run as written (same
calls, same argument shapes) against the real testdata.  If an API in
the cookbook drifts, this fails before a user does."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cookbook_dedup_ladder_runs(spark, sf_dir):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.curation import substring_dedup_keepfirst
    from briefly_spark.operators.dedup import exact_dedup, minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = exact_dedup(docs, text_col="text", id_col="doc_id")
    assert exact.count() > 0
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", bands=4, threshold=0.4)
    assert set(pairs.columns) >= {"id_a", "id_b"}
    trimmed = substring_dedup_keepfirst(
        docs, id_col="doc_id", text_col="text", min_tokens=8
    )
    assert trimmed.count() == docs.count()  # every doc gets a surface row


def test_cookbook_quality_flow_runs(spark, sf_dir, tmp_path):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.expectations import (
        column_profiles,
        expectation_anomalies,
        expectation_history_merge,
        expectation_report,
        fk,
        in_range,
        unique,
    )
    from briefly_spark.storage import Warehouse

    tables = {
        n: load_table(spark, sf_dir, n) for n in ("region", "nation", "lineitem", "orders")
    }
    checks = [
        unique("orders", "o_orderkey"),
        fk("lineitem", "l_orderkey", "orders", "o_orderkey"),
        fk("nation", "n_regionkey", "region", "r_regionkey", dim=True),
        in_range("lineitem", "l_discount", 0.0, 0.11),
    ]
    report = expectation_report(spark, tables, checks)
    assert report.count() == len(checks)
    profile = column_profiles(tables["lineitem"], ["l_quantity", "l_discount"])
    assert profile.count() == 2
    wh = Warehouse(spark, str(tmp_path / "wh_cb"))
    expectation_history_merge(wh, report, "audit_history", run_id=42)
    alerts = expectation_anomalies(wh.read("audit_history"))
    assert alerts.count() == len(checks)  # one row per check, none firing yet
    assert not any(r["anomaly"] for r in alerts.collect())


def test_cookbook_tokenizer_flow_runs(spark, sf_dir):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.bpe import bpe_train, word_freqs
    from briefly_spark.operators.unigram import unigram_encode, unigram_train

    docs = load_table(spark, sf_dir, "documents").limit(100)
    words = word_freqs(docs)
    merges, _sym = bpe_train(spark, words, rounds=4)
    assert merges.count() <= 4
    vocab = unigram_train(spark, words, vocab_size=60, seed_size=200)
    assert vocab.count() > 0
    stats = unigram_encode(docs, vocab, id_col="doc_id", text_col="text")
    row = stats.agg(F.min("fertility_fp").alias("m")).collect()[0]
    assert row["m"] >= 10000  # fertility >= 1 piece per word, by construction
