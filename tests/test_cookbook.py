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


def test_cookbook_trend_flow_runs(spark, sf_dir, tmp_path):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.trends import (
        group_trend,
        trend_batch_sums,
        trend_registry_fit,
    )
    from briefly_spark.storage import Warehouse

    docs = load_table(spark, sf_dir, "documents")
    fit = group_trend(docs, group_cols=["source"], x_col="doc_id", y_col="n_chars")
    assert {"slope_num", "slope_den", "icept_num"} <= set(fit.columns)
    assert fit.count() > 1
    # standing-registry path as the cookbook shows it (batch form of the
    # stream: same block builder foreachBatch uses)
    wh = Warehouse(spark, str(tmp_path / "wh_ck_trend"))
    wh.merge_upsert(
        trend_batch_sums(docs, group_cols=["source"], x_col="doc_id",
                         y_col="n_chars", batch_id=0),
        "len_trend_reg", ["batch_id"],
    )
    reg_fit = trend_registry_fit(wh.read("len_trend_reg"), group_cols=["source"])
    assert sorted(map(tuple, reg_fit.collect())) == sorted(map(tuple, fit.collect()))


def test_cookbook_privacy_flow_runs(spark, sf_dir):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.privacy import (
        generalize_to_k,
        k_anonymity_summary,
        suppression_worklist,
    )

    users = load_table(spark, sf_dir, "customer")
    qi = ["c_nationkey", "c_mktsegment"]
    risk = k_anonymity_summary(
        users, quasi_cols=qi, k=5, sensitive_col="c_acctbal", l=2
    ).collect()[0]
    assert risk["n_groups"] > 1
    todo = suppression_worklist(users, quasi_cols=qi, k=5)
    assert todo.count() == risk["n_suppressed_rows"]
    released, audit = generalize_to_k(users, k=5, ladders={
        "c_nationkey": [F.lit(None).cast("int")],
        "c_mktsegment": [F.substring("c_mktsegment", 1, 1),
                         F.lit(None).cast("string")],
    })
    check = k_anonymity_summary(released, quasi_cols=qi, k=5).collect()[0]
    assert check["n_violating_groups"] == 0  # the release contract


def test_cookbook_new_r12_flows_run(spark, sf_dir, tmp_path):
    """The X142-X147 cookbook sections as written: fuzzy tier, admission
    registry, cluster split, standing quantiles, correlation screen,
    time-series densify."""
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.covmat import pairwise_moments, pairwise_sums
    from briefly_spark.operators.dedup import exact_dedup, neardup_incremental
    from briefly_spark.operators.fuzzy import fuzzy_dedup_pairs
    from briefly_spark.operators.histq import (
        group_quantiles,
        histq_batch_blocks,
        histq_registry_quantiles,
    )
    from briefly_spark.operators.temporal import resample_locf
    from briefly_spark.operators.textstats import cluster_split, split_leakage_report

    part = load_table(spark, sf_dir, "part")
    near = fuzzy_dedup_pairs(part, id_col="p_partkey", text_col="p_name", max_dist=2)
    assert set(near.columns) == {"left_id", "right_id", "dist"}

    docs = load_table(spark, sf_dir, "documents")
    band_reg = spark.createDataFrame([], "batch_id long, band int, key string, id long")
    sig_reg = spark.createDataFrame([], "batch_id long, id long, sig array<string>")
    admitted, band_delta, sig_delta, rejects = neardup_incremental(
        docs.select("doc_id", "text"), band_reg, sig_reg,
        id_col="doc_id", text_col="text", batch_id=7,
    )
    assert admitted.count() + rejects.count() == docs.count()

    clusters = exact_dedup(docs, text_col="text", id_col="doc_id")
    assign = (
        docs.select(F.md5("text").alias("content_md5"), F.col("doc_id").alias("id"))
        .join(clusters.select("content_md5", F.col("keep_id").alias("cluster")),
              "content_md5")
        .select("id", "cluster")
    )
    split = cluster_split(assign, id_col="id", cluster_col="cluster")
    pairs = split.limit(0).select(
        F.col("id").alias("id_a"), F.col("id").alias("id_b")
    )
    assert split_leakage_report(split.select("id", "split"), pairs).count() == 0

    q = group_quantiles(docs, group_cols=["source"], value_col="n_chars")
    assert set(q.columns) == {"source", "p", "n", "rank", "bin_idx", "lo", "hi"}
    block = histq_batch_blocks(
        docs, group_cols=["source"], value_col="n_chars", batch_id=7
    )
    standing = histq_registry_quantiles(block, group_cols=["source"])
    assert sorted(map(tuple, standing.collect())) == sorted(map(tuple, q.collect()))

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc"),
    )
    m = pairwise_moments(
        pairwise_sums(li, group_cols=["l_returnflag"],
                      metric_cols=["qty", "cents", "disc"]),
        group_cols=["l_returnflag"],
    )
    assert m.count() == 3 * 3  # 3 flags x 3 pairs

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id"
    )
    grid = resample_locf(ev, key_cols=["user_id"], ts_col="tsu",
                         value_col="event_id", step=3_600_000_000, max_fill=24)
    assert {"bucket", "bucket_start", "observed", "value"} <= set(grid.columns)


def test_cookbook_standing_weighted_sample_runs(spark, sf_dir):
    """The standing-sample recipe: topk_batch over the q106 E-S priority
    folds to exactly the one-shot weighted sample — the semilattice
    argument with a sampling score."""
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.sketches import topk_batch, topk_registry_resolve
    from briefly_spark.operators.textstats import _hash16
    from briefly_spark.queries.scale import _WS_KEY_SPARK

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        _hash16(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("skey", F.expr(_WS_KEY_SPARK)).drop("h")
    oneshot = [
        r["doc_id"]
        for r in docs.orderBy(F.col("skey").desc(), "doc_id").limit(20).collect()
    ]
    reg = None
    for b in range(3):
        block = topk_batch(
            docs.filter(F.col("doc_id") % 3 == b),
            score_col="skey", id_col="doc_id", k=20, batch_id=b,
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = [
        r["doc_id"]
        for r in topk_registry_resolve(reg, score_col="skey", id_col="doc_id", k=20)
        .orderBy(F.col("skey").desc(), "doc_id")
        .collect()
    ]
    assert folded == oneshot


def test_cookbook_ivfpq_flow_runs(spark, sf_dir):
    """The r14 'Similarity search' addition: the IVF-PQ snippet must run
    as written (X150 — the at-100TB path the cookbook points flat-PQ
    users to)."""
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.pq import ivfpq_search, pq_fit_encode, quantized

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_fit_encode(
        emb, id_col="vec_id", vec_col="embedding", dim=64, subspaces=8, k=16, iters=2
    )
    corpus_q = quantized(emb, "vec_id", "embedding")
    queries = corpus_q.filter("id % 20 = 0").selectExpr("id AS query_id", "q")
    hits = ivfpq_search(
        queries, corpus_q, codes, books, dim=64, subspaces=8,
        n_cells=16, n_probe=8,
    )
    rows = hits.collect()
    assert rows and {r.rank for r in rows} <= set(range(1, 6))
    assert set(hits.columns) == {"query_id", "neighbor_id", "rank", "sq_dist"}
