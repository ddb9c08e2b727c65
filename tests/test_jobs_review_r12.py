"""Regression pins for the r12 jobs/graph review closures: deterministic
ingest survivor election, chain-graph k-core completion, maintenance
idempotence on partitioned tables (+ bucketed skip), and the relate
stage's terminal empty state."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.jobs import (
    ARTICLES,
    ingest_documents,
    maintain_warehouse,
    relate_batch,
)
from briefly_spark.storage import Warehouse


def _wh(spark, tmp_path, name="wh"):
    return Warehouse(spark, str(tmp_path / name))


def test_ingest_survivor_is_deterministic_across_input_order(spark, tmp_path):
    """A re-delivered edited item (same doc_id, different text) must elect
    the SAME surviving bytes regardless of row order — dropDuplicates
    kept a partition-order-dependent row (review r12)."""
    rows = [
        (7, "original content of the article body text", "s1", 41),
        (7, "edited   content of the article body text", "s1", 41),
    ]
    schema = "doc_id LONG, text STRING, source STRING, n_chars LONG"
    outs = []
    for ordering in (rows, rows[::-1]):
        wh = _wh(spark, tmp_path, name=f"wh_{len(outs)}")
        ingest_documents(wh, spark.createDataFrame(ordering, schema).repartition(2))
        outs.append(
            sorted(
                (r["url"], r["content"])
                for r in wh.read(ARTICLES).select("url", "content").collect()
            )
        )
    assert outs[0] == outs[1]  # byte-identical either way


def test_kcore_completes_on_chain_graphs(spark):
    """A ~200-vertex path peels two frontier vertices per round at k=2 —
    cascade depth O(n); the old degeneracy-sized default cap of 64
    raised RuntimeError on exactly this legitimate shape."""
    from briefly_spark.operators.graph import kcore_decompose

    n = 201
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a LONG, b LONG"
    )
    cores = {r["id"]: r["core"] for r in kcore_decompose(edges).collect()}
    assert len(cores) == n
    assert set(cores.values()) == {1}  # every path vertex has core 1


def test_maintenance_is_idempotent_on_partitioned_tables(spark, tmp_path):
    """The per-partition file floor must be part of the ideal: a
    partitioned table compacted once is NOT re-compacted by the next
    sweep (the old ratio re-triggered forever once n_partitions exceeded
    ratio x ceil(rows/target))."""
    wh = _wh(spark, tmp_path)
    df = spark.range(600).select(
        F.col("id"), (F.col("id") % 8).cast("string").alias("src")
    )
    wh.overwrite(df.repartition(6), "t", partition_by=["src"])
    # fragment it: several partition-scoped merges
    for j in range(3):
        wh.merge_upsert(
            spark.range(j * 10, j * 10 + 10).select(
                F.col("id"), (F.col("id") % 8).cast("string").alias("src")
            ),
            "t", ["id"], partition_by=["src"],
        )
    first = maintain_warehouse(wh, ["t"], target_rows_per_file=100_000)
    second = maintain_warehouse(wh, ["t"], target_rows_per_file=100_000)
    assert second == {}  # idempotent right after a sweep
    assert first == {} or "t" in first  # first sweep may or may not compact


def test_maintenance_skips_bucketed_tables(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("k"))
    wh.write_bucketed(df, "bkt_m", ["k"], buckets=4)
    try:
        assert maintain_warehouse(wh, ["bkt_m"], target_rows_per_file=10) == {}
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_m")


def test_relate_writes_terminal_empty_state(spark, sf_dir, tmp_path):
    """A lone article (corpus of one — no possible neighbor) gets an
    EMPTY related_ids written instead of nothing, so it stops occupying
    a work-list slot every cycle (review r12 liveness gap)."""
    from briefly_spark.jobs import embed_batch, run_until_drained

    wh = _wh(spark, tmp_path)
    docs = load_table(spark, sf_dir, "documents").limit(1)
    ingest_documents(wh, docs)
    run_until_drained(wh, batch_size=10)
    art = wh.read(ARTICLES).select("related_ids").collect()[0]
    assert art["related_ids"] == []  # terminal empty, not NULL
    assert relate_batch(wh).processed == 0  # no longer eligible
