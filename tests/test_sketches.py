"""Mergeable HLL distinct-count registry (operators/sketches.py) —
batch ≡ fold ≡ stream exactness (HLL union is register-level
deterministic), replay group-replace, compaction equivalence, and
estimate accuracy against exact counts on the real events table."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from briefly_spark.operators.sketches import (
    hll_batch_sketches,
    hll_counts_stream,
    hll_registry_compact,
    hll_registry_estimate,
)
from briefly_spark.storage import Warehouse


def _events(spark, lo, hi):
    # user u appears under event_type t when (u + t) % ... — overlapping
    # membership across batches so the union really deduplicates
    return spark.range(lo, hi).select(
        (F.col("id") % 97).alias("user_id"),
        F.when(F.col("id") % 3 == 0, "click").otherwise("view").alias("etype"),
    )


def test_fold_equals_oneshot_and_replay_is_idempotent(spark):
    whole = _events(spark, 0, 900)
    oneshot = {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(
            hll_batch_sketches(
                whole, group_cols=["etype"], value_col="user_id", batch_id=0
            ),
            group_cols=["etype"],
        ).collect()
    }
    reg = None
    for b, (lo, hi) in enumerate(((0, 300), (300, 600), (600, 900))):
        block = hll_batch_sketches(
            _events(spark, lo, hi), group_cols=["etype"], value_col="user_id", batch_id=b
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(reg, group_cols=["etype"]).collect()
    }
    assert folded == oneshot  # register-level union exactness, not approx
    # exactness vs true counts at this cardinality (sparse-mode HLL)
    exact = {
        (r["etype"], r["n"])
        for r in whole.groupBy("etype")
        .agg(F.count_distinct("user_id").cast("long").alias("n"))
        .collect()
    }
    assert folded == exact
    # replaying a block (duplicate rows in the registry) changes nothing —
    # union idempotence at the register level
    replay = reg.unionByName(
        hll_batch_sketches(
            _events(spark, 300, 600), group_cols=["etype"], value_col="user_id", batch_id=1
        )
    )
    assert {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(replay, group_cols=["etype"]).collect()
    } == folded


def test_compaction_preserves_estimates(spark):
    reg = None
    for b in range(4):
        block = hll_batch_sketches(
            _events(spark, b * 200, (b + 1) * 200),
            group_cols=["etype"],
            value_col="user_id",
            batch_id=b,
        )
        reg = block if reg is None else reg.unionByName(block)
    before = {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(reg, group_cols=["etype"]).collect()
    }
    compact = hll_registry_compact(reg)
    assert compact.count() == 2  # one block per group
    assert {int(r["batch_id"]) for r in compact.collect()} == {-1}
    after = {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(compact, group_cols=["etype"]).collect()
    }
    assert after == before


def test_stream_matches_batch_and_checkpoint_rerun_is_noop(spark, tmp_path):
    src = tmp_path / "hll_batches"
    src.mkdir()
    for j, (lo, hi) in enumerate(((0, 300), (300, 600), (600, 900))):
        _events(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{j}")
        )
        time.sleep(1.1)
    wh = Warehouse(spark, str(tmp_path / "wh_hll"))
    from briefly_spark.streaming.incremental import read_parquet_stream

    ckpt = str(tmp_path / "hll_ckpt")
    run = lambda: hll_counts_stream(  # noqa: E731
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh,
        registry_table="hll_reg",
        checkpoint=ckpt,
        group_cols=["etype"],
        value_col="user_id",
    )
    run()
    got = {
        (r["etype"], r["n_distinct_est"])
        for r in hll_registry_estimate(
            wh.read("hll_reg"), group_cols=["etype"]
        ).collect()
    }
    exact = {
        (r["etype"], r["n"])
        for r in _events(spark, 0, 900)
        .groupBy("etype")
        .agg(F.count_distinct("user_id").cast("long").alias("n"))
        .collect()
    }
    assert got == exact
    state = sorted(map(tuple, wh.read("hll_reg").collect()))
    run()  # nothing new
    assert sorted(map(tuple, wh.read("hll_reg").collect())) == state
