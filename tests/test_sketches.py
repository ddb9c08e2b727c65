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


# -- X139: exact mergeable top-k registry -------------------------------------

def _scored(spark, lo, hi):
    # deterministic scores with cross-batch ties and id re-appearances
    return spark.range(lo, hi).select(
        (F.col("id") % 150).alias("doc"),          # ids recur across batches
        ((F.col("id") * 37) % 100).alias("score"),  # ties guaranteed
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"),
    )


def test_topk_fold_is_exact_and_replay_safe(spark):
    from briefly_spark.operators.sketches import topk_batch, topk_registry_resolve

    K = 10
    whole = _scored(spark, 0, 900)
    # one-shot reference with the SAME dedup semantics (best appearance
    # per id), computed independently in python
    best = {}
    for r in whole.collect():
        key = (r["score"], r["payload"])
        if r["doc"] not in best or key > best[r["doc"]]:
            best[r["doc"]] = key
    want = sorted(
        ((doc, s, p) for doc, (s, p) in best.items()),
        key=lambda t: (-t[1], t[0]),
    )[:K]
    reg = None
    for b, (lo, hi) in enumerate(((0, 300), (300, 600), (600, 900))):
        blk = topk_batch(_scored(spark, lo, hi), score_col="score",
                         id_col="doc", k=K, batch_id=b)
        reg = blk if reg is None else reg.unionByName(blk)
    got = [
        (r["doc"], r["score"], r["payload"])
        for r in topk_registry_resolve(
            reg, score_col="score", id_col="doc", k=K).collect()
    ]
    assert got == want  # semilattice fold == one-shot, total order
    # replaying a block changes nothing (id-level best dedup + replace)
    replay = reg.unionByName(topk_batch(_scored(spark, 300, 600),
                                        score_col="score", id_col="doc",
                                        k=K, batch_id=1))
    got2 = [
        (r["doc"], r["score"], r["payload"])
        for r in topk_registry_resolve(
            replay, score_col="score", id_col="doc", k=K).collect()
    ]
    assert got2 == got
    # resolve IS the compactor: resolving the resolved block is stable
    sent = topk_batch(topk_registry_resolve(
        reg, score_col="score", id_col="doc", k=K),
        score_col="score", id_col="doc", k=K, batch_id=-1)
    got3 = [
        (r["doc"], r["score"], r["payload"])
        for r in topk_registry_resolve(
            sent, score_col="score", id_col="doc", k=K).collect()
    ]
    assert got3 == got


def test_topk_batch_plans_as_takeordered(spark):
    from briefly_spark.operators.sketches import topk_batch

    blk = topk_batch(_scored(spark, 0, 500), score_col="score",
                     id_col="doc", k=5, batch_id=0)
    plan = blk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert "Sort [" not in plan.split("TakeOrdered")[0], plan


def test_topk_stream_matches_batch_and_rerun_noop(spark, tmp_path):
    import time

    from briefly_spark.operators.sketches import (
        topk_registry_resolve,
        topk_stream,
    )
    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming.incremental import read_parquet_stream

    src = tmp_path / "topk_batches"
    src.mkdir()
    for j, (lo, hi) in enumerate(((0, 300), (300, 600), (600, 900))):
        _scored(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{j}")
        )
        time.sleep(1.1)
    wh = Warehouse(spark, str(tmp_path / "wh_topk"))
    topk_stream(
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, registry_table="topk_reg", checkpoint=str(tmp_path / "topk_ckpt"),
        score_col="score", id_col="doc", k=7,
    )
    got = [
        (r["doc"], r["score"])
        for r in topk_registry_resolve(
            wh.read("topk_reg"), score_col="score", id_col="doc", k=7).collect()
    ]
    from briefly_spark.operators.sketches import topk_batch

    want = [
        (r["doc"], r["score"])
        for r in topk_batch(_scored(spark, 0, 900), score_col="score",
                            id_col="doc", k=7, batch_id=0).collect()
    ]
    assert got == want
    state = sorted(map(tuple, wh.read("topk_reg").collect()))
    topk_stream(
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, registry_table="topk_reg", checkpoint=str(tmp_path / "topk_ckpt"),
        score_col="score", id_col="doc", k=7,
    )
    assert sorted(map(tuple, wh.read("topk_reg").collect())) == state


def test_topk_block_dedups_ids_before_the_head(spark):
    """The crowd-out hazard the per-id dedup closes: one id occupying
    multiple top ROW slots must not evict a distinct id from the block —
    without the dedup, id 2 (global #2 by ids) would be lost here."""
    from briefly_spark.operators.sketches import topk_batch, topk_registry_resolve

    rows = [(1, 100, "a"), (1, 99, "b"), (1, 98, "c"), (2, 97, "d"), (3, 1, "e")]
    df = spark.createDataFrame(rows, "doc LONG, score LONG, payload STRING")
    blk = topk_batch(df, score_col="score", id_col="doc", k=2, batch_id=0)
    got = [
        (r["doc"], r["score"], r["payload"])
        for r in topk_registry_resolve(
            blk, score_col="score", id_col="doc", k=2).collect()
    ]
    assert got == [(1, 100, "a"), (2, 97, "d")]
