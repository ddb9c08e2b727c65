"""Catalog load/spread memoization (r15 optimization round).

`spark.read.parquet` burns ~110 ms of driver time per call on schema
inference + file-index setup; ~250 load_table calls per bench run made
that tens of seconds of re-planning the same five immutable paths.  The
memo shares the LOGICAL plan object per (app, path, mtime) — never data:
every action still plans physically and reads the parquet bytes.  These
pins guard the two invalidation axes (session identity, path rewrite)
and the spread() probe's decision stability.
"""

from __future__ import annotations

import os
import shutil

from briefly_spark.catalog import (
    _LOAD_MEMO,
    _SPREAD_PROBE_MEMO,
    load_table,
    spread,
    table_path,
)

SF = "/root/testdata/sf0.001"


def test_load_table_memoizes_per_path(spark):
    a = load_table(spark, SF, "documents")
    b = load_table(spark, SF, "documents")
    assert a is b, "same session + same immutable path must share the plan"
    # distinct tables get distinct entries
    c = load_table(spark, SF, "customer")
    assert c is not a


def test_load_table_result_unchanged_by_memo(spark):
    df = load_table(spark, SF, "documents")
    again = load_table(spark, SF, "documents")
    assert df.columns == again.columns
    assert df.count() == again.count()
    # events normalization is inside the memoized frame
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    # build a private sf dir with a copied documents table, read it,
    # rewrite the file, and confirm the memo hands back a FRESH frame
    sf_dir = str(tmp_path / "sf_memo")
    os.makedirs(sf_dir)
    src = table_path(SF, "documents")
    dst = table_path(sf_dir, "documents")
    shutil.copy(src, dst)
    first = load_table(spark, sf_dir, "documents")
    n1 = first.count()
    # rewrite: same schema, fewer rows (subset), strictly newer mtime
    sub = first.limit(max(1, n1 // 2))
    sub.toPandas().to_parquet(dst + ".new")
    os.replace(dst + ".new", dst)
    os.utime(dst)  # ensure the mtime moves even on coarse filesystems
    second = load_table(spark, sf_dir, "documents")
    assert second is not first, "a rewritten path must not reuse the plan"
    assert second.count() == max(1, n1 // 2)


def test_spread_probe_memoized_and_decision_stable(spark):
    df = load_table(spark, SF, "documents")
    out1 = spread(df)
    key = (*getattr(df, "_briefly_scan_key"), spark.sparkContext.defaultParallelism)
    assert key in _SPREAD_PROBE_MEMO, "probe result must be memoized per version"
    out2 = spread(load_table(spark, SF, "documents"))
    # decision is deterministic: both calls agree on whether to widen
    assert out1.rdd.getNumPartitions() == out2.rdd.getNumPartitions()


def test_spread_probe_dies_with_rewritten_version(spark, tmp_path):
    """ADVICE r15 #2: the probe memo shares the load memo's full
    (app, path, mtime) identity — a rewritten path must re-probe, never
    reuse the stale partition count."""
    sf_dir = str(tmp_path / "sf_probe")
    os.makedirs(sf_dir)
    shutil.copy(table_path(SF, "documents"), table_path(sf_dir, "documents"))
    first = load_table(spark, sf_dir, "documents")
    spread(first)
    k1 = (*first._briefly_scan_key, spark.sparkContext.defaultParallelism)
    assert k1 in _SPREAD_PROBE_MEMO
    dst = table_path(sf_dir, "documents")
    first.limit(5).toPandas().to_parquet(dst + ".new")
    os.replace(dst + ".new", dst)
    os.utime(dst)
    second = load_table(spark, sf_dir, "documents")
    assert second._briefly_scan_key != first._briefly_scan_key
    assert k1 not in _SPREAD_PROBE_MEMO, "stale probe entry must be evicted"
    spread(second)  # re-probes under the new version key
    k2 = (*second._briefly_scan_key, spark.sparkContext.defaultParallelism)
    assert k2 in _SPREAD_PROBE_MEMO


def test_memos_stay_bounded_across_sessions(spark):
    """VERDICT r15 #8: entries keyed by foreign applicationIds are evicted
    on insert, so the memo never outgrows one app's live table count."""
    sc = spark.sparkContext
    load_table(spark, SF, "documents")
    load_table(spark, SF, "customer")
    real_app = sc._briefly_app_id
    try:
        sc._briefly_app_id = "app-simulated-restart"
        load_table(spark, SF, "documents")
        apps = {k[0] for k in _LOAD_MEMO}
        assert apps == {"app-simulated-restart"}, (
            f"foreign-app entries must be evicted on insert, got {apps}"
        )
        assert all(k[0] == "app-simulated-restart" for k in _SPREAD_PROBE_MEMO)
        from briefly_spark.catalog import TABLES

        assert len(_LOAD_MEMO) <= len(TABLES)
    finally:
        sc._briefly_app_id = real_app
        _LOAD_MEMO.clear()
        _SPREAD_PROBE_MEMO.clear()


def test_memo_is_plan_metadata_not_data(spark):
    """The memo must never pin data: un-cached frames recompute per
    action (two actions on the memoized frame both see the real file)."""
    df = load_table(spark, SF, "documents")
    assert df.storageLevel.useMemory is False
    assert df.count() == load_table(spark, SF, "documents").count()
    assert any(k[1].endswith("documents.parquet") for k in _LOAD_MEMO)


def test_warehouse_read_memo_sees_every_merge(spark, tmp_path):
    """Warehouse.read memoizes repeat reads of an UNCHANGED version but a
    merge (partition-scoped or full-swap) must always invalidate — the
    next read reflects the new contents."""
    from briefly_spark.storage import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, source string")
    wh.overwrite(df0, "t")
    first = wh.read("t")
    assert wh.read("t") is first, "unchanged version must share the plan"
    assert first.count() == 2
    # full-swap overwrite: new dir inode
    wh.overwrite(
        spark.createDataFrame([(3, "c")], "id long, source string"), "t"
    )
    second = wh.read("t")
    assert second is not first
    assert second.count() == 1
    # keyed merge (exercises the partition-scoped staging path)
    wh.merge_upsert(
        spark.createDataFrame([(4, "d")], "id long, source string"),
        "t",
        ["id"],
    )
    third = wh.read("t")
    assert third is not second
    assert third.count() == 2
