"""X140 warehouse layout audit — file inventory, the small-file
report, the compaction work-list, and the repair loop closing it."""

from __future__ import annotations

from briefly_spark.storage import Warehouse


def test_layout_report_and_compaction_worklist(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh_layout"))
    df = spark.range(2000).selectExpr("id", "id * 2 AS v")
    # a fragmented table (20 tiny files) and a healthy one (1 file)
    wh.overwrite(df.repartition(20), "fragmented")
    wh.overwrite(df.coalesce(1), "healthy")
    assert wh.tables() == ["fragmented", "healthy"]

    rep = {r["table"]: r for r in wh.layout_report(small_file_bytes=1 << 20).collect()}
    assert rep["fragmented"]["n_files"] == 20
    assert rep["fragmented"]["n_small"] == 20  # all tiny
    assert rep["healthy"]["n_files"] == 1
    assert rep["fragmented"]["total_bytes"] == sum(
        b for _, b in wh.table_files("fragmented")
    )
    assert rep["fragmented"]["min_bytes"] <= rep["fragmented"]["max_bytes"]

    todo = wh.compaction_worklist(small_file_bytes=1 << 20, min_files=4)
    assert todo == ["fragmented"]  # healthy is under min_files

    # the repair loop: compact the flagged table, the work-list drains
    n_files = wh.compact("fragmented", target_rows_per_file=2000)
    assert n_files == 1
    assert wh.compaction_worklist(small_file_bytes=1 << 20, min_files=4) == []
    # data survived byte-for-byte
    assert wh.read("fragmented").count() == 2000
    rep2 = {r["table"]: r for r in wh.layout_report().collect()}
    assert rep2["fragmented"]["n_files"] == 1


def test_bronze_namespace_is_not_a_table(spark, tmp_path):
    """ADVICE r11 #2: the bronze/{table}/run_id=... snapshot tree must
    never surface as a table — a maintenance loop that compacted it
    would rewrite raw provenance flat (or fail on mixed schemas)."""
    wh = Warehouse(spark, str(tmp_path / "wh_bronze"))
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    wh.overwrite(df.repartition(8), "live")
    wh.write_bronze(df, "live", run_id="r1")
    wh.write_bronze(df.selectExpr("id"), "other", run_id="r2")  # mixed schema
    assert wh.tables() == ["live"]
    rep = {r["table"] for r in wh.layout_report().collect()}
    assert rep == {"live"}
    assert "bronze" not in wh.compaction_worklist(
        small_file_bytes=1 << 20, min_files=1, min_small_frac=0.0
    )


def test_compact_preserves_hive_partition_layout(spark, tmp_path):
    """ADVICE r11 #2 (second half): compacting a partitioned table must
    keep the key=value layout — a flat rewrite broke the layout contract
    and the next partition-scoped merge refused the table."""
    wh = Warehouse(spark, str(tmp_path / "wh_part"))
    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS part", "id * 2 AS v"
    )
    wh.overwrite(df.repartition(12), "t", partition_by=["part"])
    assert wh.partition_layout("t") == ["part"]
    wh.compact("t", target_rows_per_file=1000)
    # layout survived: the contract check the merges rely on still passes
    assert wh.partition_layout("t") == ["part"]
    wh._assert_partitioned_layout("t", ["part"])
    assert wh.read("t").count() == 1000
    # and a partition-scoped merge still works end-to-end
    upd = spark.createDataFrame([(5, "2", 999)], "id LONG, part STRING, v LONG")
    wh.merge_upsert(upd, "t", key=["id"], partition_by=["part"])
    assert wh.read("t").filter("id = 5").collect()[0]["v"] == 999
    # flat tables report an empty layout
    wh.overwrite(df.drop("part"), "flat")
    assert wh.partition_layout("flat") == []


def test_compact_preserves_two_level_partition_layout(spark, tmp_path):
    """partition_layout walks the full key= chain (outermost first) and
    compact() rewrites through BOTH levels."""
    wh = Warehouse(spark, str(tmp_path / "wh_part2"))
    df = spark.range(600).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS a", "CAST(id % 3 AS STRING) AS b",
        "id * 7 AS v",
    )
    wh.overwrite(df.repartition(10), "t2", partition_by=["a", "b"])
    assert wh.partition_layout("t2") == ["a", "b"]
    wh.compact("t2", target_rows_per_file=600)
    assert wh.partition_layout("t2") == ["a", "b"]
    got = wh.read("t2")
    assert got.count() == 600
    # hive partition values read back type-inferred (ints here)
    assert {str(r["a"]) for r in got.select("a").distinct().collect()} == {"0", "1"}


def test_compact_preserves_noncanonical_partition_strings(spark, tmp_path):
    """Partition values that type inference would collapse ('00' and '0'
    both parse to int 0) must survive compact() byte-for-byte — the
    rewrite reads with partition-value inference OFF."""
    wh = Warehouse(spark, str(tmp_path / "wh_noncanon"))
    rows = [("00", 1), ("00", 2), ("0", 3), ("01", 4)]
    df = spark.createDataFrame(rows, "part STRING, v LONG")
    wh.overwrite(df.repartition(4), "t3", partition_by=["part"])
    import os
    dirs = lambda: sorted(
        d for d in os.listdir(wh.path("t3")) if d.startswith("part=")
    )
    assert dirs() == ["part=0", "part=00", "part=01"]
    wh.compact("t3", target_rows_per_file=10)
    assert dirs() == ["part=0", "part=00", "part=01"]  # no collapse/rename
    # read back with inference off to see the exact on-disk strings
    conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    assert spark.conf.get(conf) in ("true", "True")  # conf was restored
    spark.conf.set(conf, "false")
    try:
        got = sorted((r["part"], r["v"]) for r in wh.read("t3").collect())
    finally:
        spark.conf.set(conf, "true")
    assert got == [("0", 3), ("00", 1), ("00", 2), ("01", 4)]


def test_compact_bypasses_read_memo(spark, tmp_path):
    """ADVICE r15 #1: a table read earlier in the session leaves an
    inference-ON frame in the Warehouse read memo; compact() must NOT
    reuse it (its parsed partition values would collapse '00'→'0' on
    rewrite), and must not leave its own inference-OFF frame behind for
    later plain reads."""
    wh = Warehouse(spark, str(tmp_path / "wh_memo_bypass"))
    rows = [("00", 1), ("00", 2), ("0", 3), ("01", 4)]
    df = spark.createDataFrame(rows, "part STRING, v LONG")
    wh.overwrite(df.repartition(4), "t5", partition_by=["part"])
    # prime the read memo with an inference-ON read of this exact version
    primed = wh.read("t5")
    assert wh.read("t5") is primed
    import os
    dirs = lambda: sorted(
        d for d in os.listdir(wh.path("t5")) if d.startswith("part=")
    )
    wh.compact("t5", target_rows_per_file=10)
    assert dirs() == ["part=0", "part=00", "part=01"], (
        "compact reused the memoized inference-ON frame and collapsed "
        "non-canonical partition dirs"
    )
    # post-compact plain read: partition column type-inferred again (an
    # int here) — a string dtype would mean the compact-time
    # inference-OFF frame leaked into the read memo
    got = wh.read("t5")
    assert dict(got.dtypes)["part"] != "string"
    assert got.count() == 4


def test_partition_layout_survives_empty_branch_and_refuses_mixed(spark, tmp_path):
    """One empty/shallow subtree must not truncate the detected chain
    (every branch is walked), and data files next to key= dirs raise."""
    import os

    wh = Warehouse(spark, str(tmp_path / "wh_branchy"))
    df = spark.range(200).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS a", "CAST(id % 3 AS STRING) AS b",
        "id AS v",
    )
    wh.overwrite(df, "t4", partition_by=["a", "b"])
    # hollow out one branch: a=0 loses all its b= children
    victim = os.path.join(wh.path("t4"), "a=0")
    for d in list(os.listdir(victim)):
        if d.startswith("b="):
            import shutil
            shutil.rmtree(os.path.join(victim, d))
    assert wh.partition_layout("t4") == ["a", "b"]  # not truncated to [a]
    # mixed layout: a data file directly beside the a= dirs
    open(os.path.join(wh.path("t4"), "stray.parquet"), "wb").close()
    import pytest
    with pytest.raises(ValueError, match="mixed layout"):
        wh.partition_layout("t4")
