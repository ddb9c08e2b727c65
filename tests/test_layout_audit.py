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
