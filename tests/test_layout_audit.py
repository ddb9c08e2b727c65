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
