"""X129 per-group exact OLS trend — hand-computed fits, the
Fraction-arithmetic reference, degenerate groups, the integer-input
contract, the DuckDB mirror on real testdata, and the one-shuffle plan."""

from __future__ import annotations

from fractions import Fraction

import pytest

from briefly_spark.operators.trends import group_trend, sql_group_trend


def _fit(points):
    """Textbook OLS via exact rationals — the independent reference."""
    n = len(points)
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxx = sum(x * x for x, _ in points)
    sxy = sum(x * y for x, y in points)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    return num, den, sy * sxx - sx * sxy


def test_hand_computed_and_fraction_reference(spark):
    pts = {"a": [(1, 2), (2, 4), (3, 6)],          # exact slope 2
           "b": [(1, 10), (2, 9), (3, 9), (4, 7)]}  # slope -18/20 = -9/10
    rows = [(g, x, y) for g, p in pts.items() for x, y in p]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y LONG")
    got = {r["g"]: r for r in group_trend(
        df, group_cols=["g"], x_col="x", y_col="y").collect()}
    for g, p in pts.items():
        num, den, icept = _fit(p)
        assert int(got[g]["slope_num"]) == num
        assert int(got[g]["slope_den"]) == den
        assert int(got[g]["icept_num"]) == icept
        assert got[g]["n"] == len(p)
    assert Fraction(int(got["a"]["slope_num"]), int(got["a"]["slope_den"])) == 2
    assert Fraction(int(got["b"]["slope_num"]), int(got["b"]["slope_den"])) \
        == Fraction(-9, 10)
    # r² components: perfect fit has slope_num² == slope_den · vary_num
    a = got["a"]
    assert int(a["slope_num"]) ** 2 == int(a["slope_den"]) * int(a["vary_num"])


def test_constant_x_surfaces_zero_denominator(spark):
    df = spark.createDataFrame(
        [("c", 5, 1), ("c", 5, 9)], "g STRING, x LONG, y LONG"
    )
    r = group_trend(df, group_cols=["g"], x_col="x", y_col="y").collect()[0]
    assert int(r["slope_den"]) == 0  # undefined trend is visible, not masked


def test_rejects_non_integer_metric(spark):
    df = spark.createDataFrame([("a", 1, 1.5)], "g STRING, x LONG, y DOUBLE")
    with pytest.raises(ValueError, match="integer"):
        group_trend(df, group_cols=["g"], x_col="x", y_col="y")
    with pytest.raises(ValueError, match="unknown column"):
        group_trend(df, group_cols=["g"], x_col="nope", y_col="x")


def test_duckdb_mirror_on_testdata(spark, sf_dir):
    """Spark DECIMAL(38,0) surface == DuckDB HUGEINT surface on the real
    documents table (per-source length-over-ingest-order trend)."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["source"]: tuple(int(r[c]) for c in (
            "n", "x_sum", "y_sum", "slope_num", "slope_den", "icept_num",
            "vary_num"))
        for r in group_trend(
            docs, group_cols=["source"], x_col="doc_id", y_col="n_chars"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = {
        r[0]: tuple(int(v) for v in r[1:])
        for r in con.execute(sql_group_trend(
            "documents", group_cols=["source"], x_col="doc_id", y_col="n_chars"
        )).fetchall()
    }
    assert got == want
    assert len(got) > 1  # real multi-group surface


def test_single_aggregation_plan(spark, sf_dir):
    """One hash-aggregate shuffle, no join, no window — the scale shape."""
    from briefly_spark.catalog import load_table

    out = group_trend(
        load_table(spark, sf_dir, "documents"),
        group_cols=["source"], x_col="doc_id", y_col="n_chars",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert bad not in plan, plan


# -- X131: the mergeable sufficient-statistics registry ----------------------

def _pts(spark, lo, hi):
    # y = 3x + noise-ish deterministic wiggle, two interleaved groups
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
        F.col("id").alias("x"),
        (F.col("id") * 3 + F.col("id") % 7).alias("y"),
    )


def _fit_rows(df, group_cols=("g",)):
    from briefly_spark.operators.trends import TREND_COLS

    return sorted(
        tuple(r[c] for c in (*group_cols, *TREND_COLS)) for c in [0]
        for r in df.collect()
    )


def test_registry_fold_equals_oneshot_exactly(spark):
    from briefly_spark.operators.trends import (
        trend_batch_sums,
        trend_registry_compact,
        trend_registry_fit,
    )

    whole = _pts(spark, 0, 600)
    oneshot = _fit_rows(group_trend(whole, group_cols=["g"], x_col="x", y_col="y"))
    reg = None
    for b, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 600))):
        block = trend_batch_sums(
            _pts(spark, lo, hi), group_cols=["g"], x_col="x", y_col="y", batch_id=b
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = _fit_rows(trend_registry_fit(reg, group_cols=["g"]))
    assert folded == oneshot  # bit-exact, not approximate
    # compaction: one sentinel block per group, fit unchanged
    compact = trend_registry_compact(reg)
    assert compact.count() == 2
    assert {int(r["batch_id"]) for r in compact.collect()} == {-1}
    assert _fit_rows(trend_registry_fit(compact, group_cols=["g"])) == oneshot


def test_registry_stream_matches_batch_and_rerun_is_noop(spark, tmp_path):
    import time

    from briefly_spark.operators.trends import trend_registry_fit, trend_sums_stream
    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming.incremental import read_parquet_stream

    src = tmp_path / "trend_batches"
    src.mkdir()
    for j, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 600))):
        _pts(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{j}")
        )
        time.sleep(1.1)
    wh = Warehouse(spark, str(tmp_path / "wh_trend"))
    ckpt = str(tmp_path / "trend_ckpt")
    run = lambda: trend_sums_stream(  # noqa: E731
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, registry_table="trend_reg", checkpoint=ckpt,
        group_cols=["g"], x_col="x", y_col="y",
    )
    run()
    got = _fit_rows(trend_registry_fit(wh.read("trend_reg"), group_cols=["g"]))
    want = _fit_rows(
        group_trend(_pts(spark, 0, 600), group_cols=["g"], x_col="x", y_col="y")
    )
    assert got == want  # stream == one-shot, bit-exact
    state = sorted(map(tuple, wh.read("trend_reg").collect()))
    run()  # nothing new
    assert sorted(map(tuple, wh.read("trend_reg").collect())) == state


def test_null_points_excluded_consistently(spark):
    rows = [("a", 1, 2), ("a", None, 5), ("a", 2, None), ("a", 3, 6)]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y LONG")
    r = group_trend(df, group_cols=["g"], x_col="x", y_col="y").collect()[0]
    assert r["n"] == 2  # only the complete observations count
    num, den, icept = _fit([(1, 2), (3, 6)])
    assert (int(r["slope_num"]), int(r["slope_den"])) == (num, den)


def test_sums_by_batch_equals_per_batch_union(spark):
    """r16 fusion pin (guide §2.1): ONE grouped pass over batch_col must
    produce row-identical sums blocks to the per-batch filter loop —
    including when one batch is empty (neither form emits rows for it)."""
    from pyspark.sql import functions as F

    from briefly_spark.operators.trends import (
        SUM_COLS,
        trend_batch_sums,
        trend_sums_by_batch,
    )

    whole = _pts(spark, 0, 600)
    fused = trend_sums_by_batch(
        whole, group_cols=["g"], x_col="x", y_col="y",
        batch_col=F.col("x") % 3,
    )
    loop = None
    for b in range(3):
        blk = trend_batch_sums(
            whole.filter(F.col("x") % 3 == b),
            group_cols=["g"], x_col="x", y_col="y", batch_id=b,
        )
        loop = blk if loop is None else loop.unionByName(blk)
    key = lambda r: (r["batch_id"], r["g"])
    rows = lambda df: sorted(
        tuple(r[c] for c in ("batch_id", "g", *SUM_COLS)) for r in df.collect()
    )
    assert rows(fused) == rows(loop)
    # empty batch: x % 3 never hits 7 — the fused form emits nothing for
    # it, exactly like the per-batch loop's empty-slice group-by
    fused7 = trend_sums_by_batch(
        whole.filter(F.col("x") < 0), group_cols=["g"], x_col="x",
        y_col="y", batch_col=F.col("x") % 3,
    )
    assert fused7.count() == 0
