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
