"""X136 pivot/unpivot — hand-computed crosstab, round-trip inverse,
the DuckDB mirror on the real events table, and the one-pass plan
(no hidden distinct scan, no shuffle in the melt)."""

from __future__ import annotations

from briefly_spark.operators.reshape import (
    pivot_counts,
    sql_pivot_counts,
    unpivot_counts,
)


def _df(spark):
    rows = [
        (1, "click", 10), (1, "view", 20), (1, "view", 30),
        (2, "view", 5), (2, "purchase", 7),
    ]
    return spark.createDataFrame(rows, "uid LONG, etype STRING, v LONG")


def test_pivot_hand_computed_counts_and_sums(spark):
    got = {
        r["uid"]: (r["n_click"], r["n_view"], r["n_purchase"])
        for r in pivot_counts(
            _df(spark), row_keys=["uid"], pivot_col="etype",
            values=["click", "view", "purchase"],
        ).collect()
    }
    assert got == {1: (1, 2, 0), 2: (0, 1, 1)}  # absent combos are 0
    sums = {
        r["uid"]: (r["n_click"], r["n_view"])
        for r in pivot_counts(
            _df(spark), row_keys=["uid"], pivot_col="etype",
            values=["click", "view"], agg_col="v",
        ).collect()
    }
    assert sums == {1: (10, 50), 2: (0, 5)}
    # a value absent from the DATA still yields its (all-zero) column
    w = pivot_counts(_df(spark), row_keys=["uid"], pivot_col="etype",
                     values=["click", "nosuch"])
    assert [r["n_nosuch"] for r in w.collect()] == [0, 0]


def test_unpivot_is_the_inverse_reshape(spark):
    values = ["click", "view", "purchase"]
    wide = pivot_counts(_df(spark), row_keys=["uid"], pivot_col="etype",
                        values=values)
    long = unpivot_counts(wide, row_keys=["uid"], values=values)
    got = {(r["uid"], r["k"]): r["n"] for r in long.collect()}
    # exactly rows x values entries, original pivot values restored
    assert len(got) == 2 * 3
    assert got[(1, "view")] == 2 and got[(2, "purchase")] == 1
    assert got[(2, "click")] == 0


def test_duckdb_mirror_on_testdata(spark, sf_dir):
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    ev = load_table(spark, sf_dir, "events")
    etypes = sorted(r["event_type"] for r in ev.select("event_type").distinct().collect())
    got = sorted(
        map(tuple, pivot_counts(
            ev, row_keys=["user_id"], pivot_col="event_type", values=etypes
        ).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{table_path(sf_dir, 'events')}'"
    )
    want = sorted(map(tuple, con.execute(sql_pivot_counts(
        "events", row_keys=["user_id"], pivot_col="event_type", values=etypes
    )).fetchall()))
    assert got == want
    assert len(got) > 10


def test_plan_shapes(spark, sf_dir):
    """Pivot: ONE hash-agg exchange, no hidden distinct scan (one
    FileScan).  Unpivot: Expand only — zero exchanges."""
    from briefly_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    wide = pivot_counts(ev, row_keys=["user_id"], pivot_col="event_type",
                        values=["click", "view"])
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("FileScan") == 1, plan
    long = unpivot_counts(wide.localCheckpoint(), row_keys=["user_id"],
                          values=["click", "view"])
    lplan = long._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in lplan, lplan
    assert "Exchange" not in lplan, lplan


def test_colliding_pivot_values_are_refused(spark):
    """ADVICE r11 #4: 'a-b' and 'a.b' sanitize to the same column name —
    silently duplicate output columns / SELECT aliases / map keys before
    the fix; now a loud ValueError on every surface."""
    import pytest

    from briefly_spark.operators.reshape import (
        pivot_counts,
        sql_pivot_counts,
        unpivot_counts,
    )

    df = spark.createDataFrame([("k", "a-b", 1)], "g STRING, p STRING, v LONG")
    with pytest.raises(ValueError, match="sanitize to the same"):
        pivot_counts(df, row_keys=["g"], pivot_col="p", values=["a-b", "a.b"])
    with pytest.raises(ValueError, match="sanitize to the same"):
        sql_pivot_counts("t", row_keys=["g"], pivot_col="p", values=["a-b", "a.b"])
    wide = pivot_counts(df, row_keys=["g"], pivot_col="p", values=["a-b"])
    with pytest.raises(ValueError, match="sanitize to the same"):
        unpivot_counts(wide, row_keys=["g"], values=["a-b", "a.b"])


def test_quoted_pivot_value_survives_the_mirror(spark):
    """A value containing a single quote must not break the oracle SQL."""
    import duckdb

    from briefly_spark.operators.reshape import pivot_counts, sql_pivot_counts

    rows = [("g1", "o'brien", 2), ("g1", "plain", 3), ("g2", "o'brien", 5)]
    df = spark.createDataFrame(rows, "g STRING, p STRING, v LONG")
    got = sorted(
        map(tuple, pivot_counts(
            df, row_keys=["g"], pivot_col="p", values=["o'brien", "plain"],
            agg_col="v",
        ).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, p VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(sql_pivot_counts(
        "t", row_keys=["g"], pivot_col="p", values=["o'brien", "plain"],
        agg_col="v",
    )).fetchall()))
    assert got == want == [("g1", 2, 3), ("g2", 5, 0)]
