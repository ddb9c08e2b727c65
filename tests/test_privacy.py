"""X130 k-anonymity / l-diversity audits — hand-computed crowd sizes,
the suppression work-list contract, the DuckDB mirrors on real testdata,
and the one-shuffle report plan."""

from __future__ import annotations

from briefly_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymity_summary,
    sql_k_anonymity_report,
    sql_k_anonymity_summary,
    suppression_worklist,
)

_ROWS = [
    # (zip, age, disease) — the classic QI pair + sensitive attribute
    ("100", 30, "flu"),
    ("100", 30, "flu"),
    ("100", 30, "cold"),   # group (100,30): size 3, 2 distinct diseases
    ("200", 40, "flu"),
    ("200", 40, "flu"),    # group (200,40): size 2, 1 distinct -> l<2
    ("300", 50, "cancer"),  # group (300,50): size 1 -> k<2
]


def _df(spark):
    return spark.createDataFrame(_ROWS, "zip STRING, age LONG, disease STRING")


def test_report_hand_computed(spark):
    got = {
        (r["zip"], r["age"]): (r["group_size"], r["l_distinct"])
        for r in k_anonymity_report(
            _df(spark), quasi_cols=["zip", "age"], sensitive_col="disease"
        ).collect()
    }
    assert got == {("100", 30): (3, 2), ("200", 40): (2, 1), ("300", 50): (1, 1)}


def test_summary_and_l_diversity(spark):
    r = k_anonymity_summary(
        _df(spark), quasi_cols=["zip", "age"], k=2,
        sensitive_col="disease", l=2,
    ).collect()[0]
    assert (r["k_min"], r["n_groups"], r["n_rows"]) == (1, 3, 6)
    assert (r["n_violating_groups"], r["n_suppressed_rows"]) == (1, 1)
    # k-anonymity alone misses the homogeneous (200,40) group — l catches it
    assert (r["l_min"], r["n_l_violating_groups"]) == (1, 2)


def test_suppression_worklist_exactly_the_small_crowds(spark):
    got = sorted(
        map(tuple, suppression_worklist(
            _df(spark), quasi_cols=["zip", "age"], k=2).collect())
    )
    assert got == [("300", 50, "cancer")]
    # k=4 sweeps in the size-2 and size-3 groups too
    assert suppression_worklist(
        _df(spark), quasi_cols=["zip", "age"], k=4).count() == 6


def test_null_qi_groups_together(spark):
    df = spark.createDataFrame(
        [(None, 1, "a"), (None, 1, "b")], "zip STRING, age LONG, disease STRING"
    )
    rep = k_anonymity_report(df, quasi_cols=["zip", "age"]).collect()
    assert len(rep) == 1 and rep[0]["group_size"] == 2


def test_duckdb_mirrors_on_testdata(spark, sf_dir):
    """Report + summary mirrors value-match on the real customer table
    (QI = nation × market segment, sensitive = account balance)."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    cust = load_table(spark, sf_dir, "customer")
    qi = ["c_nationkey", "c_mktsegment"]
    got_rep = {
        (r["c_nationkey"], r["c_mktsegment"]): (r["group_size"], r["l_distinct"])
        for r in k_anonymity_report(
            cust, quasi_cols=qi, sensitive_col="c_acctbal").collect()
    }
    got_sum = tuple(
        k_anonymity_summary(
            cust, quasi_cols=qi, k=3, sensitive_col="c_acctbal", l=2
        ).collect()[0]
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{table_path(sf_dir, 'customer')}'"
    )
    want_rep = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(sql_k_anonymity_report(
            "customer", quasi_cols=qi, sensitive_col="c_acctbal")).fetchall()
    }
    want_sum = tuple(con.execute(sql_k_anonymity_summary(
        "customer", quasi_cols=qi, k=3, sensitive_col="c_acctbal", l=2
    )).fetchall()[0])
    assert got_rep == want_rep
    assert got_sum == want_sum
    assert len(got_rep) > 5  # real multi-group surface


def test_report_single_aggregation_plan(spark, sf_dir):
    from briefly_spark.catalog import load_table

    rep = k_anonymity_report(
        load_table(spark, sf_dir, "customer"),
        quasi_cols=["c_nationkey", "c_mktsegment"],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert bad not in plan, plan
