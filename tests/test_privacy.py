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


# -- X132: greedy generalization-to-k ----------------------------------------

def _gen_df(spark):
    rows = [("10001", 31), ("10002", 32), ("20001", 45), ("20002", 47)]
    return spark.createDataFrame(rows, "zip STRING, age LONG")


def _ladders():
    from pyspark.sql import functions as F

    return {
        "zip": [F.substring("zip", 1, 3), F.lit(None).cast("string")],
        "age": [(F.col("age") - F.col("age") % 10), F.lit(None).cast("long")],
    }


def test_generalize_greedy_hand_traced(spark):
    """Raw table: every QI pair is a singleton.  Round 1: neither single
    promotion fixes anything (tie) -> first ladder (zip) promotes to its
    prefix.  Round 2: the decade promotion empties the violation set ->
    k-anonymous with NO suppression, exactly two rounds."""
    from briefly_spark.operators.privacy import generalize_to_k

    released, audit = generalize_to_k(_gen_df(spark), ladders=_ladders(), k=2)
    assert audit == {
        "levels": {"zip": 1, "age": 1}, "rounds": 2,
        "suppressed_rows": 0, "k": 2,
    }
    got = sorted(map(tuple, released.collect()))
    assert got == [("100", 30), ("100", 30), ("200", 40), ("200", 40)]
    # released table IS k-anonymous on the generalized QI columns
    s = k_anonymity_summary(released, quasi_cols=["zip", "age"], k=2).collect()[0]
    assert s["k_min"] >= 2 and s["n_violating_groups"] == 0


def test_generalize_suppresses_when_ladders_exhausted(spark):
    """A short ladder (prefix only, no NULL top) cannot crowd the outlier
    — the remainder suppression step drops it and the release is still
    k-anonymous."""
    from pyspark.sql import functions as F

    from briefly_spark.operators.privacy import generalize_to_k

    rows = [("10001", 1), ("10002", 1), ("99999", 1)]
    df = spark.createDataFrame(rows, "zip STRING, v LONG")
    released, audit = generalize_to_k(
        df, ladders={"zip": [F.substring("zip", 1, 3)]}, k=2
    )
    assert audit["levels"] == {"zip": 1}
    assert audit["suppressed_rows"] == 1
    assert sorted(map(tuple, released.collect())) == [("100", 1), ("100", 1)]
    # suppress_remainder=False keeps the outlier and reports it
    kept, audit2 = generalize_to_k(
        df, ladders={"zip": [F.substring("zip", 1, 3)]}, k=2,
        suppress_remainder=False,
    )
    assert kept.count() == 3 and audit2["suppressed_rows"] == 0


def test_generalize_is_deterministic_and_noop_when_already_anonymous(spark):
    from briefly_spark.operators.privacy import generalize_to_k

    a = generalize_to_k(_gen_df(spark), ladders=_ladders(), k=2)
    b = generalize_to_k(_gen_df(spark), ladders=_ladders(), k=2)
    assert a[1] == b[1]
    assert sorted(map(tuple, a[0].collect())) == sorted(map(tuple, b[0].collect()))
    # k=1 is already satisfied -> zero rounds, raw columns pass through
    released, audit = generalize_to_k(_gen_df(spark), ladders=_ladders(), k=1)
    assert audit == {
        "levels": {"zip": 0, "age": 0}, "rounds": 0,
        "suppressed_rows": 0, "k": 1,
    }
    assert sorted(map(tuple, released.collect())) \
        == sorted(map(tuple, _gen_df(spark).collect()))


def test_null_qi_rows_are_flagged_and_suppressed(spark):
    """ADVICE r11 #1: the audit groups NULL QIs together (a linkable
    "unknown" crowd), so the work-list and the release joins must treat
    them the same — plain-equality semi/anti joins silently dropped
    NULL-keyed rows from the work-list and KEPT them in the release,
    breaking the 'ALWAYS k-anonymous' guarantee exactly where the
    suppressed_rows audit claimed they were dropped."""
    from pyspark.sql import functions as F

    from briefly_spark.operators.privacy import generalize_to_k

    rows = [
        (None, None, "x"),               # NULL-QI singleton: sub-k crowd
        ("100", 30, "a"), ("100", 30, "b"),
    ]
    df = spark.createDataFrame(rows, "zip STRING, age LONG, disease STRING")
    # the work-list must flag the NULL-keyed row
    wl = sorted(
        (r["zip"], r["age"]) for r in
        suppression_worklist(df, quasi_cols=["zip", "age"], k=2).collect()
    )
    assert wl == [(None, None)]
    # a ladder whose top level IS NULL: rows coarsened to NULL must still
    # crowd (or suppress) like any other group
    sing = [("10001", "s1"), ("20002", "s2"), ("30003", "s3")]
    sdf = spark.createDataFrame(sing, "zip STRING, v STRING")
    released, audit = generalize_to_k(
        sdf,
        ladders={"zip": [F.substring("zip", 1, 1), F.lit(None).cast("string")]},
        k=3,
    )
    # all three distinct prefixes -> promote to NULL: one crowd of 3
    assert audit["levels"] == {"zip": 2} and audit["suppressed_rows"] == 0
    assert released.count() == 3
    # and when suppression must fire on a NULL group, it actually drops it
    two = spark.createDataFrame(
        [(None, "a"), (None, "b"), ("1", "c"), ("1", "d"), ("1", "e")],
        "zip STRING, v STRING",
    )
    rel2, audit2 = generalize_to_k(two, ladders={"zip": []}, k=3)
    assert audit2["suppressed_rows"] == 2
    got = sorted(map(tuple, rel2.collect()))
    assert got == [("1", "c"), ("1", "d"), ("1", "e")]
    s = k_anonymity_summary(rel2, quasi_cols=["zip"], k=3).collect()[0]
    assert s["n_violating_groups"] == 0
