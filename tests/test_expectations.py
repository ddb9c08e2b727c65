"""Declarative data-quality expectations (operators/expectations.py) —
hand-built tables with known violation counts for every check kind, plus
the TPC-H relationship audit on the real testdata (r10 registry
candidate: the report surface is all-BIGINT/VARCHAR/BOOLEAN by design)."""

from __future__ import annotations

from briefly_spark.operators.expectations import (
    accepted,
    expectation_report,
    fk,
    in_range,
    not_null,
    unique,
)


def _report(spark, tables, checks):
    return {
        (r.table, r.check): (r.n_rows, r.n_violations, r.passed)
        for r in expectation_report(spark, tables, checks).collect()
    }


def test_every_check_kind_counts_violations_exactly(spark):
    t = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (2, "c", -5),     # dup id; out-of-range value
            (None, "d", 200), # NULL id (unique skips, not_null counts); > hi
            (5, "zz", None),  # unaccepted category; NULL value not in_range
        ],
        schema="id LONG, cat STRING, val LONG",
    )
    parent = spark.createDataFrame([("a",), ("b",), ("c",)], schema="cat STRING")
    got = _report(
        spark,
        {"t": t, "p": parent},
        [
            unique("t", "id"),
            not_null("t", "id"),
            in_range("t", "val", 0, 100),
            accepted("t", "cat", "a", "b", "c", "d"),
            fk("t", "cat", "p", "cat"),
        ],
    )
    # unique: present keys {1,2,2,5} -> 4 rows, 3 distinct -> 1 violation
    assert got[("t", "unique(id)")] == (4, 1, False)
    assert got[("t", "not_null(id)")] == (5, 1, False)
    # in_range: -5 and 200 out; NULL val not counted
    assert got[("t", "in_range(val, 0, 100)")] == (5, 2, False)
    # accepted: 'zz' only
    assert got[("t", "accepted(cat, ['a', 'b', 'c', 'd'])")] == (5, 1, False)
    # fk: 'd' and 'zz' missing from parent
    assert got[("t", "fk(cat -> p.cat)")] == (5, 2, False)


def test_clean_table_passes_everything(spark):
    t = spark.createDataFrame(
        [(1, "a"), (2, "b")], schema="id LONG, cat STRING"
    )
    p = spark.createDataFrame([("a",), ("b",)], schema="cat STRING")
    got = _report(
        spark,
        {"t": t, "p": p},
        [unique("t", "id"), not_null("t", "cat"), fk("t", "cat", "p", "cat"),
         in_range("t", "id", 1, 2), accepted("t", "cat", "a", "b")],
    )
    assert all(v == (2, 0, True) for v in got.values()), got


def test_null_fk_follows_sql_semantics(spark):
    # NULL FKs are not violations (SQL FK semantics) and drop from n_rows
    t = spark.createDataFrame([(1, None), (2, "a")], schema="id LONG, cat STRING")
    p = spark.createDataFrame([("a",)], schema="cat STRING")
    got = _report(spark, {"t": t, "p": p}, [fk("t", "cat", "p", "cat")])
    assert got[("t", "fk(cat -> p.cat)")] == (1, 0, True)


def test_composite_key_uniqueness(spark):
    t = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2)], schema="a LONG, b LONG"
    )
    got = _report(spark, {"t": t}, [unique("t", "a", "b")])
    assert got[("t", "unique(a, b)")] == (3, 1, False)


def test_empty_checks_yield_empty_report(spark):
    # ADVICE r09: no IndexError — an empty, correctly-typed report
    t = spark.createDataFrame([(1,)], schema="id LONG")
    rep = expectation_report(spark, {"t": t}, [])
    assert rep.columns == ["table", "check", "n_rows", "n_violations", "passed"]
    assert rep.count() == 0


def test_unregistered_table_raises_with_name(spark):
    import pytest

    t = spark.createDataFrame([(1,)], schema="id LONG")
    with pytest.raises(ValueError, match="ghost"):
        expectation_report(spark, {"t": t}, [unique("ghost", "id")])
    with pytest.raises(ValueError, match="nowhere"):
        expectation_report(spark, {"t": t}, [fk("t", "id", "nowhere", "id")])


def test_fk_broadcast_is_caller_gated(spark):
    """ADVICE r09: the broadcast hint follows the caller's dim=True
    assertion only.  With the auto-broadcast thresholds disabled, a
    dim=True parent still broadcasts (explicit hint) while the default
    goes through a shuffled join (AQE's call at real scale)."""
    child = spark.createDataFrame([(i, i % 7) for i in range(100)], "id LONG, k LONG")
    parent = spark.createDataFrame([(i,) for i in range(7)], "k LONG")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        tabs = {"c": child, "p": parent}

        def plan(check):
            df = expectation_report(spark, tabs, [check])
            df.collect()
            return df._jdf.queryExecution().executedPlan().toString()

        assert "BroadcastHashJoin" in plan(fk("c", "k", "p", "k", dim=True))
        assert "BroadcastHashJoin" not in plan(fk("c", "k", "p", "k"))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_conditional_checks_share_one_table_scan(spark, sf_dir):
    """The docstring's 'ONE aggregate pass per table' claim, pinned
    against the executed plan: three conditional checks on lineitem must
    produce exactly one parquet scan of it (ADVICE r09 — the old
    union-of-selects re-planned the agg once per check)."""
    from briefly_spark.catalog import load_table

    tables = {"lineitem": load_table(spark, sf_dir, "lineitem")}
    rep = expectation_report(
        spark,
        tables,
        [
            not_null("lineitem", "l_orderkey"),
            in_range("lineitem", "l_discount", 0.0, 0.11),
            accepted("lineitem", "l_returnflag", "A", "N", "R"),
        ],
    )
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # AQE echoes the pre-adaptive plan after "== Initial Plan ==" — count
    # scans in the final plan only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, plan


def test_tpch_relationships_audited_on_testdata(spark, sf_dir):
    """The real audit a lake would run: dimension/fact keys and every FK
    hold on the generated testdata — AND the audit catches the one
    integrity property the synthetic generator does NOT maintain:
    lineitem linenumbers are random, so (l_orderkey, l_linenumber) is NOT
    a key there (1401 duplicate pairs at sf0.001 — verified against
    DuckDB).  A report that only ever says 'passed' proves nothing; this
    pins a true red next to the true greens."""
    from briefly_spark.catalog import load_table

    tables = {
        n: load_table(spark, sf_dir, n)
        for n in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    }
    got = _report(
        spark,
        tables,
        [
            unique("region", "r_regionkey"),
            unique("nation", "n_nationkey"),
            unique("customer", "c_custkey"),
            unique("orders", "o_orderkey"),
            fk("nation", "n_regionkey", "region", "r_regionkey"),
            fk("customer", "c_nationkey", "nation", "n_nationkey"),
            fk("orders", "o_custkey", "customer", "c_custkey"),
            fk("lineitem", "l_orderkey", "orders", "o_orderkey"),
            fk("supplier", "s_nationkey", "nation", "n_nationkey"),
            not_null("orders", "o_orderdate"),
            in_range("lineitem", "l_discount", 0.0, 0.11),
        ],
    )
    assert got and all(passed for (_, _, passed) in got.values()), {
        k: v for k, v in got.items() if not v[2]
    }
    # the catch: the generator does NOT maintain TPC-H line numbering
    dup = _report(
        spark, tables, [unique("lineitem", "l_orderkey", "l_linenumber")]
    )
    n_rows, n_viol, passed = dup[("lineitem", "unique(l_orderkey, l_linenumber)")]
    assert not passed and n_viol > 0 and n_rows > n_viol


def _hist_rows(spark, rows):
    return spark.createDataFrame(
        rows, "run_id LONG, table STRING, check STRING, n_rows LONG, n_violations LONG"
    )


def test_history_merge_is_replay_idempotent(spark, tmp_path):
    """The metrics history keys on run_id alone (group-replace): replaying
    a run's merge — even after the audit was re-configured to emit FEWER
    checks — leaves exactly that run's latest rows, never stale ones."""
    from briefly_spark.operators.expectations import expectation_history_merge
    from briefly_spark.storage import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = spark.createDataFrame([(1, "a"), (2, None)], "id LONG, cat STRING")
    rep = expectation_report(
        spark, {"t": t}, [unique("t", "id"), not_null("t", "cat")]
    )
    expectation_history_merge(wh, rep, "exp_history", run_id=1)
    expectation_history_merge(wh, rep, "exp_history", run_id=2)
    assert wh.read("exp_history").count() == 4
    # replay run 2 with a SMALLER check set: its old rows must vanish
    rep2 = expectation_report(spark, {"t": t}, [unique("t", "id")])
    expectation_history_merge(wh, rep2, "exp_history", run_id=2)
    got = wh.read("exp_history").collect()
    assert len(got) == 3
    assert sum(1 for r in got if r["run_id"] == 2) == 1


def test_anomaly_fires_on_spike_and_respects_history_floor(spark):
    from briefly_spark.operators.expectations import expectation_anomalies

    # stable check: ~1% violation rate over runs 1-4, spike to 30% in run 5
    rows = []
    for run in (1, 2, 3, 4):
        rows.append((run, "t", "not_null(x)", 1000, 10))
        rows.append((run, "t", "unique(k)", 1000, 0))
    rows.append((5, "t", "not_null(x)", 1000, 300))  # spike
    rows.append((5, "t", "unique(k)", 1000, 0))      # still clean
    rows.append((5, "t", "accepted(y, ['a'])", 1000, 500))  # first sighting
    got = {
        (r["table"], r["check"]): r
        for r in expectation_anomalies(_hist_rows(spark, rows)).collect()
    }
    spike = got[("t", "not_null(x)")]
    assert spike["anomaly"] and spike["enough_history"]
    assert spike["median_rate_fp"] == 100 and spike["latest_rate_fp"] == 3000
    assert spike["delta_fp"] == 2900 and spike["latest_run"] == 5
    quiet = got[("t", "unique(k)")]
    assert not quiet["anomaly"] and quiet["delta_fp"] == 0
    # a brand-new check never fires, whatever its rate
    fresh = got[("t", "accepted(y, ['a'])")]
    assert not fresh["anomaly"] and not fresh["enough_history"]
    assert fresh["n_prior"] == 0 and fresh["latest_rate_fp"] == 5000


def test_anomaly_two_sided_and_threshold(spark):
    from briefly_spark.operators.expectations import expectation_anomalies

    # an IMPROVEMENT beyond threshold also flags (silent fix = schema
    # change upstream — worth a look), and sub-threshold drift stays quiet
    rows = [(r, "t", "c", 1000, 200) for r in (1, 2, 3)] + [(4, "t", "c", 1000, 5)]
    rows += [(r, "t", "d", 1000, 100) for r in (1, 2, 3)] + [(4, "t", "d", 1000, 105)]
    got = {
        r["check"]: r for r in expectation_anomalies(_hist_rows(spark, rows)).collect()
    }
    assert got["c"]["anomaly"] and got["c"]["delta_fp"] == -1950
    assert not got["d"]["anomaly"] and got["d"]["delta_fp"] == 50


def test_anomaly_sql_mirror_matches_spark(spark):
    """DuckDB mirror of the anomaly surface (exact interpolating median,
    even- and odd-count baselines, fresh checks, empty tables) value-
    matches the Spark operator row-for-row."""
    import duckdb

    from briefly_spark.operators.expectations import (
        expectation_anomalies,
        sql_expectation_anomalies,
    )

    rows = []
    for run in (1, 2, 3, 4):                       # odd prior count (3)
        rows.append((run, "t", "a", 1000, 10 * run))
    for run in (1, 2, 3):                          # even prior count (2)
        rows.append((run, "t", "b", 500, 7 * run))
    rows.append((5, "t", "fresh", 100, 50))        # no history
    rows.append((1, "e", "z", 0, 0))               # empty table
    rows.append((2, "e", "z", 0, 0))
    h = _hist_rows(spark, rows)
    cols = ["table", "check", "latest_run", "n_prior", "median_rate_fp",
            "latest_rate_fp", "delta_fp", "enough_history", "anomaly"]
    got = {tuple(r[c] for c in cols) for r in expectation_anomalies(h).collect()}
    con = duckdb.connect()
    con.register("hist", h.toPandas())
    want = set(map(tuple, con.execute(sql_expectation_anomalies("hist")).fetchall()))
    assert got == want
    assert len(got) == 4


def test_anomaly_empty_table_rate_is_zero(spark):
    from briefly_spark.operators.expectations import expectation_anomalies

    rows = [(r, "t", "c", 0, 0) for r in (1, 2, 3, 4)]
    [got] = expectation_anomalies(_hist_rows(spark, rows)).collect()
    assert got["latest_rate_fp"] == 0 and not got["anomaly"]


def test_column_profiles_hand_computed(spark):
    from briefly_spark.operators.expectations import column_profiles

    t = spark.createDataFrame(
        [(1.5, 10), (-2.25, 10), (None, 20), (0.0, None)],
        schema="x DOUBLE, y LONG",
    )
    got = {r["column"]: r for r in column_profiles(t, ["x", "y"]).collect()}
    x = got["x"]
    # floor fixed-point: floor(1.5e4) + floor(-2.25e4) + floor(0) = -7500
    # mean_fp = -7500 div 3 = -2500 (both engines truncate toward zero)
    assert (x["n_rows"], x["n_null"], x["n_distinct"]) == (4, 1, 3)
    assert (x["min_v"], x["max_v"], x["mean_fp"]) == (-2.25, 1.5, -2500)
    y = got["y"]
    assert (y["n_rows"], y["n_null"], y["n_distinct"]) == (4, 1, 2)
    assert (y["min_v"], y["max_v"], y["mean_fp"]) == (10.0, 20.0, 133333)
    # empty frame: counts zero, value stats NULL
    e = spark.createDataFrame([], "x DOUBLE")
    [p] = column_profiles(e, ["x"]).collect()
    assert (p["n_rows"], p["n_null"], p["n_distinct"]) == (0, 0, 0)
    assert p["min_v"] is None and p["max_v"] is None and p["mean_fp"] is None


def test_column_profiles_single_scan_plan(spark, sf_dir):
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.expectations import column_profiles

    prof = column_profiles(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    prof.collect()
    plan = prof._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, plan
    assert "Expand" in final  # the documented multi-distinct cost, one pass


def test_column_profiles_sql_mirror_on_testdata(spark, sf_dir):
    import duckdb

    from briefly_spark.catalog import load_table, table_path
    from briefly_spark.operators.expectations import (
        column_profiles,
        sql_column_profiles,
    )

    fields = ["l_quantity", "l_discount", "l_partkey"]
    got = {
        tuple(r) for r in column_profiles(
            load_table(spark, sf_dir, "lineitem"), fields
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{table_path(sf_dir, 'lineitem')}'"
    )
    want = set(map(tuple, con.execute(sql_column_profiles("lineitem", fields)).fetchall()))
    assert got == want


def test_histogram_drift_zero_on_identical_snapshots(spark):
    from briefly_spark.operators.expectations import histogram_drift

    t = spark.createDataFrame([(float(v),) for v in (1, 2, 2, 5, 9)], "x DOUBLE")
    drift = histogram_drift(t, t, "x", bucket_width=2.0)
    rows = drift.collect()
    assert rows and all(r["term_fp"] == 0 for r in rows)


def test_histogram_drift_matches_pure_python(spark):
    """PSI terms against a det_ln_py replication of the exact op order —
    the same three-engine pin the LM surfaces use."""
    import math

    from briefly_spark.numerics import det_ln_py
    from briefly_spark.operators.expectations import histogram_drift

    va = [1.0, 1.5, 2.0, 5.0, 5.5, 9.0, None]
    vb = [1.0, 5.0, 5.2, 5.4, 5.6, 9.0, 9.5]
    a = spark.createDataFrame([(v,) for v in va], "x DOUBLE")
    b = spark.createDataFrame([(v,) for v in vb], "x DOUBLE")
    got = {
        r["bucket"]: (r["n_a"], r["n_b"], r["term_fp"])
        for r in histogram_drift(a, b, "x", bucket_width=2.0).collect()
    }
    ha: dict[int, int] = {}
    hb: dict[int, int] = {}
    for v in va:
        if v is not None:
            ha[math.floor(v / 2.0)] = ha.get(math.floor(v / 2.0), 0) + 1
    for v in vb:
        if v is not None:
            hb[math.floor(v / 2.0)] = hb.get(math.floor(v / 2.0), 0) + 1
    buckets = set(ha) | set(hb)
    ta, tb, k = sum(ha.values()), sum(hb.values()), len(buckets)
    want = {}
    for bu in buckets:
        a1, b1 = ha.get(bu, 0) + 1, hb.get(bu, 0) + 1
        ta1, tb1 = ta + k, tb + k
        term = ((float(a1) / float(ta1)) - (float(b1) / float(tb1))) * (
            det_ln_py(a1 * tb1) - det_ln_py(b1 * ta1)
        ) * 1000000.0
        want[bu] = (ha.get(bu, 0), hb.get(bu, 0), math.floor(term))
    assert got == want
    psi = sum(t for (_, _, t) in got.values())
    assert psi > 0  # the distributions really differ


def test_histogram_drift_sql_mirror_on_testdata(spark, sf_dir):
    import duckdb

    from briefly_spark.catalog import load_table, table_path
    from briefly_spark.operators.expectations import (
        histogram_drift,
        sql_histogram_drift,
    )

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    got = {
        tuple(r)
        for r in histogram_drift(a, b, "l_extendedprice", bucket_width=5000.0).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM '{table_path(sf_dir, 'lineitem')}'"
    )
    con.execute("CREATE VIEW a AS SELECT * FROM li WHERE l_orderkey % 2 = 0")
    con.execute("CREATE VIEW b AS SELECT * FROM li WHERE l_orderkey % 2 = 1")
    want = set(
        map(
            tuple,
            con.execute(
                sql_histogram_drift("a", "b", "l_extendedprice", bucket_width=5000.0)
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 3


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _rows = st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),      # id (dup/NULL-heavy)
            st.one_of(st.none(), st.sampled_from("abcz")),  # cat
            st.one_of(st.none(), st.integers(-10, 110)),  # val
        ),
        min_size=0,
        max_size=25,
    )
    _parents = st.sets(st.sampled_from("abc"), min_size=0, max_size=3)

    @given(_rows, _parents)
    @settings(max_examples=10, deadline=None)
    def test_report_matches_bruteforce_on_random_tables(rows, parents):
        """Every check kind's NULL/violation semantics against an
        independent pure-Python counter on random NULL- and
        duplicate-heavy tables (the hand-built cases pin known shapes;
        this sweeps the semantics space, empty tables included)."""
        from briefly_spark.session import get_spark

        spark = get_spark("exp-property")
        t = spark.createDataFrame(rows, schema="id LONG, cat STRING, val LONG")
        p = spark.createDataFrame([(x,) for x in sorted(parents)], "cat STRING")
        got = _report(
            spark,
            {"t": t, "p": p},
            [
                unique("t", "id"),
                unique("t", "id", "cat"),
                not_null("t", "id"),
                in_range("t", "val", 0, 100),
                accepted("t", "cat", "a", "b"),
                fk("t", "cat", "p", "cat"),
                fk("t", "cat", "p", "cat", dim=True),
            ],
        )
        n = len(rows)
        keyed = [r for r in rows if r[0] is not None]
        want_unique = (len(keyed), len(keyed) - len({r[0] for r in keyed}))
        keyed2 = [r for r in rows if r[0] is not None and r[1] is not None]
        want_unique2 = (len(keyed2), len(keyed2) - len({(r[0], r[1]) for r in keyed2}))
        want_nn = (n, sum(1 for r in rows if r[0] is None))
        want_ir = (n, sum(1 for r in rows if r[2] is not None and not 0 <= r[2] <= 100))
        want_acc = (n, sum(1 for r in rows if r[1] not in ("a", "b")))
        fkrows = [r for r in rows if r[1] is not None]
        want_fk = (len(fkrows), sum(1 for r in fkrows if r[1] not in parents))
        for key, want in {
            ("t", "unique(id)"): want_unique,
            ("t", "unique(id, cat)"): want_unique2,
            ("t", "not_null(id)"): want_nn,
            ("t", "in_range(val, 0, 100)"): want_ir,
            ("t", "accepted(cat, ['a', 'b'])"): want_acc,
            ("t", "fk(cat -> p.cat)"): want_fk,
        }.items():
            nr, nv, passed = got[key]
            assert (nr, nv) == want, (key, got[key], want)
            assert passed == (nv == 0)

except ImportError:  # pragma: no cover - hypothesis always shipped here
    pass


def test_sql_mirror_matches_spark_report_on_testdata(spark, sf_dir):
    """The DuckDB mirror (the r10 registry oracle) must value-match the
    Spark report on the real tables — the self-hosted oracle gate, run
    here without waiting for a driver window slot."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path
    from briefly_spark.operators.expectations import sql_expectation_report

    names = ("region", "nation", "customer", "orders", "lineitem", "supplier")
    tables = {n: load_table(spark, sf_dir, n) for n in names}
    checks = [
        unique("orders", "o_orderkey"),
        unique("lineitem", "l_orderkey", "l_linenumber"),  # the true red
        not_null("orders", "o_orderdate"),
        in_range("lineitem", "l_discount", 0.0, 0.11),
        accepted("orders", "o_orderstatus", "F", "O", "P"),
        fk("lineitem", "l_orderkey", "orders", "o_orderkey"),
        fk("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    got = {
        (r.table, r.check): (r.n_rows, r.n_violations, r.passed)
        for r in expectation_report(spark, tables, checks).collect()
    }
    con = duckdb.connect()
    for n in names:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{table_path(sf_dir, n)}'")
    want = {
        (t, c): (nr, nv, p)
        for t, c, nr, nv, p in con.execute(sql_expectation_report(checks)).fetchall()
    }
    assert got == want
    assert not want[("lineitem", "unique(l_orderkey, l_linenumber)")][2]


def test_sql_mirror_matches_spark_report_on_empty_table(spark):
    """Regression pin (review r12, landed with q147's r13 graft): on an
    EMPTY table the conditional arms' SQL sum() is NULL — without the
    coalesce the mirror reported NULL violations where the Spark report
    coalesces to 0/passed=true.  Both surfaces must agree: zero rows,
    zero violations, passed."""
    import duckdb

    from briefly_spark.operators.expectations import sql_expectation_report

    t = spark.createDataFrame([], "id LONG, cat STRING, val DOUBLE")
    checks = [
        not_null("t", "id"),
        in_range("t", "val", 0.0, 1.0),
        accepted("t", "cat", "a", "b"),
        unique("t", "id"),
    ]
    got = sorted(
        tuple(r) for r in expectation_report(spark, {"t": t}, checks).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, val DOUBLE)")
    want = sorted(
        tuple(r) for r in con.execute(sql_expectation_report(checks)).fetchall()
    )
    assert got == want
    assert all(nv == 0 and passed for _, _, _, nv, passed in got)


def test_column_profiles_rejects_non_numeric_and_unknown(spark):
    import pytest

    from briefly_spark.operators.expectations import column_profiles

    t = spark.createDataFrame([(1, "a")], "id LONG, name STRING")
    with pytest.raises(ValueError, match="non-numeric"):
        column_profiles(t, ["name"])
    with pytest.raises(ValueError, match="unknown column"):
        column_profiles(t, ["ghost"])


# -- review r12 closures ------------------------------------------------------
def test_unknown_check_kind_refused_on_both_surfaces(spark):
    """An unrecognized kind must refuse loudly — the arm loops would
    silently skip it (an audit reading absence as 'passed'), and the SQL
    mirror already raised for the same input, so the surfaces disagreed."""
    import pytest

    from briefly_spark.operators.expectations import (
        Check,
        expectation_report,
        sql_expectation_report,
    )

    bad = Check("notnull", "t", ("id",))
    df = spark.createDataFrame([(1,)], "id LONG")
    with pytest.raises(ValueError, match="unknown kind"):
        expectation_report(spark, {"t": df}, [bad])
    with pytest.raises(ValueError, match="unknown"):
        sql_expectation_report([bad])


def test_drift_ln_is_per_operand_no_bigint_product(spark):
    """ln(a1·tb1) needed the BIGINT product, which overflows int64 once
    snapshots reach ~1e10 rows — the staged form must take ln per operand
    on BOTH surfaces (structural pin on the generated SQL; value parity
    is covered by the mirror tests)."""
    from briefly_spark.operators.expectations import sql_histogram_drift

    sql = sql_histogram_drift("a", "b", "v", bucket_width=10.0)
    assert "a1 * tb1" not in sql and "b1 * ta1" not in sql
    for out in ("__ln_a1", "__ln_tb1", "__ln_b1", "__ln_ta1"):
        assert out in sql


def test_profiles_mirror_sums_fixed_point_exactly(spark):
    """The mirror must sum floor(c·10000) as BIGINT, not DOUBLE — float
    partial sums past 2^53 rounded, so mean_fp disagreed with Spark's
    exact LONG sum (review r12, reproduced with ~9e11-valued doubles)."""
    import duckdb
    import pandas as pd

    from briefly_spark.operators.expectations import (
        column_profiles,
        sql_column_profiles,
    )

    rows = [(9.007199258696e11 + i,) for i in range(1000)]
    df = spark.createDataFrame(rows, "c DOUBLE")
    got = sorted(map(tuple, column_profiles(df, ["c"]).collect()))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["c"]))
    want = sorted(map(tuple, con.execute(sql_column_profiles("t", ["c"])).fetchall()))
    assert got == want  # bit-exact incl. mean_fp


def test_report_runs_equals_per_run_reports(spark, sf_dir):
    """r16 fusion pin (guide §2.1): the one-pass (run × check) grid must
    equal the per-run expectation_report over the filtered slices."""
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table
    from briefly_spark.operators.expectations import (
        accepted,
        expectation_report,
        expectation_report_runs,
        in_range,
        not_null,
    )

    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        in_range("t", "l_discount", 0.0, 0.05),
        accepted("t", "l_returnflag", "A", "N"),
        not_null("t", "l_shipdate"),
    ]
    preds = {r: f"l_orderkey % 7 < {2 * (r + 1)}" for r in range(4)}
    fused = {
        (r["run_id"], r["check"]): (r["n_rows"], r["n_violations"])
        for r in expectation_report_runs(
            li, {k: F.expr(p) for k, p in preds.items()}, checks
        ).collect()
    }
    for run, p in preds.items():
        rep = expectation_report(spark, {"t": li.filter(p)}, checks)
        for r in rep.collect():
            assert fused[(run, r["check"])] == (r["n_rows"], r["n_violations"]), (
                run, r["check"],
            )
    # non-conditional kinds refuse loudly
    import pytest

    from briefly_spark.operators.expectations import unique

    with pytest.raises(ValueError, match="unique"):
        expectation_report_runs(li, {0: F.lit(True)}, [unique("t", "l_orderkey")])
