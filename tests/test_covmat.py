"""X146 exact pairwise covariance/correlation sufficient statistics —
Fraction-arithmetic reference, pairwise-complete NULL policy, the
DuckDB HUGEINT mirror on synthetic and real (quantized lineitem) data,
registry fold ≡ one-shot ≡ compaction, the integer contract, and the
one-pass corpus plan."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from briefly_spark.operators.covmat import (
    pairwise_batch_sums,
    pairwise_moments,
    pairwise_registry_compact,
    pairwise_registry_moments,
    pairwise_sums,
    sql_pairwise_moments,
)


def _rows(seed: int, n: int = 800):
    random.seed(seed)
    rows = []
    for _ in range(n):
        g = random.choice(["g1", "g2"])
        x = random.randint(-1000, 1000) if random.random() > 0.1 else None
        y = (x or 0) * 3 + random.randint(-50, 50) if random.random() > 0.1 else None
        z = random.randint(0, 10**9) if random.random() > 0.1 else None
        rows.append((g, x, y, z))
    # a group where one pair is never complete (must vanish, not zero-fill)
    rows += [("g3", None, 5, 1), ("g3", 4, None, 2)]
    return rows


def _moments(spark, rows):
    df = spark.createDataFrame(rows, "g STRING, x LONG, y LONG, z LONG")
    return pairwise_moments(
        pairwise_sums(df, group_cols=["g"], metric_cols=["x", "y", "z"]),
        group_cols=["g"],
    )


def test_fraction_reference_and_pairwise_null_policy(spark):
    rows = _rows(seed=3)
    got = {
        (r["g"], r["m_a"], r["m_b"]): (int(r["n"]), int(r["cov_num"]),
                                       int(r["var_a_num"]), int(r["var_b_num"]))
        for r in _moments(spark, rows).collect()
    }
    # independent exact reference, pairwise-complete
    for g in ("g1", "g2"):
        for a_i, b_i, a_n, b_n in ((1, 2, "x", "y"), (1, 3, "x", "z"), (2, 3, "y", "z")):
            pts = [(r[a_i], r[b_i]) for r in rows
                   if r[0] == g and r[a_i] is not None and r[b_i] is not None]
            n = len(pts)
            sa, sb = sum(p[0] for p in pts), sum(p[1] for p in pts)
            saa = sum(p[0] ** 2 for p in pts)
            sbb = sum(p[1] ** 2 for p in pts)
            sab = sum(p[0] * p[1] for p in pts)
            assert got[(g, a_n, b_n)] == (
                n, n * sab - sa * sb, n * saa - sa * sa, n * sbb - sb * sb
            )
    # the engineered x~y correlation is high and exactly computable
    n, cov, va, vb = got[("g1", "x", "y")]
    corr2 = Fraction(cov * cov, va * vb)
    assert Fraction(99, 100) < corr2 < 1
    # never-complete pair vanishes; the group's other pairs survive
    assert ("g3", "x", "y") not in got
    assert ("g3", "x", "z") in got and ("g3", "y", "z") in got


def test_duckdb_mirror_synthetic(spark):
    import duckdb
    import pandas as pd

    rows = _rows(seed=3)
    got = sorted(
        tuple(str(v) for v in r) for r in _moments(spark, rows).collect()
    )
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(rows, columns=["g", "x", "y", "z"]).astype(
            {c: "Int64" for c in "xyz"}
        ),
    )
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            sql_pairwise_moments("t", group_cols=["g"], metric_cols=["x", "y", "z"])
        ).fetchall()
    )
    assert got == want


def test_duckdb_mirror_on_real_lineitem(spark, sf_dir):
    """Quantized lineitem metrics (qty, price¢, discount%) per returnflag —
    HUGEINT mirror value-identical on real data."""
    import duckdb

    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table, table_path

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc"),
    )
    got = sorted(
        tuple(str(v) for v in r)
        for r in pairwise_moments(
            pairwise_sums(li, group_cols=["l_returnflag"],
                          metric_cols=["qty", "cents", "disc"]),
            group_cols=["l_returnflag"],
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW li AS SELECT l_returnflag, "
        f"CAST(floor(l_quantity) AS BIGINT) AS qty, "
        f"CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents, "
        f"CAST(floor(l_discount * 100) AS BIGINT) AS disc "
        f"FROM '{table_path(sf_dir, 'lineitem')}'"
    )
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            sql_pairwise_moments(
                "li", group_cols=["l_returnflag"], metric_cols=["qty", "cents", "disc"]
            )
        ).fetchall()
    )
    assert got == want
    assert len({r[0] for r in got}) == 3  # A/N/R — real multi-group surface


def test_registry_fold_equals_oneshot_and_compaction(spark):
    rows = _rows(seed=9, n=600)
    whole = _moments(spark, rows)
    oneshot = sorted(tuple(map(str, r)) for r in whole.collect())
    reg = None
    for b, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 602))):
        block = pairwise_batch_sums(
            spark.createDataFrame(rows[lo:hi], "g STRING, x LONG, y LONG, z LONG"),
            group_cols=["g"], metric_cols=["x", "y", "z"], batch_id=b,
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = sorted(
        tuple(map(str, r))
        for r in pairwise_registry_moments(reg, group_cols=["g"]).collect()
    )
    assert folded == oneshot  # bit-exact
    compact = pairwise_registry_compact(reg)
    assert {int(r["batch_id"]) for r in compact.select("batch_id").distinct().collect()} == {-1}
    assert sorted(
        tuple(map(str, r))
        for r in pairwise_registry_moments(compact, group_cols=["g"]).collect()
    ) == oneshot


def test_contracts(spark):
    df = spark.createDataFrame([("a", 1, 1.5)], "g STRING, x LONG, y DOUBLE")
    with pytest.raises(ValueError, match="integer"):
        pairwise_sums(df, group_cols=["g"], metric_cols=["x", "y"])
    with pytest.raises(ValueError, match="distinct metric"):
        pairwise_sums(df, group_cols=["g"], metric_cols=["x"])
    with pytest.raises(ValueError, match="distinct metric"):
        pairwise_sums(df, group_cols=["g"], metric_cols=["x", "x"])


def test_single_pass_plan(spark, sf_dir):
    """All pairs ride ONE map-side-combinable hash aggregation — one
    corpus exchange, no join, no window, no second scan."""
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc"),
    )
    out = pairwise_moments(
        pairwise_sums(li, group_cols=["l_returnflag"],
                      metric_cols=["qty", "cents", "disc"]),
        group_cols=["l_returnflag"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("FileScan") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct"):
        assert bad not in plan, plan


def test_ungrouped_mirror_and_separator_contract(spark):
    """group_cols=[]: the mirror's ungrouped aggregate must not emit a
    zero-filled row for a never-complete pair (HAVING pins it), and
    metric names containing the internal '__' separator are refused."""
    import duckdb
    import pandas as pd

    rows = [(None, 5, 1), (4, None, 2)]  # pair (x, y) never complete
    df = spark.createDataFrame(rows, "x LONG, y LONG, z LONG")
    got = sorted(
        tuple(str(v) for v in r)
        for r in pairwise_moments(
            pairwise_sums(df, group_cols=[], metric_cols=["x", "y", "z"]),
            group_cols=[],
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(rows, columns=["x", "y", "z"]).astype(
            {c: "Int64" for c in "xyz"})
    )
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            sql_pairwise_moments("t", group_cols=[], metric_cols=["x", "y", "z"])
        ).fetchall()
    )
    assert got == want
    assert all(r[0:2] != ("x", "y") for r in got)  # the empty pair vanished
    with pytest.raises(ValueError, match="__"):
        pairwise_sums(df.withColumnRenamed("x", "a__b"),
                      group_cols=[], metric_cols=["a__b", "y"])
