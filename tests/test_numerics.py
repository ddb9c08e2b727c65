"""Fixed-point determinism: the same aggregate under different partitionings
produces bit-identical results (the property the DuckDB oracle relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.numerics import fixed_avg, fixed_sum, trunc4


def test_fixed_sum_partition_invariant(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 0.123456789).alias("x")
    )
    a = df.repartition(1).groupBy("g").agg(fixed_sum("x").alias("s")).collect()
    b = df.repartition(17).groupBy("g").agg(fixed_sum("x").alias("s")).collect()
    assert sorted((r.g, r.s) for r in a) == sorted((r.g, r.s) for r in b)


def test_fixed_avg_and_trunc4(spark):
    df = spark.createDataFrame([(1.005,), (2.115,), (3.0,)], ["x"])
    row = df.agg(
        fixed_sum("x").alias("s"), fixed_avg("x").alias("a"), F.min(trunc4(F.col("x"))).alias("t")
    ).collect()[0]
    assert abs(row.s - 6.11) < 1e-9  # floor(100.5)=100, floor(211.5)=211, 300
    assert abs(row.a - 6.11 / 3) < 1e-9
    assert row.t == 1.0049  # 1.005 is 1.00499…; trunc4 floors deterministically


def test_det_ln_three_engine_bit_agreement(spark):
    """det_ln_sql must produce BIT-identical doubles in Spark, DuckDB and
    CPython — the property q46/q47/q48's hashed fixed-point scores rest on.
    Sweep powers of two (exact cases), their neighbors (worst-case mantissa)
    and a seeded random spread up to 2^53."""
    import random
    import struct

    import duckdb

    from briefly_spark.numerics import det_ln_py, det_ln_sql

    random.seed(4848)
    ns = sorted(
        set(
            list(range(1, 600))
            + [2**k + d for k in range(9, 53) for d in (-1, 0, 1)]
            + [random.randrange(1, 2**53) for _ in range(500)]
        )
    )
    pack = lambda x: struct.pack("<d", x)  # noqa: E731

    sdf = spark.createDataFrame([(n,) for n in ns], "n long")
    got_spark = {
        r["n"]: r["v"]
        for r in sdf.select("n", F.expr(det_ln_sql("n", "spark")).alias("v")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in ns])
    got_duck = dict(
        con.execute(f"SELECT n, {det_ln_sql('n', 'duckdb')} FROM t").fetchall()
    )

    import math

    for n in ns:
        py = det_ln_py(n)
        assert pack(got_spark[n]) == pack(py), f"spark!=py at n={n}"
        assert pack(got_duck[n]) == pack(py), f"duckdb!=py at n={n}"
        assert abs(py - math.log(n)) < 5e-9, f"accuracy at n={n}"


def test_det_ln_items_matches_inline_both_engines(spark):
    """The staged lateral-alias form (det_ln_items — what every production
    score uses) must be bit-identical to the inline det_ln_sql reference in
    BOTH engines: staging computes the same subexpressions once each, in
    the same order, so no rounding can differ."""
    import struct

    import duckdb

    from briefly_spark.numerics import det_ln_items, det_ln_py

    ns = list(range(1, 300)) + [2**k + d for k in range(9, 53) for d in (-1, 0, 1)]
    pack = lambda x: struct.pack("<d", x)  # noqa: E731

    sdf = spark.createDataFrame([(n,) for n in ns], "n long")
    got_spark = {
        r["n"]: r["v"]
        for r in sdf.selectExpr("n", *det_ln_items("n", "v", "spark")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in ns])
    items = ", ".join(det_ln_items("n", "v", "duckdb"))
    got_duck = dict(
        (r[0], r[-1]) for r in con.execute(f"SELECT n, {items} FROM t").fetchall()
    )

    for n in ns:
        py = det_ln_py(n)
        assert pack(got_spark[n]) == pack(py), f"spark staged != py at n={n}"
        assert pack(got_duck[n]) == pack(py), f"duckdb staged != py at n={n}"


def test_det_ln_edge_values():
    import math

    from briefly_spark.numerics import det_ln_py

    assert det_ln_py(1) == 0.0
    assert abs(det_ln_py(2) - math.log(2)) < 1e-12
    import pytest

    with pytest.raises(ValueError):
        det_ln_py(0)
