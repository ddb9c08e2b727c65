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
