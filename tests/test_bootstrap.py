"""X141 deterministic Poisson bootstrap — threshold constants vs scipy-
free CDF math, hand-checked weights, the DuckDB mirror on real
testdata, replica-mean statistical sanity, interval extraction, and
determinism across re-runs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from briefly_spark.operators.bootstrap import (
    POISSON16,
    bootstrap_interval,
    bootstrap_means,
    sql_bootstrap_means,
)


def test_threshold_constants_are_the_poisson1_cdf():
    cdf, term = [], math.exp(-1.0)
    acc = term
    for k in range(8):
        cdf.append(math.floor(acc * 65536))
        term = term / (k + 1)
        acc += term
    assert tuple(cdf) == POISSON16
    # discretized mean stays within 0.01% of 1 (documented bias bound)
    probs = []
    prev = 0
    for t in POISSON16:
        probs.append((t - prev) / 65536.0)
        prev = t
    probs.append((65536 - prev) / 65536.0)  # w = 8 tail
    mean = sum(k * p for k, p in enumerate(probs))
    assert abs(mean - 1.0) < 1e-3


def test_means_match_duckdb_mirror_on_testdata(spark, sf_dir):
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    docs = load_table(spark, sf_dir, "documents")
    kw = dict(group_cols=["source"], value_col="n_chars", id_col="doc_id",
              b=16, seed=7)
    got = sorted(
        map(tuple, bootstrap_means(docs, **kw).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = sorted(map(tuple, con.execute(
        sql_bootstrap_means("documents", **kw)).fetchall()))
    assert got == want
    assert len(got) > 16  # groups x replicas


def test_replica_means_bracket_the_point_estimate(spark, sf_dir):
    from briefly_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    reps = bootstrap_means(
        docs, group_cols=["source"], value_col="n_chars", id_col="doc_id",
        b=32, seed=1,
    )
    point = {
        r["source"]: r["m"]
        for r in docs.groupBy("source")
        .agg((F.sum("n_chars") / F.count(F.lit(1))).alias("m")).collect()
    }
    stats = {
        r["source"]: (r["lo"], r["hi"], r["n"])
        for r in reps.groupBy("source").agg(
            F.min("mean_fp").alias("lo"), F.max("mean_fp").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    for s, (lo, hi, n) in stats.items():
        assert n == 32  # no degenerate replicas at these group sizes
        assert lo <= point[s] * 10_000 <= hi  # replicas bracket the estimate
        assert lo < hi  # genuine spread
    # determinism: same seed -> byte-identical replica frame
    again = bootstrap_means(
        docs, group_cols=["source"], value_col="n_chars", id_col="doc_id",
        b=32, seed=1,
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, reps.collect()))


def test_interval_extraction_exact_order_statistics(spark):
    rows = [("g", r, 10, (r + 1) * 100) for r in range(10)]  # means 100..1000
    reps = spark.createDataFrame(
        rows, "g STRING, rep LONG, n_eff LONG, mean_fp LONG"
    )
    iv = bootstrap_interval(reps, group_cols=["g"], lo_rank=2, hi_rank=9
                            ).collect()[0]
    assert (iv["lo_fp"], iv["hi_fp"], iv["n_marks"]) == (200, 900, 2)


def test_value_col_dtype_is_validated_and_wide_sums_stay_exact(spark):
    """ADVICE r11 #3: non-integer value columns are refused (the two
    engines' rounding only agrees on integers), and a weighted sum big
    enough that wv*scale would wrap a BIGINT stays exact — the Spark
    side computes the intermediate in DECIMAL(38,0), the mirror in
    HUGEINT, so both return the true quotient instead of Spark silently
    wrapping while DuckDB raises."""
    import pytest

    from briefly_spark.operators.bootstrap import bootstrap_means

    bad = spark.createDataFrame([("a", 1.5, 1)], "g STRING, v DOUBLE, id LONG")
    with pytest.raises(ValueError, match="integer column"):
        bootstrap_means(bad, group_cols=["g"], value_col="v", id_col="id")

    # 40 rows of 9.2e14 — sum(w*v)*10000 ~ 3.7e20 overflows 2^63 ~ 9.2e18,
    # while the quotient v*scale = 9.2e18 still fits the BIGINT surface
    big = spark.createDataFrame(
        [("a", 920_000_000_000_000, i) for i in range(40)],
        "g STRING, v LONG, id LONG",
    )
    reps = bootstrap_means(
        big, group_cols=["g"], value_col="v", id_col="id", b=4, seed=7
    ).collect()
    assert reps  # non-degenerate
    for r in reps:
        # the mean of a constant column is exactly the constant:
        # (n_eff·v·scale) DIV n_eff = v·scale — any other value means the
        # intermediate wrapped
        assert r["mean_fp"] == 920_000_000_000_000 * 10_000
