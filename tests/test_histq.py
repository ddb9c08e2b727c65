"""X142 mergeable log-bin histogram quantile registry — bin-math pins
against a pure-Python reference, the exact-rank bracket property, the
DuckDB mirror on real testdata, fold ≡ one-shot ≡ compaction ≡ stream,
replay idempotence, the integer-input contract, and the one-shuffle
corpus plan."""

from __future__ import annotations

import random

import pytest

from briefly_spark.operators.histq import (
    DEFAULT_PERCENTS,
    S_DEFAULT,
    group_quantiles,
    histq_batch_blocks,
    histq_registry_compact,
    histq_registry_quantiles,
    sql_group_quantiles,
)


# -- pure-Python reference of the bin math (the independent derivation) ------
def _idx(v: int, s: int = S_DEFAULT) -> int:
    m = 1 << s
    a = -v if v < 0 else v
    if a < m:
        i = a
    else:
        e = a.bit_length() - 1
        i = (e - s) * m + (a >> (e - s))
    return -1 - i if v < 0 else i


def _bounds(i: int, s: int = S_DEFAULT) -> tuple[int, int]:
    m = 1 << s
    neg = i < 0
    j = -1 - i if neg else i
    if j < m:
        lo = hi = j
    else:
        b, r = divmod(j, m)
        shift, sub = b - 1, m + r
        lo = sub << shift
        hi = lo + (1 << shift) - 1
    return (-hi, -lo) if neg else (lo, hi)


def test_bin_math_matches_pure_python_reference(spark):
    vals = [0, 1, 15, 16, 17, 31, 32, 63, 64, 1023, 1024, -1, -16, -100,
            (1 << 40) + 12345, 2**62, -(2**62), 7, -7]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = {
        r["v"]: (r["bin_idx"], r["lo"], r["hi"])
        for r in group_quantiles(
            df.selectExpr("v", "v AS g"), group_cols=["g"], value_col="v",
            percents=(50,),
        ).selectExpr("g AS v", "bin_idx", "lo", "hi").collect()
    }
    for v in vals:
        i = _idx(v)
        lo, hi = _bounds(i)
        assert got[v] == (i, lo, hi), (v, got[v], (i, lo, hi))
        assert lo <= v <= hi


def test_bracket_is_tight_and_monotone():
    random.seed(7)
    last = None
    for v in range(-4000, 4000):
        i = _idx(v)
        if last is not None:
            assert i >= last
        last = i
    for _ in range(20000):
        v = random.randint(-(2**62), 2**62)
        lo, hi = _bounds(_idx(v))
        assert lo <= v <= hi
        if abs(v) >= (1 << S_DEFAULT):
            assert (hi - lo + 1) * (1 << S_DEFAULT) <= 2 * abs(v)  # ≤ |v|/2^s width


def _mixed_rows(n: int, seed: int):
    random.seed(seed)
    return [
        (
            f"g{i % 3}",
            random.choice(
                [
                    random.randint(-(10**6), 10**6),
                    random.randint(0, 100),
                    random.randint(-(2**62), 2**62),
                    None,
                ]
            ),
        )
        for i in range(n)
    ]


def test_duckdb_mirror_and_exact_rank_bracket(spark):
    """Spark surface == DuckDB mirror bit-for-bit on mixed-sign data
    spanning the full BIGINT range, and every bracket contains the true
    lower quantile."""
    import collections

    import duckdb
    import pandas as pd

    rows = _mixed_rows(5000, seed=42)
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    got = sorted(tuple(r) for r in group_quantiles(df, group_cols=["g"], value_col="v").collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]).astype({"v": "Int64"}))
    want = sorted(
        tuple(r)
        for r in con.execute(sql_group_quantiles("t", group_cols=["g"], value_col="v")).fetchall()
    )
    assert got == want
    assert len(got) == 3 * len(DEFAULT_PERCENTS)
    vals = collections.defaultdict(list)
    for g, v in rows:
        if v is not None:
            vals[g].append(v)
    for g, p, n, rank, idx, lo, hi in got:
        xs = sorted(vals[g])
        assert n == len(xs) and rank == 1 + ((n - 1) * p) // 100
        assert lo <= xs[rank - 1] <= hi


def test_duckdb_mirror_on_testdata(spark, sf_dir):
    """Real-table mirror: per-source document-length quantiles."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        tuple(r)
        for r in group_quantiles(docs, group_cols=["source"], value_col="n_chars").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_group_quantiles("documents", group_cols=["source"], value_col="n_chars")
        ).fetchall()
    )
    assert got == want
    assert len({r[0] for r in got}) > 1  # real multi-group surface


def test_registry_fold_equals_oneshot_and_compaction(spark):
    rows = _mixed_rows(1200, seed=9)
    whole = spark.createDataFrame(rows, "g STRING, v LONG")
    oneshot = sorted(
        tuple(r) for r in group_quantiles(whole, group_cols=["g"], value_col="v").collect()
    )
    reg = None
    for b, (lo, hi) in enumerate(((0, 400), (400, 800), (800, 1200))):
        block = histq_batch_blocks(
            spark.createDataFrame(rows[lo:hi], "g STRING, v LONG"),
            group_cols=["g"], value_col="v", batch_id=b,
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = sorted(
        tuple(r)
        for r in histq_registry_quantiles(reg, group_cols=["g"]).collect()
    )
    assert folded == oneshot  # bit-exact, not approximate
    compact = histq_registry_compact(reg)
    assert {int(r["batch_id"]) for r in compact.select("batch_id").distinct().collect()} == {-1}
    assert sorted(
        tuple(r)
        for r in histq_registry_quantiles(compact, group_cols=["g"]).collect()
    ) == oneshot


def test_registry_stream_matches_batch_and_rerun_is_noop(spark, tmp_path):
    import time

    from briefly_spark.operators.histq import histq_counts_stream
    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming.incremental import read_parquet_stream

    rows = _mixed_rows(600, seed=3)
    src = tmp_path / "histq_batches"
    src.mkdir()
    for j, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 600))):
        spark.createDataFrame(rows[lo:hi], "g STRING, v LONG").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{j}"))
        time.sleep(1.1)
    wh = Warehouse(spark, str(tmp_path / "wh_histq"))
    ckpt = str(tmp_path / "histq_ckpt")
    run = lambda: histq_counts_stream(  # noqa: E731
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, registry_table="histq_reg", checkpoint=ckpt,
        group_cols=["g"], value_col="v",
    )
    run()
    got = sorted(
        tuple(r)
        for r in histq_registry_quantiles(wh.read("histq_reg"), group_cols=["g"]).collect()
    )
    want = sorted(
        tuple(r)
        for r in group_quantiles(
            spark.createDataFrame(rows, "g STRING, v LONG"),
            group_cols=["g"], value_col="v",
        ).collect()
    )
    assert got == want  # stream == one-shot, bit-exact
    state = sorted(map(tuple, wh.read("histq_reg").collect()))
    run()  # nothing new
    assert sorted(map(tuple, wh.read("histq_reg").collect())) == state


def test_rejects_non_integer_and_bad_percents(spark):
    df = spark.createDataFrame([("a", 1.5)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="integer"):
        group_quantiles(df, group_cols=["g"], value_col="v")
    ok = spark.createDataFrame([("a", 1)], "g STRING, v LONG")
    with pytest.raises(ValueError, match="percents"):
        group_quantiles(ok, group_cols=["g"], value_col="v", percents=(101,))


def test_single_corpus_shuffle_plan(spark, sf_dir):
    """The corpus contributes ONE hash-aggregate exchange (map-side
    combinable bin counts); everything after runs on the bounded counts
    frame (one more bounded exchange for its window) with the percents
    frame broadcast — no sort-merge join, no corpus window."""
    from briefly_spark.catalog import load_table

    out = group_quantiles(
        load_table(spark, sf_dir, "documents"),
        group_cols=["source"], value_col="n_chars",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
