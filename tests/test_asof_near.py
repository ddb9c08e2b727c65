"""X148 as-of join with direction + tolerance (pandas merge_asof parity)
— hand-pinned direction/tie/tolerance semantics, a brute-force DuckDB
mirror on randomized series and on the real events table, contracts,
agreement with the original asof_join on the backward default, and the
one-shuffle plan."""

from __future__ import annotations

import random

import pytest

from briefly_spark.operators.temporal import asof_join, asof_join_near


def _mk(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "key STRING, lt LONG")
    r = spark.createDataFrame(right_rows, "key STRING, rt LONG, v LONG")
    return l, r


def _near(l, r, **kw):
    return asof_join_near(
        l, r, key="key", left_ts="lt", right_ts="rt", value_cols=["v"], **kw
    )


def test_hand_pinned_directions_ties_tolerance(spark):
    l, r = _mk(
        spark,
        [("a", 10), ("a", 25), ("a", 31)],
        [("a", 10, 100), ("a", 20, 200), ("a", 30, 300), ("a", 40, 400)],
    )
    back = {row["lt"]: row["v"] for row in _near(l, r, direction="backward").collect()}
    assert back == {10: 100, 25: 200, 31: 300}  # equal ts matches backward
    fwd = {row["lt"]: row["v"] for row in _near(l, r, direction="forward").collect()}
    assert fwd == {10: 100, 25: 300, 31: 400}  # equal ts matches forward too
    near = {row["lt"]: row["v"] for row in _near(l, r, direction="nearest").collect()}
    assert near == {10: 100, 25: 200, 31: 300}  # 25 ties 20/30 -> backward
    tol = {
        row["lt"]: row["v"]
        for row in _near(l, r, direction="nearest", tolerance=1).collect()
    }
    assert tol == {10: 100, 25: None, 31: 300}  # |Δ|=5 out of tolerance
    inner = _near(l, r, direction="nearest", tolerance=1, how="inner")
    assert {row["lt"] for row in inner.collect()} == {10, 31}


def _brute(left_rows, right_rows, direction, tolerance):
    out = {}
    for k, lt in left_rows:
        cands = [(rt, v) for (rk, rt, v) in right_rows if rk == k]
        if direction == "backward":
            ok = [(lt - rt, rt, v) for rt, v in cands if rt <= lt]
        elif direction == "forward":
            ok = [(rt - lt, rt, v) for rt, v in cands if rt >= lt]
        else:
            ok = [(abs(rt - lt), -(rt <= lt), v) for rt, v in cands]
        pick = min(ok) if ok else None
        v = pick[-1] if pick else None
        if pick is not None and tolerance is not None and pick[0] > tolerance:
            v = None
        out[(k, lt)] = v
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 7])
def test_randomized_vs_bruteforce(spark, direction, tolerance):
    random.seed(4)
    keys = ["a", "b", "c"]
    left_rows = [(random.choice(keys), random.randint(0, 200)) for _ in range(120)]
    left_rows = list(dict.fromkeys(left_rows))  # unique (key, lt)
    right_rows = list(
        {
            (k, rt): (k, rt, random.randint(0, 999))
            for k, rt in (
                (random.choice(keys), random.randint(0, 200)) for _ in range(90)
            )
        }.values()
    )  # unique per (key, rt) — the documented contract
    l, r = _mk(spark, left_rows, right_rows)
    got = {
        (row["key"], row["lt"]): row["v"]
        for row in _near(l, r, direction=direction, tolerance=tolerance).collect()
    }
    assert got == _brute(left_rows, right_rows, direction, tolerance)


def test_backward_default_agrees_with_asof_join(spark, sf_dir):
    """On the real events table the generalization's backward default is
    row-identical to the established asof_join (how=left on both)."""
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id", "event_type"
    )
    left = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("key"), F.col("tsu").alias("lt")
    )
    right = (
        ev.filter("event_type = 'view'")
        .groupBy(F.col("user_id").alias("key"), F.col("tsu").alias("rt"))
        .agg(F.max("event_id").alias("v"))  # unique per (key, rt)
    )
    a = sorted(
        map(tuple, _near(left, right, direction="backward", how="left").collect())
    )
    b = sorted(
        map(
            tuple,
            asof_join(
                left, right, key="key", left_ts="lt", right_ts="rt",
                value_cols=["v"], how="left",
            ).collect(),
        )
    )
    assert a == b and len(a) > 50


def test_contracts_and_one_shuffle_plan(spark):
    l, r = _mk(spark, [("a", 1)], [("a", 1, 1)])
    with pytest.raises(ValueError, match="direction"):
        _near(l, r, direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        _near(l, r, tolerance=-1)
    with pytest.raises(ValueError, match="how"):
        _near(l, r, how="outer")
    plan = (
        _near(l, r, direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both window functions share ONE keyed sort/partition; no join at all
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_null_timestamps_never_participate(spark):
    """NULL-ts left rows never match (kept NULL under how='left', dropped
    under 'inner'); a NULL-ts right row is not a universal match."""
    l = spark.createDataFrame([("a", 10), ("a", None)], "key STRING, lt LONG")
    r = spark.createDataFrame(
        [("a", 5, 500), ("a", None, 999)], "key STRING, rt LONG, v LONG"
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            row["lt"]: row["v"]
            for row in _near(l, r, direction=direction, how="left").collect()
        }
        assert got[None] is None, direction  # NULL-ts left never matches
        assert got[10] != 999, direction  # NULL-ts right is not a match
        inner = _near(l, r, direction=direction, how="inner")
        assert [row["lt"] for row in inner.collect()] == ([10] if direction != "forward" else [])
