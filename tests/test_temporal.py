"""Unit tests for the temporal join operators (as-of, range) — edge
semantics the oracle queries don't isolate: equal-timestamp ties, no-match
rows under inner/left, inclusive range boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from briefly_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "u", _ts(5))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 100.0), ("u", _ts(20), 200.0)],
        "user_id string, rts timestamp, profile_value double",
    )
    got = {
        r.event_id: r.profile_value
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="rts",
            value_cols=["profile_value"], how="inner",
        ).collect()
    }
    # tie at ts==rts matches (<=); later left row sees the newest right row;
    # a left row before any right row is dropped under inner
    assert got == {1: 100.0, 2: 200.0}


def test_asof_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(1)), (2, "v", _ts(9))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("v", _ts(2), 7.0)], "user_id string, rts timestamp, profile_value double"
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="rts",
        value_cols=["profile_value"], how="left",
    ).collect()
    got = {r.event_id: r.profile_value for r in rows}
    assert got == {1: None, 2: 7.0}


def test_range_join_inclusive_bounds_and_bin_edges(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 10.0, 15.0, 25.0])],
        "pid long, value double",
    )
    ranges = spark.createDataFrame(
        [(100, 5.0, 15.0), (200, -3.0, 0.0)], "range_id long, lo double, hi double"
    )
    got = {
        (r.range_id, r.pid)
        for r in range_join(
            points, ranges, point_col="value", lo_col="lo", hi_col="hi", bin_width=10.0
        ).collect()
    }
    # both endpoints inclusive; ranges spanning bin boundaries still match
    # points in every covered bin; negative-lo bins handled
    assert got == {(100, 1), (100, 2), (100, 3), (200, 0)}


def test_range_join_matches_naive_join(spark):
    import random

    rnd = random.Random(11)
    points = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(300)], "pid long, value double"
    )
    ranges = spark.createDataFrame(
        [(i, lo := rnd.uniform(0, 95), lo + rnd.uniform(0, 12)) for i in range(40)],
        "range_id long, lo double, hi double",
    )
    banded = {
        (r.range_id, r.pid)
        for r in range_join(
            points, ranges, point_col="value", lo_col="lo", hi_col="hi", bin_width=8.0
        ).collect()
    }
    naive = {
        (r.range_id, r.pid)
        for r in ranges.crossJoin(points)
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .collect()
    }
    assert banded == naive and banded


def test_asof_join_null_valued_match_is_not_skipped(spark):
    # The right row AT the match point has a NULL payload: the as-of value
    # is that NULL (not the older 5.0), and inner mode keeps the row —
    # row presence is tracked separately from value nullability.
    left = spark.createDataFrame(
        [(1, "u", _ts(30))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 5.0), ("u", _ts(20), None)],
        "user_id string, rts timestamp, profile_value double",
    )
    for how in ("inner", "left"):
        rows = asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="rts",
            value_cols=["profile_value"], how=how,
        ).collect()
        assert [(r.event_id, r.profile_value) for r in rows] == [(1, None)], how


def test_range_join_pathological_span_fails_gracefully(spark):
    import pytest

    points = spark.createDataFrame([(1, 5.0)], "pid long, value double")
    ranges = spark.createDataFrame(
        [(100, 0.0, 1.0e12)], "range_id long, lo double, hi double"
    )
    with pytest.raises(Exception, match="max_span_bins"):
        range_join(
            points, ranges, point_col="value", lo_col="lo", hi_col="hi", bin_width=1.0
        ).collect()


def test_range_join_inverted_interval_matches_nothing(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, value double")
    ranges = spark.createDataFrame(
        [(100, 10.0, 0.0), (200, 4.0, 6.0)], "range_id long, lo double, hi double"
    )
    got = {
        (r.range_id, r.pid)
        for r in range_join(
            points, ranges, point_col="value", lo_col="lo", hi_col="hi", bin_width=10.0
        ).collect()
    }
    assert got == {(200, 1)}


def test_asof_join_matches_duckdb_randomized(spark):
    """Property test: asof_join == DuckDB's native ASOF JOIN on randomized
    keys/timestamps/NULL payloads (VERDICT r03 #4 — the hand-built join
    algorithms have no Catalyst safety net, so the oracle is an
    independent engine, not a Python reimplementation).  Three seeds ×
    both join modes; deterministic."""
    import random

    import duckdb
    import pandas as pd

    for seed in (11, 29, 57):
        rnd = random.Random(seed)
        n_keys = rnd.randint(2, 7)
        left_pdf = pd.DataFrame(
            {
                "event_id": range(150),
                "user_id": [f"u{rnd.randint(0, n_keys)}" for _ in range(150)],
                "ts": [_ts(rnd.randint(0, 400)) for _ in range(150)],
            }
        )
        # unique (key, rts) per the operator contract; ~20% NULL payloads;
        # key u0 never appears on the right (unmatched-key path)
        right_rows = [
            (f"u{u}", _ts(m), None if rnd.random() < 0.2 else float(u * 1000 + m))
            for u in range(1, n_keys + 1)
            for m in rnd.sample(range(0, 400), rnd.randint(5, 40))
        ]
        right_pdf = pd.DataFrame(right_rows, columns=["user_id", "rts", "profile_value"])

        con = duckdb.connect()
        con.register("l", left_pdf)
        con.register("r", right_pdf)
        for how, kw in (("left", "LEFT "), ("inner", "")):
            expect = {
                (e, u): v
                for e, u, v in con.execute(
                    f"SELECT l.event_id, l.user_id, r.profile_value "
                    f"FROM l ASOF {kw}JOIN r "
                    f"ON l.user_id = r.user_id AND l.ts >= r.rts"
                ).fetchall()
            }
            out = asof_join(
                spark.createDataFrame(left_pdf),
                spark.createDataFrame(right_pdf),
                key="user_id", left_ts="ts", right_ts="rts",
                value_cols=["profile_value"], how=how,
            ).collect()
            assert len(out) == len(expect), (seed, how)
            got = {(r.event_id, r.user_id): r.profile_value for r in out}
            assert got == expect, (seed, how)


def test_range_join_matches_duckdb_randomized(spark):
    """Property test: range_join == DuckDB inequality join on randomized
    points/intervals, including point-on-boundary, zero-width, inverted,
    and bin-straddling intervals.  Three seeds; deterministic."""
    import random

    import duckdb
    import pandas as pd

    for seed in (3, 41, 88):
        rnd = random.Random(seed)
        points_pdf = pd.DataFrame(
            {
                "pid": range(200),
                # half the points land exactly on integers → boundary hits
                "value": [
                    float(rnd.randint(0, 500))
                    if rnd.random() < 0.5
                    else rnd.uniform(0, 500)
                    for _ in range(200)
                ],
            }
        )
        range_rows = []
        for i in range(80):
            lo = rnd.uniform(0, 500)
            kind = rnd.random()
            if kind < 0.1:
                hi = lo  # zero-width
            elif kind < 0.2:
                hi = lo - rnd.uniform(0.1, 50)  # inverted → matches nothing
            else:
                hi = lo + rnd.uniform(0, 120)  # spans several 10-wide bins
            range_rows.append((1000 + i, lo, hi))
        ranges_pdf = pd.DataFrame(range_rows, columns=["range_id", "lo", "hi"])

        con = duckdb.connect()
        con.register("p", points_pdf)
        con.register("rg", ranges_pdf)
        expect = set(
            con.execute(
                "SELECT p.pid, rg.range_id FROM p JOIN rg "
                "ON p.value BETWEEN rg.lo AND rg.hi"
            ).fetchall()
        )
        got_rows = range_join(
            spark.createDataFrame(points_pdf),
            spark.createDataFrame(ranges_pdf),
            point_col="value", lo_col="lo", hi_col="hi", bin_width=10.0,
        ).collect()
        got = {(r.pid, r.range_id) for r in got_rows}
        assert len(got_rows) == len(got), seed  # no duplicate emissions
        assert got == expect, seed


def test_asof_join_matches_naive_on_random_data(spark):
    import random

    rnd = random.Random(23)
    left = spark.createDataFrame(
        [(i, f"u{rnd.randint(0, 5)}", _ts(rnd.randint(0, 300))) for i in range(120)],
        "event_id long, user_id string, ts timestamp",
    )
    # unique (key, rts); ~1 in 6 right rows carries a NULL payload
    right_rows = [
        (f"u{u}", _ts(m), None if rnd.random() < 0.18 else float(u * 1000 + m))
        for u in range(5)
        for m in rnd.sample(range(0, 300), 25)
    ]
    right = spark.createDataFrame(
        right_rows, "user_id string, rts timestamp, profile_value double"
    )
    out_rows = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="rts",
        value_cols=["profile_value"], how="left",
    ).collect()
    # exactly one output row per left row — a dict alone would mask
    # duplicate-emission regressions
    assert len(out_rows) == 120
    got = {r.event_id: (r.profile_value,) for r in out_rows}
    # naive reference: inequality join + per-event argmax on rts
    naive = {}
    rmap = {}
    for u, rts, v in right_rows:
        rmap.setdefault(u, []).append((rts, v))
    for e, u, ts in left.collect():
        cands = [(rts, v) for rts, v in rmap.get(u, []) if rts <= ts]
        naive[e] = (max(cands)[1],) if cands else (None,)
    assert got == naive
