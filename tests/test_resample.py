"""X144 regular-grid resample with LOCF gap-fill — hand-pinned fill
semantics, the DuckDB mirror on randomized gappy series (all fill
modes) and on the real events table, the integer contract, and the
per-key (never global) window plan."""

from __future__ import annotations

import random

import pytest

from briefly_spark.operators.temporal import resample_locf, sql_resample_locf


def test_hand_pinned_fill_semantics(spark):
    # key a: observations at buckets 0, 3 (two obs in bucket 3 — last by
    # (ts, v) wins); gap buckets 1-2 carry bucket 0's value forward
    rows = [("a", 0, 10), ("a", 31, 77), ("a", 39, 88), ("a", 39, 11)]
    got = {
        (r["bucket"]): (r["bucket_start"], r["observed"], r["value"])
        for r in resample_locf(
            spark.createDataFrame(rows, "k STRING, ts LONG, v LONG"),
            key_cols=["k"], ts_col="ts", value_col="v", step=10,
        ).collect()
    }
    assert got == {
        0: (0, True, 10),
        1: (10, False, 10),
        2: (20, False, 10),
        3: (30, True, 88),  # ts=39 wins the bucket; (39,88) > (39,11)
    }
    # max_fill=1: bucket 2 is 2 steps past the last observation -> NULL
    capped = {
        r["bucket"]: r["value"]
        for r in resample_locf(
            spark.createDataFrame(rows, "k STRING, ts LONG, v LONG"),
            key_cols=["k"], ts_col="ts", value_col="v", step=10, max_fill=1,
        ).collect()
    }
    assert capped == {0: 10, 1: 10, 2: None, 3: 88}


def _gappy_rows(seed: int):
    random.seed(seed)
    rows = []
    for k in ("a", "b", "c"):
        t = random.randint(-50, 50)
        for _ in range(random.randint(1, 40)):
            rows.append((k, t, random.randint(-100, 100)))
            t += random.randint(0, 37)  # gaps and duplicate-ts collisions
    return rows


@pytest.mark.parametrize("max_fill", [None, 2, 0])
def test_duckdb_mirror_randomized(spark, max_fill):
    import duckdb
    import pandas as pd

    rows = _gappy_rows(seed=5)
    df = spark.createDataFrame(rows, "k STRING, ts LONG, v LONG")
    got = sorted(
        tuple(r)
        for r in resample_locf(
            df, key_cols=["k"], ts_col="ts", value_col="v",
            step=10, origin=-3, max_fill=max_fill,
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "ts", "v"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_resample_locf(
                "t", key_cols=["k"], ts_col="ts", value_col="v",
                step=10, origin=-3, max_fill=max_fill,
            )
        ).fetchall()
    )
    assert got == want
    assert len(got) > 50  # real grids with real gaps


def test_on_real_events_hourly_grid(spark, sf_dir):
    """Per-user hourly grid over the real events table (unix_micros ts,
    event_id carried): mirror-matched, grid contiguous per user."""
    import duckdb

    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table, table_path

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id"
    )
    out = resample_locf(
        ev, key_cols=["user_id"], ts_col="tsu", value_col="event_id",
        step=3_600_000_000,
    )
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ev AS SELECT user_id, epoch_us(ts) AS tsu, event_id "
        f"FROM '{table_path(sf_dir, 'events')}'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_resample_locf(
                "ev", key_cols=["user_id"], ts_col="tsu",
                value_col="event_id", step=3_600_000_000,
            )
        ).fetchall()
    )
    assert got == want
    # grid contiguity: per user, buckets are a dense range
    by_user: dict[int, list[int]] = {}
    for u, b, *_ in got:
        by_user.setdefault(u, []).append(b)
    assert by_user
    for bs in by_user.values():
        assert sorted(bs) == list(range(min(bs), max(bs) + 1))


def test_contracts(spark):
    df = spark.createDataFrame([("a", 1.5, 1)], "k STRING, ts DOUBLE, v LONG")
    with pytest.raises(ValueError, match="integer"):
        resample_locf(df, key_cols=["k"], ts_col="ts", value_col="v", step=10)
    ok = spark.createDataFrame([("a", 1, 1)], "k STRING, ts LONG, v LONG")
    with pytest.raises(ValueError, match="step"):
        resample_locf(ok, key_cols=["k"], ts_col="ts", value_col="v", step=0)
    with pytest.raises(ValueError, match="max_fill"):
        resample_locf(ok, key_cols=["k"], ts_col="ts", value_col="v", step=1, max_fill=-1)


def test_per_key_window_plan(spark, sf_dir):
    """One map-side-combinable bucket aggregation over the observations;
    the fill window is partitioned by key — no global sort, no
    cartesian, no Python."""
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id"
    )
    out = resample_locf(
        ev, key_cols=["user_id"], ts_col="tsu", value_col="event_id",
        step=3_600_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # every window is keyed: no empty partitionBy (global) window spec
    assert "windowspecdefinition(bucket" not in plan.lower().replace(" ", ""), plan


def test_pre_origin_buckets_are_uniform_floor_division(spark):
    """Floor division: bucket 0 is exactly [origin, origin+step); an
    observation 30 'minutes' before the origin lands in bucket -1 with a
    bucket_start that lower-bounds it — truncating division would have
    put it in a double-width bucket 0 (the reviewed hazard)."""
    origin, step = 1_000_000, 100
    rows = [("k", origin - 30, 7), ("k", origin + 30, 9)]
    got = {
        r["bucket"]: (r["bucket_start"], r["observed"], r["value"])
        for r in resample_locf(
            spark.createDataFrame(rows, "k STRING, ts LONG, v LONG"),
            key_cols=["k"], ts_col="ts", value_col="v",
            step=step, origin=origin,
        ).collect()
    }
    assert got == {
        -1: (origin - step, True, 7),
        0: (origin, True, 9),
    }
    # and every observation satisfies bucket_start <= ts < bucket_start+step
    for b, (start, _obs, _v) in got.items():
        for _k, ts, _val in rows:
            if (ts - origin) // step == b:
                assert start <= ts < start + step
