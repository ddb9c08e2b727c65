"""SCD2 versioned dimension history (storage.py merge_scd2 /
read_scd2_asof) — change/close/insert semantics, NULL-safe change
detection, replay idempotence, as-of reads, key-unique contract."""

from __future__ import annotations

import pytest

from briefly_spark.storage import Warehouse


def _wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh_scd2"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, city STRING, tier LONG")


def _state(wh):
    rows = [
        (r["id"], r["city"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in wh.read("dim").collect()
    ]
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def test_scd2_change_close_insert_and_asof(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.merge_scd2(_df(spark, [(1, "hanoi", 1), (2, "hue", 2)]), "dim", ["id"], version=1)
    assert _state(wh) == [
        (1, "hanoi", 1, 1, None, True),
        (2, "hue", 2, 1, None, True),
    ]
    # v2: id 1 changes, id 2 unchanged, id 3 new
    wh.merge_scd2(
        _df(spark, [(1, "saigon", 1), (2, "hue", 2), (3, "danang", 3)]),
        "dim",
        ["id"],
        version=2,
    )
    assert _state(wh) == [
        (1, "hanoi", 1, 1, 2, False),   # closed at v2
        (1, "saigon", 1, 2, None, True),
        (2, "hue", 2, 1, None, True),   # untouched — no spurious version
        (3, "danang", 3, 2, None, True),
    ]
    asof1 = sorted((r["id"], r["city"]) for r in wh.read_scd2_asof("dim", 1).collect())
    assert asof1 == [(1, "hanoi"), (2, "hue")]
    asof2 = sorted((r["id"], r["city"]) for r in wh.read_scd2_asof("dim", 2).collect())
    assert asof2 == [(1, "saigon"), (2, "hue"), (3, "danang")]


def test_scd2_replay_is_noop(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.merge_scd2(_df(spark, [(1, "hanoi", 1)]), "dim", ["id"], version=1)
    batch = _df(spark, [(1, "saigon", 1), (2, "hue", 2)])
    wh.merge_scd2(batch, "dim", ["id"], version=2)
    before = _state(wh)
    wh.merge_scd2(batch, "dim", ["id"], version=2)  # crash-replay
    assert _state(wh) == before
    # and replaying at a LATER version with identical values is also a
    # no-op — change detection is value-based, not version-based
    wh.merge_scd2(batch, "dim", ["id"], version=3)
    assert _state(wh) == before


def test_scd2_null_safe_change_detection(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.merge_scd2(_df(spark, [(1, None, 1), (2, "hue", None)]), "dim", ["id"], version=1)
    # NULL -> NULL unchanged; NULL -> value and value -> NULL both close
    wh.merge_scd2(_df(spark, [(1, "hanoi", 1), (2, "hue", None)]), "dim", ["id"], version=2)
    st = _state(wh)
    assert (1, None, 1, 1, 2, False) in st and (1, "hanoi", 1, 2, None, True) in st
    assert (2, "hue", None, 1, None, True) in st
    wh.merge_scd2(_df(spark, [(2, None, None)]), "dim", ["id"], version=3)
    st = _state(wh)
    assert (2, "hue", None, 1, 3, False) in st and (2, None, None, 3, None, True) in st


def test_scd2_change_cols_subset(spark, tmp_path):
    # tracked columns only: a tier-only change with change_cols=["city"]
    # is NOT a new version
    wh = _wh(spark, tmp_path)
    wh.merge_scd2(_df(spark, [(1, "hanoi", 1)]), "dim", ["id"], version=1)
    wh.merge_scd2(
        _df(spark, [(1, "hanoi", 9)]), "dim", ["id"], version=2, change_cols=["city"]
    )
    assert _state(wh) == [(1, "hanoi", 1, 1, None, True)]


def test_scd2_rejects_key_duplicate_batch(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with pytest.raises(ValueError, match="key-unique"):
        wh.merge_scd2(
            _df(spark, [(1, "a", 1), (1, "b", 2)]), "dim", ["id"], version=1
        )


def test_scd2_rejects_lineage_columns_in_batch(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.merge_scd2(_df(spark, [(1, "a", 1)]), "dim", ["id"], version=1)
    with pytest.raises(ValueError, match="lineage"):
        wh.merge_scd2(wh.read("dim"), "dim", ["id"], version=2)
