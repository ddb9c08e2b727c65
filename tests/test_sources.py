"""X134 quarantined JSONL/CSV sources + X135 schema contract — routing
of malformed / schema-violating records with provenance, the DuckDB
cross-check on the good rows, plan shape (no Python in the loop), and
the conform/refuse contract."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from briefly_spark.sources import (
    conform_batch,
    read_csv,
    read_jsonl,
    schema_drift_report,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_jsonl_routes_malformed_and_type_violations(spark, tmp_path):
    p = _write(tmp_path / "d.jsonl", [
        '{"id": 1, "name": "a", "score": 10}',
        '{"id": 2, "name": "b", "score": 20}',
        '{"id": 3, "name": "c", "score": "NOT A NUMBER"}',  # schema violation
        '{broken json line',                                  # malformed
    ])
    good, bad, raw = read_jsonl(spark, p, _SCHEMA)
    assert sorted(map(tuple, good.collect())) == [(1, "a", 10), (2, "b", 20)]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    assert {"NOT A NUMBER" in r["raw_record"] or "broken" in r["raw_record"]
            for r in bad_rows} == {True}
    assert all(r["source_file"].endswith("d.jsonl") for r in bad_rows)


def test_jsonl_good_rows_match_duckdb(spark, tmp_path):
    import duckdb

    lines = [
        f'{{"id": {i}, "name": "n{i}", "score": {i * 7}}}' for i in range(50)
    ]
    p = _write(tmp_path / "clean.jsonl", lines)
    good, bad, raw = read_jsonl(spark, p, _SCHEMA)
    assert bad.count() == 0
    got = sorted(map(tuple, good.collect()))
    con = duckdb.connect()
    want = sorted(
        map(tuple, con.execute(
            f"SELECT id, name, score FROM read_json_auto('{p}')"
        ).fetchall())
    )
    assert got == want


def test_csv_routes_bad_lines(spark, tmp_path):
    p = _write(tmp_path / "d.csv", [
        "id,name,score",
        "1,a,10",
        "2,b,twenty",   # uncastable score
        "3,c,30",
    ])
    good, bad, raw = read_csv(spark, p, _SCHEMA)
    assert sorted(map(tuple, good.collect())) == [(1, "a", 10), (3, "c", 30)]
    assert bad.count() == 1
    assert "twenty" in bad.collect()[0]["raw_record"]


def test_readers_stay_jvm_side(spark, tmp_path):
    p = _write(tmp_path / "plan.jsonl", ['{"id": 1, "name": "a", "score": 2}'])
    good, _bad, _raw = read_jsonl(spark, p, _SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "FileScan json" in plan


def test_schema_must_not_predeclare_corrupt_col(spark):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(
            spark, "/nonexistent",
            T.StructType([T.StructField("_corrupt_record", T.StringType())]),
        )


def test_schema_drift_report_and_conform(spark):
    table = spark.createDataFrame([(1, "a", 10)], "id LONG, name STRING, score LONG")
    batch = spark.createDataFrame([(2, 5, "x")], "id LONG, extra LONG, name STRING")
    drift = schema_drift_report(batch, table)
    assert drift == {"added": ["extra"], "missing": ["score"], "retyped": []}
    with pytest.raises(ValueError, match="unexpected new columns"):
        conform_batch(batch, table)
    conformed = conform_batch(batch, table, allow_additive=True)
    assert conformed.columns == table.columns  # order + fill, extras dropped
    assert conformed.collect()[0].asDict() == {"id": 2, "name": "x", "score": None}
    # retyped NEVER conforms
    retyped = spark.createDataFrame([("2", "x", 1)], "id STRING, name STRING, score LONG")
    assert schema_drift_report(retyped, table)["retyped"] == [("id", "string", "bigint")]
    with pytest.raises(ValueError, match="retyped"):
        conform_batch(retyped, table, allow_additive=True)


def test_cached_scan_is_released_on_unpersist(spark, tmp_path):
    """ADVICE r11 #5: the shared cached scan must be releasable — a
    continuous-ingest loop unpersists per delivery instead of leaking
    one cached frame per read for the session lifetime."""
    p = _write(tmp_path / "rel.jsonl", ['{"id": 1, "name": "a", "score": 2}'])
    res = read_jsonl(spark, p, _SCHEMA)
    assert res.good.count() == 1 and res.bad.count() == 0
    assert res.raw.storageLevel.useMemory  # cached while in use
    res.unpersist()
    assert not res.raw.storageLevel.useMemory  # released
