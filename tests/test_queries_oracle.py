"""Every registered query runs and (when an oracle exists) hash-matches
DuckDB at sf0.001 — the same comparison the driver applies at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from briefly_spark.catalog import TABLES, table_path
from briefly_spark.queries import load_registry
from tools.check_oracle import table_fingerprint

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    s_fp = table_fingerprint(sdf.columns, srows)
    sf_pinned_elsewhere = (
        spec.oracle_sf is not None and spec.oracle_sf != sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    if spec.oracle is None or sf_pinned_elsewhere:
        # golden-fixture oracles only hold at their pinned SF (the driver
        # gate's sf0.01); elsewhere fall back to the rows-only check
        assert s_fp[0] > 0, f"{name}: rows-only query returned zero rows"
        return
    res = duck.execute(spec.oracle)
    d_fp = table_fingerprint([d[0] for d in res.description], res.fetchall())
    assert s_fp == d_fp, f"{name}: spark={s_fp} duckdb={d_fp}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "neighbor_id", "rank", "sim", "combined_score"}


def test_driver_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
