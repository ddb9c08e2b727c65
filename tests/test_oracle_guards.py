"""Pins for the generalized brute-force row-cap guards (r15: the q37
SQL_BRUTE_FORCE_CAP pattern applied to every super-linear DuckDB mirror
the oracle-cost ladder flagged — q33/q122 blocked pairs, the shared
q95/q115/q144 near-dup-graph prefix)."""

import duckdb
import pytest

from briefly_spark.oracle_guards import ORACLE_ROW_CAP, guarded_scan, sql_row_cap_cte


def _con_with_t(n: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT i AS id, 'x' || CAST(i AS VARCHAR) AS txt "
        f"FROM range({n}) r(i)"
    )
    return con


def test_guard_fires_above_cap_and_noops_below():
    sql = (
        f"WITH {sql_row_cap_cte('t', label='unit', cap=9)} "
        f"SELECT a.id FROM {guarded_scan('t')} a JOIN t b ON a.id < b.id"
    )
    with pytest.raises(duckdb.Error, match="ORACLE_ROW_CAP"):
        _con_with_t(10).execute(sql).fetchall()
    # below the cap: identical rows to the unguarded join
    con = _con_with_t(9)
    got = sorted(con.execute(sql).fetchall())
    want = sorted(con.execute("SELECT a.id FROM t a JOIN t b ON a.id < b.id").fetchall())
    assert got == want and len(got) > 0


@pytest.mark.parametrize(
    "qname",
    [
        "q33_ngram_jaccard_pairs",
        "q122_shingle_containment",
        "q95_dup_graph_pagerank",
        "q115_label_propagation",
        "q144_dup_triangles",
    ],
)
def test_armed_mirrors_refuse_oversized_corpus(qname):
    """Each armed registry oracle must refuse a documents table above the
    cap — synthesized in-memory so the test doesn't need an oversized
    parquet fixture.  (Value agreement below the cap is the standing
    check_oracle/driver gate at sf0.001–sf0.1.)"""
    from briefly_spark.queries import load_registry

    spec = load_registry()[qname]
    assert "ORACLE_ROW_CAP" in spec.oracle, "guard missing from the mirror"
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE documents AS SELECT i AS doc_id, 'w' || CAST(i AS VARCHAR) AS text, "
        f"'s' AS source, 'en' AS lang, 5 AS n_chars FROM range({ORACLE_ROW_CAP + 1}) r(i)"
    )
    with pytest.raises(duckdb.Error, match="ORACLE_ROW_CAP"):
        con.execute(spec.oracle).fetchall()


def test_default_cap_keeps_margin_over_largest_swept_sf():
    # sf0.1 documents = 5k rows and the dedup corpus CTE doubles it with
    # mutants (10k) — the guard must clear the largest gate-swept input
    # with the documented 2x margin (hashes re-verified at sf0.1, r15)
    assert ORACLE_ROW_CAP >= 20_000
