"""Pins for tools/oracle_sweep_large.py's TIER_SWITCHED detection: the
sweep's crossover formulas must track the real in-query gate constants
(q129's dense branch, q41's auto tier) — if a gate constant or slice
bound changes in the queries, these fail and the sweep formulas must be
re-derived (r15 review finding #3: the sweep must classify legitimate
exact→approximate divergence, not report it as a hash failure)."""

import sys

sys.path.insert(0, ".")


def test_tier_switch_formulas_track_gate_constants(tmp_path, monkeypatch):
    import tools.oracle_sweep_large as sw
    from briefly_spark.operators.similarity import related_topk
    from briefly_spark.queries.search import _HYB_EXACT_MAX_PAIRS

    # the formulas' constants exist and are what the sweep mirrors
    assert _HYB_EXACT_MAX_PAIRS == 25_000_000
    assert related_topk.__kwdefaults__["exact_max_pairs"] == 25_000_000

    # drive the detector with a synthetic embeddings count.  q41's
    # crossover (n ~ 22,360: (n//20+1)*n > 25M) sits BELOW q129's
    # (n ~ 50k: (n//100+1)*n > 25M) — its query panel is 5x denser
    monkeypatch.setattr(
        "briefly_spark.catalog.table_rows", lambda sf, t: 2000
    )
    assert sw.tier_switched(4, "ignored") == []          # n=8k: both exact
    assert sw.tier_switched(10, "ignored") == []         # n=20k: both exact
    assert sw.tier_switched(12, "ignored") == ["q41_related_articles"]  # n=24k
    assert set(sw.tier_switched(30, "ignored")) == {
        "q129_hybrid_rrf",
        "q41_related_articles",
    }  # n=60k: both gates exceeded


def test_q41_crossover_arithmetic():
    """The q41 slice bound (n//20+1) puts the exact->LSH crossover at
    n ~ 22,360, above every locally swept SF and the K<=10 sweep rungs —
    the r15 review fix (queries_n=n had moved it down to n ~ 5,000)."""
    bound = 25_000_000
    assert (22_000 // 20 + 1) * 22_000 <= bound
    assert (23_000 // 20 + 1) * 23_000 > bound
