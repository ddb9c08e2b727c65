"""q149 governance-pack composite — leg inventory, the fold≡one-shot
demonstrations embedded in the hashed surface, and the release-leg
guarantee (the full value-vs-oracle hash runs in test_queries_oracle's
parametrized sweep; these pins localize a red by section)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def pack(spark, sf_dir):
    from briefly_spark.queries import load_registry

    fn = load_registry()["q149_governance_pack"].fn
    return [tuple(r) for r in fn(spark, sf_dir).collect()]


def test_every_leg_emits(pack):
    sections = {r[0] for r in pack}
    assert {
        "profiles", "drift", "anomalies", "trend", "trend_registry",
        "kanon", "kanon_release", "pivot", "topk", "bootstrap",
    } <= sections
    assert any(s.startswith("sheet_") for s in sections)
    assert any(s.startswith("sheetreg_") for s in sections)
    # long-format contract: no NULL keys, no NULL metric
    assert all(r[1] is not None and r[2] is not None for r in pack)


def test_trend_registry_fold_equals_oneshot_in_surface(pack):
    """X131's exactness claim sits INSIDE the hashed frame: the registry
    fold's rows equal the one-shot rows modulo the section label."""
    one = {r[1:] for r in pack if r[0] == "trend"}
    fold = {r[1:] for r in pack if r[0] == "trend_registry"}
    assert one and one == fold


def test_sheet_registry_exact_legs_equal_oneshot(pack):
    """X137's exact legs equal the one-shot datasheet rows (the HLL
    distinct leg is excluded from the hashed surface by design)."""
    one = {
        (r[0].removeprefix("sheet_"),) + r[1:]
        for r in pack
        if r[0].startswith("sheet_")
        and r[1] not in ("n_distinct_texts", "n_exact_dup_docs")
    }
    fold = {
        (r[0].removeprefix("sheetreg_"),) + r[1:]
        for r in pack
        if r[0].startswith("sheetreg_")
    }
    assert one and one == fold


def test_release_is_k_anonymous_and_audited(pack):
    rel = {(r[1], r[2]): r[3] for r in pack if r[0] == "kanon_release"}
    assert int(rel[("n_violating_groups", "")]) == 0
    assert int(rel[("k_min", "")]) >= 8
    lvl = int(rel[("level", "c_nationkey")])
    assert 0 <= lvl <= 2 and int(rel[("rounds", "")]) == lvl
    # the raw-table audit leg is present for the before/after story
    kan = {r[1]: r[3] for r in pack if r[0] == "kanon"}
    assert int(kan["n_rows"]) >= int(rel[("n_rows", "")])


def test_topk_is_the_exact_global_head(pack, spark, sf_dir):
    from briefly_spark.catalog import load_table

    top = {int(r[2]): int(r[3]) for r in pack if r[0] == "topk"}
    docs = load_table(spark, sf_dir, "documents")
    want = {
        int(r["doc_id"]): int(r["n_chars"])
        for r in docs.orderBy(
            docs.n_chars.desc(), docs.doc_id.asc()
        ).limit(10).collect()
    }
    assert top == want and len(top) == 10
