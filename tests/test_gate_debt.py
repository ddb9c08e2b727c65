"""Gate-debt invariant (VERDICT r07 next-round #6): every registered
query whose current form (oracle + fn source) has never earned a green
driver row must be scheduled in WINDOW_HEAD for this round's gate.

This is the mechanical guard against the r07 omission — registering a
query after the window rotation and shipping it with no driver row."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tools.gate_debt import current_hashes, gate_debt, load_manifest


def test_all_gate_debt_is_window_scheduled():
    from briefly_spark.queries import WINDOW_HEAD, load_registry

    load_registry()
    debt = gate_debt()
    uncovered = [n for n in debt if n not in WINDOW_HEAD]
    assert not uncovered, (
        f"queries changed/added without a WINDOW_HEAD slot (no driver row "
        f"will ever gate their current form): {uncovered} — rotate them into "
        f"briefly_spark/queries/__init__.py:WINDOW_HEAD or, if the driver "
        f"just gated this exact tree, run tools/gate_debt.py --update N"
    )


def test_reproduces_r07_omission():
    """On the r07 tree the check would have failed: q124–q126 were debt
    (never gated) while the r07 WINDOW_HEAD had no slot for them.  Replay
    against a FROZEN r07-era manifest snapshot (current hashes minus the
    three then-new queries) so the test stays valid after later
    ``gate_debt.py --update N`` runs record their green rows."""
    from briefly_spark.queries import load_registry

    load_registry()
    r07_head_sample = (  # the r07 head started with the stale-evidence fill
        "q60_chunk_embed_meanpool",
        "q61_factcheck_scores",
        "q62_summarize_worklist",
    )
    new_in_r07 = {"q124_classifier_train", "q125_classifier_margins", "q126_bpe_encode"}
    hashes = current_hashes()
    # r07-era manifest: every query gated at its CURRENT form except the
    # three that were registered post-rotation (they had no row at all).
    frozen = {
        n: {"hash": h, "round": 7} for n, h in hashes.items() if n not in new_in_r07
    }
    debt = set(gate_debt(hashes, frozen))
    assert new_in_r07 <= debt  # never-gated queries surface as debt
    uncovered = new_in_r07 - set(r07_head_sample)
    assert uncovered == new_in_r07  # the r07 head missed all three -> red


def test_no_overage_evidence_unscheduled():
    """Staleness policing made mechanical (VERDICT r08 next-round #7):
    any query whose newest green driver row would be >= 3 rounds old at
    the round being gated next must hold a WINDOW_HEAD slot.  Before this
    invariant, over-age evidence was flagged judge-side only."""
    from tools.window_plan import overage

    over = overage()
    assert not over, (
        f"queries with over-age driver evidence (>=3 rounds old) not "
        f"scheduled in WINDOW_HEAD — rotate them into "
        f"briefly_spark/queries/__init__.py: {over}"
    )


def test_overage_round_boundary_semantics():
    """VERDICT r09 next-round #2: the over-age invariant fires only on an
    ACTUALLY-missed rotation, not in every inter-round gap.  When the
    driver has written a newer CORRECTNESS file than the committed
    manifest round (rotation pending), ``overage`` must be silent; once
    the manifest catches up (``gate_debt.py --update N`` ran), it
    enforces.  Exercised against synthetic manifests so the test holds at
    every future round."""
    from tools.window_plan import freshness, overage

    latest_n, _newest_green, _seen = freshness()
    pending = {"qxx": {"hash": "0" * 64, "round": latest_n - 1}}
    assert overage(manifest=pending) == []  # rotation pending -> silent
    opened = {"qxx": {"hash": "0" * 64, "round": latest_n}}
    # round opened: enforcement active.  The committed WINDOW_HEAD must
    # already schedule every stale query, so the real answer is empty —
    # prove enforcement is LIVE (not short-circuited) with a tiny max_age
    # that makes even fresh evidence over-age unless scheduled.
    assert overage(manifest=opened) == []
    from briefly_spark.queries import WINDOW_HEAD, load_registry

    reg = load_registry()
    unscheduled = [n for n in reg if n not in WINDOW_HEAD and not reg[n].expected_red]
    if unscheduled:  # max_age=0: everything gated before next round is stale
        assert overage(max_age=0, manifest=opened), (
            "enforcement branch unreachable: overage(max_age=0) found nothing"
        )


def test_manifest_covers_registry():
    """manifest ∪ debt = registry (nothing silently unaccounted), and a
    doctored manifest flags a tampered query."""
    from briefly_spark.queries import load_registry

    reg = load_registry()
    hashes = current_hashes()
    manifest = load_manifest()
    assert set(hashes) == set(reg)
    debt = set(gate_debt(hashes, manifest))
    assert set(manifest) | debt >= set(reg)
    # simulate an edit to a gated query: its hash changes -> becomes debt
    victim = next(n for n in reg if n in manifest and n not in debt)
    doctored = dict(hashes)
    doctored[victim] = "0" * 64
    assert victim in gate_debt(doctored, manifest)
