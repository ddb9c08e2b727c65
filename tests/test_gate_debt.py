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
    """VERDICT r10 what's-wrong #1 (the r09 next-round #2 item, properly
    closed): the over-age invariant fires only on an ACTUALLY-missed
    rotation, not in every inter-round gap.  When the driver has written
    a newer CORRECTNESS file than the committed manifest round (rotation
    pending), ``overage`` must be silent; once the manifest catches up
    (``gate_debt.py --update N`` ran), it enforces.

    Both halves run against FULLY synthetic inputs — a synthetic manifest
    AND a synthetic schedule (``head``) — so the assertions never depend
    on the committed WINDOW_HEAD's phase relative to the driver's newest
    CORRECTNESS file.  The r10 form of this test asserted the LIVE
    WINDOW_HEAD schedules every stale query under a simulated-opened
    manifest, which is guaranteed false the moment the driver writes a
    new CORRECTNESS file — red in every inter-round gap."""
    from briefly_spark.queries import load_registry
    from tools.window_plan import freshness, overage

    reg = load_registry()
    latest_n, _newest_green, _seen = freshness()
    all_names = tuple(reg)
    pending = {"qxx": {"hash": "0" * 64, "round": latest_n - 1}}
    # rotation pending -> silent, even with an empty schedule
    assert overage(manifest=pending, head=()) == []
    opened = {"qxx": {"hash": "0" * 64, "round": latest_n}}
    # round opened + everything scheduled -> nothing over-age, even at
    # max_age=0 (every query gated before next round counts as stale)
    assert overage(max_age=0, manifest=opened, head=all_names) == []
    # round opened + NOTHING scheduled -> enforcement is live: max_age=0
    # makes every green-gated query over-age
    assert overage(max_age=0, manifest=opened, head=()), (
        "enforcement branch unreachable: overage(max_age=0, head=()) empty"
    )
    # scheduling exactly the over-age set silences exactly it
    stale = overage(max_age=0, manifest=opened, head=())
    assert overage(max_age=0, manifest=opened, head=tuple(stale)) == []


def test_window_tail_entries_bounded_to_one_round():
    """ADVICE r10 #3: WINDOW_HEAD entries beyond the driver's 50-entry
    gate satisfy the over-age invariant as 'scheduled' but earn no driver
    row — a tail slot must therefore persist at most ONE round.  Each
    tail entry must have been gated at the manifest round or the round
    before it (i.e. its deferral is fresh); a tail entry whose last
    green row is older means staleness enforcement is being silenced by
    a perpetual tail seat."""
    from briefly_spark.queries import WINDOW_HEAD, load_registry
    from tools.window_plan import freshness

    load_registry()
    manifest = load_manifest()
    manifest_round = max((rec.get("round", 0) for rec in manifest.values()), default=0)
    latest_n, newest_green, _seen = freshness()
    if manifest_round < latest_n:
        return  # rotation pending — round-open rotation re-seats the tail
    tail = WINDOW_HEAD[50:]
    overstayed = [
        q for q in tail if newest_green.get(q, -1) < manifest_round - 1
    ]
    assert not overstayed, (
        f"WINDOW_HEAD tail entries (positions 51+) holding a no-evidence "
        f"seat for more than one round: {overstayed} — rotate them into "
        f"the gated head"
    )


def test_mirror_pinned_evidence_exists():
    """VERDICT r10 next-round #5: the mirror-evidence class is enumerated
    mechanically (tools/window_plan.py:MIRROR_PINNED) and each entry's
    mirror symbol AND test site must exist — deleting a DuckDB mirror or
    its value-compare test breaks this test, so a mirror-pinned operator
    can't silently lose its evidence while it waits for a registry slot."""
    import importlib
    import re as _re

    from tools.window_plan import MIRROR_PINNED

    assert MIRROR_PINNED, "enumeration must not be empty while ops are queued"
    for m in MIRROR_PINNED:
        mod_name, attr = m["symbol"].split(":")
        obj = importlib.import_module(mod_name)
        for part in attr.split("."):  # supports Class.method symbols
            obj = getattr(obj, part)
        assert callable(obj), f"{m['op']}: missing {m['symbol']}"
        test_path, test_name = m["test"].split("::")
        with open(test_path) as f:
            src = f.read()
        assert _re.search(rf"^\s*def {_re.escape(test_name)}\(", src, _re.M), (
            f"{m['op']}: test site {m['test']} missing — the mirror lost "
            f"its value-compare pin"
        )
        # graduated ops must leave the list: no registry query may already
        # cover the op (the X-id appears in the registry docstrings once a
        # query lands — e.g. X118 graduated to q148 and was removed here)
        from briefly_spark.queries import load_registry

        xid = m["op"].split()[0]
        covered = [
            n for n, s in load_registry().items()
            if xid in (s.doc or "")
        ]
        assert not covered, (
            f"{m['op']} already covered by registry queries {covered} — "
            f"remove its MIRROR_PINNED entry; gate_debt owns it now"
        )


def test_graft_dispositions_name_real_queries():
    """Every graft-queued MIRROR_PINNED entry names its target composite
    by query id; a typo'd or retired target would silently orphan the
    graft plan (it happened in review: q147_expectations vs
    q147_expectation_audit), so the named qNN must resolve."""
    import re as _re

    from briefly_spark.queries import load_registry

    from tools.window_plan import MIRROR_PINNED

    reg = load_registry()
    grafts = [m for m in MIRROR_PINNED if m["queued"].startswith("graft")]
    # an EMPTY graft lane is the valid drained state (r13 executed all
    # eight X142–X149 grafts); what this test guards is that any entry
    # that IS queued names a resolvable target
    for m in grafts:
        named = _re.findall(r"q\d+[a-z_]*", m["queued"])
        assert named, f"{m['op']}: graft disposition names no target query"
        for q in named:
            assert q in reg, (
                f"{m['op']}: graft target {q!r} is not a registered query"
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


def test_update_prunes_retired_queries(tmp_path, monkeypatch):
    """A retired query's manifest row must not survive --update: a stale
    hash would let the query, re-registered in exactly its last-gated
    form, dodge the WINDOW_HEAD scheduling invariant (r12 review)."""
    import json

    import tools.gate_debt as gd

    manifest_path = tmp_path / "gated_hashes.json"
    live = dict(list(gd.current_hashes().items())[:2])
    stale = {"q_retired_ghost": {"hash": "f" * 64, "round": 3}}
    json.dump(
        {**{n: {"hash": h, "round": 9} for n, h in live.items()}, **stale},
        open(manifest_path, "w"),
    )
    monkeypatch.setattr(gd, "MANIFEST", str(manifest_path))
    correctness = tmp_path / "CORRECTNESS_r99.json"
    json.dump(
        {n: {"rows_match": True, "schema_match": True, "hash_match": True}
         for n in live},
        open(correctness, "w"),
    )
    monkeypatch.chdir(tmp_path)
    gd.update(99)
    out = json.load(open(manifest_path))
    assert "q_retired_ghost" not in out
    assert all(out[n]["round"] == 99 for n in live)
