"""Mechanical gate-debt check (VERDICT r07 next-round #6).

The r07 process defect: three queries were registered after the driver
window was rotated, so they shipped with NO driver row and nothing
failed.  This tool makes that class of omission a test failure:

- ``tools/gated_hashes.json`` is the committed manifest of, per query,
  the sha256 of its CURRENT FORM (oracle SQL + query-fn source) as of
  the last round whose driver gate covered it green.
- A query is **gate debt** when its current-form hash differs from the
  manifest (new query, or code/oracle changed since last gated).
- The invariant (enforced by tests/test_gate_debt.py): every gate-debt
  query must sit in ``WINDOW_HEAD`` — i.e. be scheduled for a driver row
  THIS round.  A new or edited query that nobody put in the window makes
  pytest red.

Round-open flow, after CORRECTNESS_r{N}.json lands: run
``python tools/gate_debt.py --update N`` (records current hashes for the
queries green in that file — valid because the driver just ran this very
tree), commit the manifest, then rotate WINDOW_HEAD for the new round.

Caveat (by design, per the verdict's spec): the hash covers the query
function's own source + its oracle, not the transitive closure of
operator helpers it calls.  An operator-module edit that changes query
behavior without touching the query fn is caught by the other surfaces
(check_oracle sweep, pytest pins), not this one.

Usage:
  python tools/gate_debt.py --check        # exit 1 on uncovered debt
  python tools/gate_debt.py --update N     # record hashes from CORRECTNESS_rN
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gated_hashes.json")


def current_hashes() -> dict[str, str]:
    """name -> sha256(oracle + fn source) for every registered query."""
    from briefly_spark.queries import load_registry

    out = {}
    for name, spec in load_registry().items():
        blob = (spec.oracle or "") + "\n" + inspect.getsource(spec.fn)
        out[name] = hashlib.sha256(blob.encode()).hexdigest()
    return out


def load_manifest() -> dict[str, dict]:
    if not os.path.exists(MANIFEST):
        return {}
    with open(MANIFEST) as f:
        return json.load(f)


def gate_debt(
    hashes: dict[str, str] | None = None, manifest: dict[str, dict] | None = None
) -> list[str]:
    """Queries whose current form has no green driver row on record."""
    hashes = hashes if hashes is not None else current_hashes()
    manifest = manifest if manifest is not None else load_manifest()
    from briefly_spark.queries import REGISTRY

    return sorted(
        n
        for n, h in hashes.items()
        if manifest.get(n, {}).get("hash") != h
        and not (n in REGISTRY and REGISTRY[n].expected_red)
    )


def check() -> int:
    from briefly_spark.queries import WINDOW_HEAD

    debt = gate_debt()
    uncovered = [n for n in debt if n not in WINDOW_HEAD]
    print(f"gate debt (current form never driver-gated): {len(debt)}")
    for n in debt:
        print(f"  {n}  [{'WINDOW_HEAD' if n in WINDOW_HEAD else 'UNCOVERED'}]")
    if uncovered:
        print(
            f"\nFAIL: {len(uncovered)} debt queries are NOT in WINDOW_HEAD — "
            "rotate them in or update the manifest: " + ", ".join(uncovered)
        )
        return 1
    print("OK: all gate debt is scheduled in WINDOW_HEAD")
    return 0


def update(round_n: int) -> int:
    path = f"CORRECTNESS_r{round_n:02d}.json"
    with open(path) as f:
        results = json.load(f)
    hashes = current_hashes()
    manifest = load_manifest()
    # prune retired queries: a stale manifest row would let a re-registered
    # query in exactly its last-gated form skip the WINDOW_HEAD scheduling
    # invariant despite having no recent driver row
    retired = [n for n in manifest if n not in hashes]
    for n in retired:
        del manifest[n]
    if retired:
        print(f"pruned retired queries from manifest: {retired}")
    recorded = 0
    for name, rec in results.items():
        if name not in hashes:
            continue  # retired query
        if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
            manifest[name] = {"hash": hashes[name], "round": round_n}
            recorded += 1
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {recorded} green hashes from {path} -> {MANIFEST}")
    return 0


if __name__ == "__main__":
    if "--update" in sys.argv:
        raise SystemExit(update(int(sys.argv[sys.argv.index("--update") + 1])))
    raise SystemExit(check())
