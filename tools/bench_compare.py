"""Round-over-round bench comparison — the movers table, mechanized.

Every round the builder (and the judge) compares a fresh bench pair to
the previous round's driver run: min-of-pair per query, shared-query
totals, the worst movers, the biggest improvements.  This tool makes
that computation one command instead of ad-hoc python, and bakes in the
documented ambient-band policy (BENCH_NOTES): a mover only counts as a
FINDING when its min-of-pair exceeds the band (default 1.5×) AND its
absolute cost is material (default ≥ 2 s) — sub-2 s queries flap with
host state, and a single-run reading is never evidence by itself
(q89 r10, q44 r11: both "drifts" settled ambient on a min-of-2 cell).

Usage:
  python tools/bench_compare.py RUN_A.json [RUN_B.json ...] BASELINE.json

The LAST argument is the baseline (a driver BENCH_r{N}.json or a bench
output); all earlier arguments form the pair/min-of-N.  Accepts both
the driver's wrapper shape ({"parsed": {"queries": ...}} with short
keys like "q01") and bench.py's own output ({"queries": ...} with full
names); keys are normalized to the short form.  Exit 1 when findings
remain after the band filter — wire-able into a round checklist."""

from __future__ import annotations

import json
import sys

BAND = 1.5      # min-of-pair ratio above which a mover is a finding
MIN_ABS = 2.0   # seconds — below this, host flap dominates

#: pipeline gates (multi-stage warehouse drains — bench.py:PIPELINE_GATES,
#: short keys): totalled separately so the comparable PLAN headline isn't
#: dominated by drain host-sensitivity (VERDICT r11 next-round #5)
GATES = {"q120", "q128"}


def _queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    q = d.get("queries") or d.get("parsed", {}).get("queries")
    if not q:
        raise SystemExit(f"{path}: no queries dict found")
    # bench.py records -1.0 for an errored query — surface it, never fold
    # it into totals/min-of-pair (a negative would silently deflate the
    # headline ratios and top the improvements table)
    bad = sorted(k for k, v in q.items() if float(v) < 0)
    if bad:
        print(f"{path}: errored queries excluded: {bad}")
    return {k.split("_")[0]: float(v) for k, v in q.items() if float(v) >= 0}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    *runs, base_path = sys.argv[1:]
    pair = [_queries(p) for p in runs]
    base = _queries(base_path)
    minp = {
        k: min(r[k] for r in pair if k in r)
        for k in set().union(*pair)
        if any(k in r for r in pair)
    }
    shared = sorted(k for k in minp if k in base)
    tot_new = sum(minp[k] for k in shared)
    tot_old = sum(base[k] for k in shared)
    print(f"runs: {len(pair)}  queries: {len(minp)}  shared with baseline: {len(shared)}")
    print(f"shared total  min-of-pair {tot_new:.1f} s  vs baseline {tot_old:.1f} s"
          f"  = {tot_new / tot_old:.2f}x")
    plan = [k for k in shared if k not in GATES]
    gate = [k for k in shared if k in GATES]
    pn, po = sum(minp[k] for k in plan), sum(base[k] for k in plan)
    print(f"  plan queries ({len(plan)}): {pn:.1f} s vs {po:.1f} s"
          f" = {pn / po:.2f}x" if po else "  plan queries: n/a")
    if gate:
        gn, go = sum(minp[k] for k in gate), sum(base[k] for k in gate)
        print(f"  pipeline gates ({sorted(gate)}): {gn:.1f} s vs {go:.1f} s"
              f" = {gn / go:.2f}x (host-sensitive drains — informational)")
    movers = sorted(
        ((k, minp[k] / base[k]) for k in shared if base[k] > 0.05),
        key=lambda kv: -kv[1],
    )
    print("\nworst movers (min-of-pair / baseline):")
    for k, r in movers[:8]:
        print(f"  {k:6s} x{r:5.2f}   {base[k]:7.2f} -> {minp[k]:7.2f} s")
    print("biggest improvements:")
    for k, r in movers[-5:]:
        print(f"  {k:6s} x{r:5.2f}   {base[k]:7.2f} -> {minp[k]:7.2f} s")
    findings = [
        (k, r) for k, r in movers if r > BAND and minp[k] >= MIN_ABS
    ]
    print(
        f"\nfindings (>{BAND}x AND >= {MIN_ABS}s min-of-pair): "
        f"{[(k, round(r, 2)) for k, r in findings] or 'none'}"
    )
    only_new = sorted(k for k in minp if k not in base)
    if only_new:
        print(f"new queries (no baseline): "
              f"{[(k, round(minp[k], 2)) for k in only_new]}")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
