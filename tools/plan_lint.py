"""Plan hygiene lint — scan every registered query's physical plan for
scale anti-patterns, so the 100 TB design claims are checked mechanically,
not per-query by hand:

- ``CartesianProduct``: an unconditioned cross join (a broadcast nested
  loop against a 1-row stats frame is fine; a cartesian is not).
- ``BatchEvalPython``: a row-at-a-time (non-Arrow) Python UDF in the plan
  — everything Python-side must be Arrow-batched (``ArrowEvalPython`` /
  ``mapInPandas``/``FlatMapGroupsInPandas``... nodes).
- ``Sort`` with ``global=true`` feeding anything but a bounded
  ``TakeOrderedAndProject``/limit: a whole-dataset global sort.
- ``Window`` with an EMPTY partition spec: the whole input collapses to a
  single task (windows cannot be skew-split), so this is only acceptable
  on provably dimension-bounded frames (a vocab aggregate, a per-day
  frame) — each instance must be allow-listed with the frame-size reason.

Known, documented exceptions are allow-listed per query with the reason —
an exception without a live plan hit fails too (stale allowlist).

Usage: python tools/plan_lint.py [sf_dir] [query ...]; exit 1 on violation.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark

#: query -> {problem prefix -> reason}.  Every entry must match a live hit
#: (a stale allowlist entry fails the lint too).
ALLOW: dict[str, dict[str, str]] = {
    # Ordered DIMENSION outputs (W6, the reference's sorted source/topic
    # lists): the sort runs on a post-aggregation frame of dimension size
    # (tens of rows), not the corpus — a global sort there is the point.
    "q06_distinct_segments": {"global Sort": "dimension-sized post-agg output order"},
    "q23_doc_source_dims": {"global Sort": "dimension-sized post-agg output order"},
    # Unpartitioned windows on provably dimension-bounded frames (VERDICT
    # r05 #3): each runs over an aggregate whose row count is bounded by a
    # dimension, not the corpus — corpus-sized inputs never reach them.
    "q101_winsorize_lengths": {
        "unpartitioned Window": "value-histogram frame (distinct doc lengths), "
        "prefix-sum for the winsorize percentile cut"
    },
    "q102_peak_concurrency": {
        "unpartitioned Window": "per-day net-change frame (|days| rows), "
        "running concurrency prefix-sum"
    },
    "q119_rank_fusion": {
        "unpartitioned Window": "per-signal value-histogram frames, "
        "sort-free Borda rank via prefix-sum"
    },
    "q88_vocab_encode": {
        "unpartitioned Window": "vid ranking runs on the ALREADY-LIMITED "
        "top-V frame (V rows by construction)"
    },
    "q136_heaps_vocab_growth": {
        "unpartitioned Window": "checkpoint frame (B=20 doc_id-range "
        "buckets) — prefix sums + lag on 20 rows"
    },
    "q137_zipf_rank_curve": {
        "unpartitioned Window": "rank/lag run on the ALREADY-LIMITED "
        "top-K frame (K=1024 rows by construction)"
    },
    "q139_vocab_coverage": {
        "unpartitioned Window": "count-class histogram frame "
        "(<= ~sqrt(2*corpus-mass) rows — q119's value-histogram bound)"
    },
}


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line (nested brackets folded)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
    return groups


def _is_unpartitioned_window(line: str) -> bool:
    """True when a ``Window`` plan line has an empty partition spec.

    The toString shapes are ``Window [exprs], [part], [order]``,
    ``Window [exprs], [part]``, ``Window [exprs], [order]`` (unpartitioned
    but ordered) and ``Window [exprs]`` (neither) — a 2-group line is
    unpartitioned iff its second group is an ORDER spec (every order entry
    carries an ASC/DESC direction; partition entries never do)."""
    groups = _bracket_groups(line.split("Window", 1)[1])
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC" in groups[1] or " DESC" in groups[1]
    return True


def lint_plan(plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct (unconditioned cross join)")
    if "BatchEvalPython" in plan:
        problems.append("BatchEvalPython (row-at-a-time Python UDF — use Arrow)")
    # global sorts: Sort [..], true, ... (second arg is the global flag);
    # a bounded top-k plans as TakeOrderedAndProject, never a global Sort
    for line in plan.splitlines():
        if re.search(r"\bSort (\[.*\]), true,", line):
            problems.append(f"global Sort: {line.strip()[:100]}")
        if re.search(r"\bWindow \[", line) and _is_unpartitioned_window(line):
            problems.append(f"unpartitioned Window: {line.strip()[:100]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_registry()
    spark = get_spark("plan_lint")

    bad = 0
    used_allow: set[tuple[str, str]] = set()
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        remaining = []
        for p in lint_plan(plan):
            allowed = next(
                (pref for pref in ALLOW.get(name, {}) if p.startswith(pref)), None
            )
            if allowed:
                used_allow.add((name, allowed))
            else:
                remaining.append(p)
        if remaining:
            bad += 1
            for p in remaining:
                print(f"LINT  {name}: {p}")
        else:
            print(f"ok    {name}")
    if not only:
        stale = {
            (n, pref) for n, prefs in ALLOW.items() for pref in prefs
        } - used_allow
        for n, pref in stale:
            print(f"STALE allowlist entry: {n}: {pref} ({ALLOW[n][pref]})")
        if stale:
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
