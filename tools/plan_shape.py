"""Plan-shape regression guard — the committed physical-plan signature
of every registered query, diffed round-over-round.

plan_lint polices plan HYGIENE (the closed class of anti-patterns);
this tool pins plan SHAPE: the operator-count signature of each query's
physical plan (exchanges, join strategies, scans, aggregates, Python
eval nodes, sorts, windows).  An edit that silently turns a broadcast
join into a sort-merge join, adds a shuffle, or drops a scan past the
lint's radar shows up here as a diff against the committed manifest —
the "is this still the plan you'd want" review, mechanized.

Usage:
  python tools/plan_shape.py [sf_dir] [--update] [query ...]

Default mode recomputes every signature at sf_dir (default sf0.001 —
signatures are pinned at ONE fixed SF; AQE runtime re-plans don't show
in the pre-execution plan, so the signature is deterministic) and diffs
against tools/plan_shapes.json, exit 1 on any change with a per-query
before/after table.  ``--update`` rewrites the manifest — the reviewed
way to accept an intentional plan change, same discipline as
gate_debt --update.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")

from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark

MANIFEST = os.path.join(os.path.dirname(__file__), "plan_shapes.json")

#: the operators that define a plan's shape; counted per plan
OPS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "TakeOrderedAndProject",
    "Expand",
    "Generate",
    "FileScan",
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)

#: "Sort [...], true," = global sort; counted separately from local sorts
_GLOBAL_SORT = re.compile(r"\bSort \[.*\], true,")


def signature(plan: str) -> dict[str, int]:
    sig = {op: plan.count(op) for op in OPS}
    sig["GlobalSort"] = len(_GLOBAL_SORT.findall(plan))
    return {k: v for k, v in sig.items() if v}


def compute(sf_dir: str, only: set[str]) -> dict[str, dict[str, int]]:
    registry = load_registry()
    spark = get_spark("plan_shape")
    out: dict[str, dict[str, int]] = {}
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = signature(plan)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--update"]
    update = "--update" in sys.argv
    sf_dir = args[0] if args and os.path.sep in args[0] else "/root/testdata/sf0.001"
    only = set(a for a in args if os.path.sep not in a)
    got = compute(sf_dir, only)
    if update:
        manifest = {}
        if os.path.exists(MANIFEST):
            manifest = json.load(open(MANIFEST))
        manifest.update(got)
        json.dump(manifest, open(MANIFEST, "w"), indent=1, sort_keys=True)
        print(f"wrote {len(got)} signatures -> {MANIFEST}")
        return 0
    if not os.path.exists(MANIFEST):
        print(f"no manifest at {MANIFEST} — run with --update first")
        return 2
    want = json.load(open(MANIFEST))
    changed = 0
    for name, sig in got.items():
        old = want.get(name)
        if old is None:
            print(f"NEW   {name}: {sig} (not in manifest — run --update)")
            changed += 1
        elif old != sig:
            delta = {
                k: (old.get(k, 0), sig.get(k, 0))
                for k in sorted(set(old) | set(sig))
                if old.get(k, 0) != sig.get(k, 0)
            }
            print(f"DIFF  {name}: {delta}")
            changed += 1
        else:
            print(f"ok    {name}")
    print(f"\n{changed} plan-shape changes" if changed else "\nall plan shapes match")
    return 1 if changed else 0


if __name__ == "__main__":
    raise SystemExit(main())
