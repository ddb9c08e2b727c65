"""tools/plan_shape.py — signature extraction units, and a sampled
live-vs-manifest check (the full 149-plan diff is the tool's job; the
test keeps a representative cross-section pinned in the suite so a
shape-changing edit fails CI before the tool runs)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from tools.plan_shape import MANIFEST, OPS, signature


def test_signature_counts_and_global_sort():
    plan = """*(2) HashAggregate(keys=[a], functions=[sum(b)])
+- Exchange hashpartitioning(a, 32)
   +- *(1) HashAggregate(keys=[a], functions=[partial_sum(b)])
      +- Sort [a ASC NULLS FIRST], true, 0
         +- Sort [a ASC NULLS FIRST], false, 0
            +- FileScan parquet [a,b]"""
    sig = signature(plan)
    assert sig["HashAggregate"] == 2
    assert sig["Exchange hashpartitioning"] == 1
    assert sig["FileScan"] == 1
    assert sig["GlobalSort"] == 1  # only the `true` sort counts
    assert "Window" not in sig  # zero counts are dropped


def test_manifest_covers_registry_and_sample_matches(spark, sf_dir):
    from briefly_spark.queries import load_registry

    reg = load_registry()
    manifest = json.load(open(MANIFEST))
    assert set(manifest) == set(reg), (
        "plan_shapes.json out of sync with the registry — run "
        "tools/plan_shape.py --update"
    )
    # live check on a cross-section: a broadcast join, a window top-k, a
    # Python-surface query, and the newest registration
    sample = (
        "q03_revenue_by_nation",
        "q02_topk_orders_per_customer",
        "q148_unigram_tokenizer",
    )
    for name in sample:
        plan = reg[name].fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert signature(plan) == manifest[name], (
            f"{name}: plan shape drifted from the committed signature — "
            f"review the plan, then tools/plan_shape.py --update {name}"
        )
    # every signature uses only known op keys
    known = set(OPS) | {"GlobalSort"}
    for name, sig in manifest.items():
        assert set(sig) <= known, name
