"""X149 grouped standing top-k — per-group fold ≡ one-shot (the X139
semilattice argument within each group), the per-id crowd-out hazard in
the grouped form, resolve-as-compactor stability, the pure-Python
reference, and the no-global-sort plan."""

from __future__ import annotations

import random

import pytest

from briefly_spark.operators.sketches import (
    topk_batch_grouped,
    topk_registry_resolve_grouped,
)

K = 4


def _rows(seed: int, n: int = 400):
    random.seed(seed)
    return [
        (
            random.choice(["s1", "s2", "s3"]),
            random.randint(0, 60),  # ids collide across batches on purpose
            random.randint(0, 999),
        )
        for _ in range(n)
    ]


def _py_topk(rows):
    """Independent reference: best score per (group, id), then per-group
    head under (score DESC, id ASC)."""
    best: dict[tuple[str, int], int] = {}
    for g, i, s in rows:
        if best.get((g, i), -1) < s:
            best[(g, i)] = s
    out = []
    for g in sorted({g for g, _, _ in rows}):
        members = sorted(
            ((s, i) for (gg, i), s in best.items() if gg == g),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        out += [(g, i, s) for s, i in members]
    return sorted(out)


def test_fold_equals_oneshot_and_reference(spark):
    rows = _rows(seed=21)
    whole = spark.createDataFrame(rows, "g STRING, id LONG, score LONG")
    oneshot = sorted(
        (r["g"], r["id"], r["score"])
        for r in topk_registry_resolve_grouped(
            topk_batch_grouped(
                whole, group_cols=["g"], score_col="score", id_col="id",
                k=K, batch_id=0,
            ),
            group_cols=["g"], score_col="score", id_col="id", k=K,
        ).collect()
    )
    assert oneshot == _py_topk(rows)
    reg = None
    for b, (lo, hi) in enumerate(((0, 130), (130, 260), (260, 400))):
        block = topk_batch_grouped(
            spark.createDataFrame(rows[lo:hi], "g STRING, id LONG, score LONG"),
            group_cols=["g"], score_col="score", id_col="id", k=K, batch_id=b,
        )
        reg = block if reg is None else reg.unionByName(block)
    folded = sorted(
        (r["g"], r["id"], r["score"])
        for r in topk_registry_resolve_grouped(
            reg, group_cols=["g"], score_col="score", id_col="id", k=K
        ).collect()
    )
    assert folded == oneshot  # exact, not approximate
    # resolve is the compactor: re-blocking the result and re-resolving
    # is bit-stable
    from pyspark.sql import functions as F

    compacted = topk_registry_resolve_grouped(
        reg, group_cols=["g"], score_col="score", id_col="id", k=K
    ).select(F.lit(-1).cast("long").alias("batch_id"), "*")
    assert sorted(
        (r["g"], r["id"], r["score"])
        for r in topk_registry_resolve_grouped(
            compacted, group_cols=["g"], score_col="score", id_col="id", k=K
        ).collect()
    ) == oneshot


def test_grouped_crowd_out_hazard_closed(spark):
    """X139's regression case, per group: duplicates of one id inside a
    batch must not crowd a distinct id out of that group's block."""
    rows = [("g", 1, 100), ("g", 1, 99), ("g", 1, 98), ("g", 1, 97), ("g", 2, 50)]
    block = topk_batch_grouped(
        spark.createDataFrame(rows, "g STRING, id LONG, score LONG"),
        group_cols=["g"], score_col="score", id_col="id", k=2, batch_id=0,
    )
    got = sorted((r["id"], r["score"]) for r in block.collect())
    assert got == [(1, 100), (2, 50)]  # id 2 survives; dup scores don't crowd


def test_rejects_empty_groups_and_plans_without_global_sort(spark):
    df = spark.createDataFrame([("g", 1, 1)], "g STRING, id LONG, score LONG")
    with pytest.raises(ValueError, match="global form"):
        topk_batch_grouped(
            df, group_cols=[], score_col="score", id_col="id", k=1, batch_id=0
        )
    plan = (
        topk_batch_grouped(
            df, group_cols=["g"], score_col="score", id_col="id", k=1, batch_id=0
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan, plan  # per-group rank, not TakeOrdered
    assert "Exchange rangepartitioning" not in plan, plan  # no global sort
