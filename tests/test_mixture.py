"""X138 capped waterfill mixture solver — hand-traced redistribution,
the four pinned guarantees (budget exactness, feasibility, uncapped
proportionality, budget monotonicity) under a hypothesis sweep, and the
plan-frame composition with q58's hash-stable sampler."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from briefly_spark.operators.mixture import (
    RATE_SCALE,
    mixture_plan,
    waterfill_mixture,
)


def test_hand_traced_cap_redistribution():
    # target 50/30/20 over budget 100, but 'a' only has 10: its unmet 40
    # redistributes 3:2 between b and c
    take = waterfill_mixture(
        {"a": 10, "b": 1000, "c": 1000}, {"a": 5, "b": 3, "c": 2}, 100
    )
    assert take == {"a": 10, "b": 54, "c": 36}
    assert sum(take.values()) == 100


def test_budget_exceeds_supply_takes_everything():
    avail = {"a": 3, "b": 7}
    assert waterfill_mixture(avail, {"a": 1, "b": 1}, 10**9) == avail


def test_zero_weight_sources_fill_only_after_weighted_exhaust():
    take = waterfill_mixture({"a": 5, "b": 100}, {"a": 1, "b": 0}, 20)
    assert take == {"a": 5, "b": 15}  # spill after 'a' runs dry


def test_rejects_negative_inputs():
    with pytest.raises(ValueError, match="negative"):
        waterfill_mixture({"a": -1}, {"a": 1}, 5)
    with pytest.raises(ValueError, match="budget"):
        waterfill_mixture({"a": 1}, {"a": 1}, -5)


@settings(max_examples=200, deadline=None)
@given(
    avail=st.dictionaries(
        st.sampled_from("abcdef"), st.integers(0, 500), min_size=1, max_size=6
    ),
    weights=st.dictionaries(
        st.sampled_from("abcdef"), st.integers(0, 9), max_size=6
    ),
    budget=st.integers(0, 2000),
)
def test_guarantees_hold(avail, weights, budget):
    take = waterfill_mixture(avail, weights, budget)
    assert set(take) == set(avail)
    assert all(0 <= take[s] <= avail[s] for s in avail)  # feasibility
    assert sum(take.values()) == min(budget, sum(avail.values()))  # exactness
    # uncapped proportionality within the integer rounding bound
    w = {s: weights.get(s, 0) for s in avail}
    uncapped = [s for s in avail if take[s] < avail[s] and w[s] > 0]
    if sum(take[s] for s in avail if w[s] == 0) == 0:  # no spill happened
        for i in uncapped:
            for j in uncapped:
                assert abs(take[i] * w[j] - take[j] * w[i]) <= (
                    (w[i] + w[j]) * len(avail)
                )
    # determinism
    assert waterfill_mixture(avail, weights, budget) == take


@settings(max_examples=100, deadline=None)
@given(
    avail=st.dictionaries(
        st.sampled_from("abcd"), st.integers(0, 200), min_size=1, max_size=4
    ),
    weights=st.dictionaries(st.sampled_from("abcd"), st.integers(0, 5), max_size=4),
    budget=st.integers(0, 500),
    extra=st.integers(1, 100),
)
def test_budget_monotonicity(avail, weights, budget, extra):
    lo = waterfill_mixture(avail, weights, budget)
    hi = waterfill_mixture(avail, weights, budget + extra)
    assert all(hi[s] >= lo[s] for s in avail)


def test_plan_frame_feeds_the_hash_stable_sampler(spark, sf_dir):
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table
    from briefly_spark.operators.textstats import mixture_accept

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    srcs = sorted(r["source"] for r in counts.collect())
    target = {s: i + 1 for i, s in enumerate(srcs)}
    plan = mixture_plan(spark, counts, target=target, budget=300)
    rows = {r["source"]: r for r in plan.collect()}
    assert sum(r["take"] for r in rows.values()) == min(
        300, sum(r["available"] for r in rows.values())
    )
    for r in rows.values():
        assert 0 <= r["rate_fp"] <= RATE_SCALE
    # the q58 composition: hash-stable accept at the solved rate lands
    # near the take (binomial noise), and is row-stable across runs
    sampled = docs.join(F.broadcast(plan), "source").filter(
        mixture_accept(F.col("doc_id"), F.col("rate_fp") / RATE_SCALE)
    )
    a, b = sampled.count(), sampled.count()
    assert a == b  # deterministic accept
    assert 0 < a <= sum(r["available"] for r in rows.values())
