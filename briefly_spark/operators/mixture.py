"""Capped mixture-weight solver (X138) — the "production mixture
solver" q58's resampler defers to: given per-source AVAILABILITY
(tokens or docs on hand), a TARGET distribution, and a total BUDGET,
compute the per-source take — the classic waterfill with caps (a source
can't supply more than it has; its unmet share redistributes
proportionally among the sources that still have headroom).  The
output feeds q58's hash-stable accept path (rate = take/available) and
q59's packing budget.

Exact integer arithmetic end to end:

- takes are integers; each waterfill round assigns
  ``floor(B_rem · p_i / P_rem)`` to every uncapped source, caps any
  source that would exceed its availability, and repeats — at most
  |sources| rounds (each round caps ≥ 1 source or terminates).
- the sub-unit remainder of the final round distributes by largest
  remainder, ties on source name ASC — a total deterministic order, so
  the solve is engine- and platform-exact (no floats anywhere).

Guarantees (pytest-pinned, incl. a hypothesis property sweep):
  Σ take = min(budget, Σ available)        (budget exactness)
  take_i ≤ available_i                      (feasibility)
  uncapped takes proportional to target within the integer
  rounding bound (|take_i·p_j − take_j·p_i| bounded by p_i+p_j)
  budget monotonicity: growing the budget never shrinks any take

Scale: the solve is driver-side on the SOURCES-bounded frame (the same
class as every mixture/quota op here — q114's quota frame, DSIR's
feature table): thousands of rows, collected once.  The corpus is only
touched by the downstream accept/pack stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: fixed-point scale for the emitted per-source accept rate
RATE_SCALE = 1_000_000


def waterfill_mixture(
    available: dict[str, int], target: dict[str, int], budget: int
) -> dict[str, int]:
    """The pure solver (see module doc).  ``target`` weights are
    arbitrary non-negative integers (only proportions matter); sources
    missing from ``target`` get weight 0.  Raises on negative inputs."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    for d, what in ((available, "available"), (target, "target")):
        bad = {k: v for k, v in d.items() if v < 0}
        if bad:
            raise ValueError(f"negative {what}: {bad}")
    take = {s: 0 for s in available}
    remaining = {s: available[s] for s in available}
    weight = {s: target.get(s, 0) for s in available}
    b_rem = min(budget, sum(available.values()))
    while b_rem > 0:
        live = [s for s in available if remaining[s] > 0 and weight[s] > 0]
        if not live:
            # no weighted source has headroom; spill to unweighted ones
            live = [s for s in available if remaining[s] > 0]
            if not live:
                break
            w = {s: 1 for s in live}
        else:
            w = {s: weight[s] for s in live}
        p_rem = sum(w.values())
        shares = {s: (b_rem * w[s]) // p_rem for s in live}
        rems = {s: (b_rem * w[s]) % p_rem for s in live}
        # largest-remainder distribution of the floor loss, ties name ASC
        leftover = b_rem - sum(shares.values())
        for s in sorted(live, key=lambda s: (-rems[s], s))[:leftover]:
            shares[s] += 1
        capped = False
        for s in live:
            give = min(shares[s], remaining[s])
            if give < shares[s]:
                capped = True
            take[s] += give
            remaining[s] -= give
            b_rem -= give
        if not capped:
            break  # every share landed in full — budget spent exactly
    return take


def mixture_plan(
    spark: SparkSession,
    counts: DataFrame,
    *,
    target: dict[str, int],
    budget: int,
    source_col: str = "source",
    n_col: str = "n",
) -> DataFrame:
    """The solver as a plan frame: collect the SOURCES-bounded counts,
    solve, and return (source, available, take, rate_fp) where
    ``rate_fp = floor(take · RATE_SCALE / available)`` is the fixed-point
    accept rate q58's hash-stable sampler consumes.  Empty sources get
    rate 0."""
    avail = {
        r[source_col]: int(r[n_col]) for r in counts.select(source_col, n_col).collect()
    }
    take = waterfill_mixture(avail, target, budget)
    rows = sorted(
        (
            s,
            avail[s],
            take[s],
            (take[s] * RATE_SCALE) // avail[s] if avail[s] else 0,
        )
        for s in avail
    )
    return spark.createDataFrame(
        rows, schema=f"{source_col} STRING, available BIGINT, take BIGINT, rate_fp BIGINT"
    )
