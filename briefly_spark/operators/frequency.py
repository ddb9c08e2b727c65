"""Frequency-sketch operators — bounded-memory heavy-hitter candidate
generation (Misra–Gries) shared by the batch query (queries/analytics.py
q28) and the streaming accumulator (streaming/incremental.py
heavy_hitter_stream).

Guarantee that makes the two-pass design exact: an MG summary with k
counters undercounts any term by at most N_stream/k for the stream it
saw.  Each token belongs to exactly ONE partition of ONE batch, so
merging summaries by plain count-sum keeps the total undercount ≤ N/k
over the whole corpus — however many partitions or micro-batches it
arrived in.  With k ≥ 2/φ, any term of global frequency ≥ φ·N retains a
positive merged count, so the merged candidate set is a superset of
every true heavy hitter and an exact counting pass restricted to it
(broadcast semi-join) returns the EXACT heavy-hitter set, independent
of partitioning and batch boundaries.
"""

from __future__ import annotations

#: default heavy-hitter threshold denominator: heavy = freq ≥ N / PHI_DEN
PHI_DEN = 100
#: per-partition summary size; k ≥ 2/φ ⇒ merged candidates ⊇ heavy hitters
MG_K = 2 * PHI_DEN


def mg_partition(frame_iter):
    """Misra–Gries summary of one partition's ``term`` stream (MG_K
    counters), Arrow-batched.  Emits (term, cnt) lower-bound rows plus
    ONE sentinel row (term NULL) carrying the partition's total token
    count, so the global N needs no separate corpus scan."""
    import pandas as pd

    counters: dict[str, int] = {}
    n_seen = 0
    for pdf in frame_iter:
        n_seen += len(pdf)
        for term in pdf["term"]:
            if term in counters:
                counters[term] += 1
            elif len(counters) < MG_K:
                counters[term] = 1
            else:
                dead = [t for t, c in counters.items() if c == 1]
                for t in counters:
                    counters[t] -= 1
                for t in dead:
                    del counters[t]
    yield pd.DataFrame(
        {
            "term": list(counters) + [None],
            "cnt": list(counters.values()) + [n_seen],
        }
    )
