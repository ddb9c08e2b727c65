"""Above-sf0.1 correctness rung — the sweep the oracle-cost ladder
unblocks (VERDICT r14 what's-missing #2: "correctness evidence above
sf0.1"; the ladder + armed caps are its stated prerequisite).

Builds a K×-replicated corpus from sf0.1 (bench_scale's replication:
word-prefix-tagged documents, id-offset events/embeddings — hash
equality between Spark and DuckDB doesn't care that the text
distribution is synthetic, and disjoint id spaces keep every
deterministic tie rule meaningful), then runs the FULL check_oracle
value-hash compare against it.

Mirrors armed with a row cap (briefly_spark/oracle_guards.py,
operators/fuzzy.py) are excluded by detection, not by a hand list: any
oracle embedding ORACLE_ROW_CAP/SQL_BRUTE_FORCE_CAP would refuse at
K >= 2 by design — their completeness evidence is pinned at sf0.1 (the
ladder's policy), and this sweep reports them as CAPPED rather than
failing on the refusal.

Usage: python tools/oracle_sweep_large.py [K] [base_sf_dir] [query ...]
(default K=4 — an sf0.4-equivalent corpus, ~4x the largest driver-swept
input; K=10 is the sf1-equivalent rung when wall-clock allows)
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

from briefly_spark.queries import load_registry


def tier_switched(k: int, base: str) -> list[str]:
    """Queries whose Spark side auto-routes exact→approximate above a
    pair-product bound: above the crossover their results legitimately
    diverge from the exact-SQL oracle (recall < 1 is the DESIGN, the
    same class as a cap refusal), so the sweep must classify them as
    TIER_SWITCHED rather than run them into a spurious hash failure
    (r15 review finding).  The formulas mirror the in-query gates and
    are pinned against the real constants by
    tests/test_oracle_sweep_tiers.py."""
    from briefly_spark.catalog import table_rows
    from briefly_spark.operators.similarity import related_topk
    from briefly_spark.queries.search import _HYB_EXACT_MAX_PAIRS

    n = table_rows(base, "embeddings") * k
    related_bound = related_topk.__kwdefaults__["exact_max_pairs"]
    out = []
    if (n // 100 + 1) * n > _HYB_EXACT_MAX_PAIRS:  # q129's dense branch
        out.append("q129_hybrid_rrf")
    if (n // 20 + 1) * n > related_bound:  # q41's auto tier
        out.append("q41_related_articles")
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

    registry = load_registry()
    capped = sorted(
        name
        for name, spec in registry.items()
        if spec.oracle
        and ("ORACLE_ROW_CAP" in spec.oracle or "SQL_BRUTE_FORCE_CAP" in spec.oracle)
    )
    switched = tier_switched(k, base)
    # sf-pinned oracles compare at their own pinned dir regardless of the
    # sweep dir — check_oracle already downgrades them to rows-only here
    names = [
        n for n in (only or sorted(registry)) if n not in capped and n not in switched
    ]
    print(
        f"K={k}x {base}; {len(names)} queries; CAPPED (pinned at sf0.1): "
        f"{capped}; TIER_SWITCHED (exact gate exceeded at this K): {switched}"
    )

    from briefly_spark.session import get_spark
    from tools.bench_scale import build_replicated_dir

    out_dir = tempfile.mkdtemp(prefix=f"oracle_sweep_{k}x_")
    try:
        spark = get_spark("oracle_sweep_large")
        build_replicated_dir(spark, base, out_dir, k)
        spark.stop()  # check_oracle builds its own session; don't hold 2 JVMs
        return subprocess.call(
            [sys.executable, "tools/check_oracle.py", out_dir, *names]
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
