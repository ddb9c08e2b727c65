"""Oracle-cost ladder — times the DUCKDB side of every registered mirror
alone, across SF dirs, and reports per-mirror growth exponents (VERDICT
r14 next-round #3: the q37 brute-force cap, generalized).

The correctness gate's cost has two halves; bench.py measures the Spark
half, but several DuckDB mirrors are DELIBERATELY naive (brute-force
pair joins, unrolled iterative CTE chains, exact percentile audits) —
that is what makes them trustworthy oracles and ALSO what makes some of
them super-linear in SF.  Before anyone runs a sweep above sf0.1, this
tool answers: which mirrors can follow, which must switch to the
committed-evidence pin strategy (operators/fuzzy.py:SQL_BRUTE_FORCE_CAP
pattern — the mirror refuses loudly above a row cap, completeness pins
at the largest swept SF + pytest references).

Usage:
  python tools/oracle_cost.py                 # all mirrors, sf0.001+sf0.01
  python tools/oracle_cost.py --sf 0.001 0.01 0.1 --min-sec 1.0
  python tools/oracle_cost.py --sf 0.001 0.01 0.1 q37_dup_clusters ...

Prints one row per mirror: time at each SF, the fitted exponent of
t ~ SF^e over the measured rungs (least-squares in log space), and the
naive sf1 extrapolation t(max_sf)·10^e per remaining decade.  Exit 0
always — this is a measurement tool; policy (caps) lives in the
operators and BENCH_NOTES.
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from briefly_spark.catalog import TABLES, table_path
from briefly_spark.queries import load_registry


def time_oracle(sql: str, sf_dir: str, repeat: int = 1) -> float:
    """Best-of-``repeat`` wall seconds for the oracle on a fresh
    connection (no cross-query buffer reuse — each gate query in a sweep
    pays its own scan too)."""
    best = math.inf
    for _ in range(repeat):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
            )
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
        con.close()
    return best


def fit_exponent(sfs: list[float], times: list[float]) -> float:
    """Least-squares slope of log(t) vs log(sf) over the measured rungs."""
    xs = [math.log(s) for s in sfs]
    ys = [math.log(max(t, 1e-3)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return float("nan")
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="subset of registry names")
    ap.add_argument(
        "--sf", nargs="+", type=float, default=[0.001, 0.01],
        help="SF rungs to time (each needs /root/testdata/sf{sf})",
    )
    ap.add_argument(
        "--min-sec", type=float, default=0.0,
        help="only print mirrors whose largest-rung time exceeds this",
    )
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    registry = load_registry()
    only = set(args.queries)
    rungs = sorted(args.sf)
    dirs = {sf: f"/root/testdata/sf{sf:g}" for sf in rungs}

    rows = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        times: list[float] = []
        err = None
        for sf in rungs:
            if spec.oracle_sf is not None and spec.oracle_sf != f"sf{sf:g}":
                err = f"sf-pinned to {spec.oracle_sf}"
                break
            try:
                times.append(time_oracle(spec.oracle, dirs[sf], args.repeat))
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                err = f"{type(e).__name__}: {str(e)[:90]}"
                break
        if err is not None:
            rows.append((name, times, None, err))
            continue
        if times[-1] < args.min_sec:
            continue
        exp = fit_exponent(rungs[: len(times)], times) if len(times) > 1 else None
        rows.append((name, times, exp, None))

    hdr = "  ".join(f"t(sf{sf:g})" for sf in rungs)
    print(f"{'query':38s} {hdr}  exp   sf1-extrap")
    rows.sort(key=lambda r: -(r[1][-1] if r[1] else 0))
    for name, times, exp, err in rows:
        ts = "  ".join(f"{t:8.2f}" for t in times).ljust(10 * len(rungs))
        if err:
            print(f"{name:38s} {ts}  -     {err}")
            continue
        if exp is None:
            print(f"{name:38s} {ts}  -")
            continue
        decades = math.log10(1.0 / rungs[len(times) - 1])
        extrap = times[-1] * (10 ** (exp * decades))
        print(f"{name:38s} {ts}  {exp:4.2f}  {extrap:10.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
