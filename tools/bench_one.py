"""Isolated single-query timing — the optimization round's inner loop.

Runs the named queries in ONE fresh session: a warmup pass at sf0.001
(JIT/codegen/Arrow init, same as bench.py), then ``--reps`` timed runs
each at the target sf dir with the noop sink (guide §1.4) and a
clearCache between reps (bench.py discipline: every timing starts from
a clean cache).  Prints per-rep wall times and the min — the number to
compare against the pair-min bench reading.

Usage: python tools/bench_one.py [--sf DIR] [--reps N] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    registry = load_registry()
    for n in names:
        if n not in registry:
            full = [k for k in registry if k.startswith(n)]
            if len(full) != 1:
                raise SystemExit(f"unknown query {n!r} (matches: {full})")
            names[names.index(n)] = full[0]

    spark = get_spark("bench_one")
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        registry[name].fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
    for name in names:
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min {min(times):.3f}s  reps {times}")


if __name__ == "__main__":
    main()
