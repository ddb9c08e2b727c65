"""Capture ``explain("formatted")`` for named queries to files — the
optimization round's plan evidence (plans/r<N>/<query>_{before,after}.txt).

Usage: python tools/capture_plan.py --out DIR --tag before|after \
           [--sf DIR] query [query ...]

Plans are captured at sf0.001 by default (plan_shape.py discipline:
signatures are SF-independent pre-execution plans; the tiny SF keeps any
eager materialization inside the query function cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    out_dir = "plans/r15"
    tag = "before"
    sf_dir = "/root/testdata/sf0.001"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    os.makedirs(out_dir, exist_ok=True)
    registry = load_registry()
    spark = get_spark("capture_plan")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
