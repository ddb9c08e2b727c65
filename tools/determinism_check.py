"""Cross-partitioning determinism sweep — the engine property the oracle
gate does NOT test: every registered query's hashed surface must be
IDENTICAL under different physical partitionings (the driver compares
Spark vs DuckDB at one partitioning; an order-dependent bug — a first()
without ordering, a float sum on the hashed surface, a row_number tie
without a full tie-break — can agree there and still flap across
cluster layouts).

Runs every query twice (spark.sql.shuffle.partitions = 32 then 7, plus a
repartitioned input via catalog.spread's normal path) and compares the
check_oracle value fingerprint.  Exit nonzero on any divergence.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark
from tools.check_oracle import table_fingerprint


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_registry()
    spark = get_spark("determinism_check")

    failures = []
    n = 0
    for name, spec in registry.items():
        if only and name not in only:
            continue
        if spec.expected_red:
            continue
        n += 1
        t0 = time.time()
        fps = []
        try:
            for parts in ("32", "7"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                df = spec.fn(spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                fps.append(table_fingerprint(df.columns, rows))
                spark.catalog.clearCache()
        except Exception as e:  # pragma: no cover - surfaced as failure
            failures.append((name, f"error: {e}"))
            print(f"ERROR {name}: {e}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        (n1, c1, h1), (n2, c2, h2) = fps
        if (n1, c1, h1) != (n2, c2, h2):
            failures.append((name, f"32p={n1}/{h1} vs 7p={n2}/{h2}"))
            print(f"DIVERGE {name}: 32p rows={n1} hash={h1}  7p rows={n2} hash={h2}")
        else:
            print(f"OK    {name}: {n1} rows, hash {h1} in {time.time()-t0:.1f}s")

    print(f"\n{n - len(failures)}/{n} queries partition-deterministic")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
