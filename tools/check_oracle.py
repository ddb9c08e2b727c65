"""Local mirror of the driver's correctness gate (see __spark_entry__.py).

Runs every registered query on Spark and its oracle SQL on DuckDB at the
given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
string form).  Exit nonzero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

from briefly_spark.catalog import TABLES, table_path
from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark

def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_registry()
    spark = get_spark("check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):
            # replicated/warehouse layout (oracle_sweep_large, bucketed
            # writers): a directory of part files — DuckDB needs the glob
            p = os.path.join(p, "**", "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    attempted = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            s_fp = table_fingerprint(scols, [tuple(r) for r in srows])
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            # per-query persisted frames must not pile up across the sweep
            spark.catalog.clearCache()
        sf_pinned_elsewhere = (
            spec.oracle_sf is not None
            and spec.oracle_sf != sf_dir.rstrip("/").rsplit("/", 1)[-1]
        )
        if spec.oracle is None or sf_pinned_elsewhere:
            tag = "sf-pinned " if sf_pinned_elsewhere else "rows-only"
            print(f"{tag}  {name}: {s_fp[0]} rows in {time.time()-t0:.1f}s")
            if s_fp[0] == 0:
                failures.append(name)
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            # Output-surface type audit: DuckDB widens sum(BIGINT) to
            # HUGEINT, which round-trips as int through the native fetch
            # below but as Decimal/float64 through Arrow/pandas — the r05
            # driver-red mechanism.  A hashed surface must stick to
            # engine-primitive types or the gate result depends on the
            # fetch path, so flag it HERE even though the local hash
            # would pass.
            desc = con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
            widened = [
                (r[0], r[1])
                for r in desc
                if any(b in r[1] for b in ("HUGEINT", "DECIMAL", "UBIGINT"))
            ]
            if widened and not spec.expected_red:
                failures.append(name)
                print(f"FAIL  {name}: non-primitive oracle output type {widened}")
                continue
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            d_fp = table_fingerprint(dcols, drows)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if s_fp == d_fp:
            print(f"OK    {name}: {s_fp[0]} rows, hash {s_fp[2]} in {time.time()-t0:.1f}s")
        else:
            failures.append(name)
            print(f"FAIL  {name}: spark={s_fp} duckdb={d_fp}")
            # show a tiny diff sample
            s_set = {
                "\x01".join(
                    norm_cell(t[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])
                )
                for t in (tuple(r) for r in srows)
            }
            d_set = {
                "\x01".join(
                    norm_cell(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                )
                for r in drows
            }
            for line in list(s_set - d_set)[:3]:
                print(f"      spark-only: {line!r}")
            for line in list(d_set - s_set)[:3]:
                print(f"      duck-only : {line!r}")

    subset = f" (subset of {len(registry)})" if only else ""
    print(f"\n{attempted - len(failures)}/{attempted} queries OK{subset}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
