"""Regenerate the q22 golden fixture (tests/fixtures/q22_chunks_sf001.parquet).

The recursive separator-aware chunker (operators/chunking.py:chunk_text) is
pure and deterministic but not SQL-expressible, so its oracle is a
precomputed golden parquet: the exact (doc_id, pos, chunk) output over
/root/testdata/sf0.01.  The driver's correctness gate runs at sf=0.01, so
fixture equality there pins the full observable behavior; the algorithm
itself is additionally verified against hand-computed cases in
tests/test_text_ops.py (which is what keeps the fixture from being
self-fulfilling — regenerate it only when those golden tests pass).

Usage: python tools/make_q22_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "q22_chunks_sf001.parquet",
)


def main() -> None:
    from briefly_spark.queries import load_registry
    from briefly_spark.session import get_spark

    spark = get_spark("make_q22_fixture")
    df = load_registry()["q22_chunk_recursive"].fn(spark, "/root/testdata/sf0.01")
    rows = sorted((r.doc_id, r.pos, r.chunk) for r in df.collect())
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "pos": pa.array([r[1] for r in rows], pa.int32()),
            "chunk": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    pq.write_table(table, FIXTURE)
    print(f"wrote {len(rows)} rows to {FIXTURE}")


if __name__ == "__main__":
    main()
