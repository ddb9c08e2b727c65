"""Data-layout expression builders — z-order (Morton) interleaving as
pure integer arithmetic, emitted for both the Spark and DuckDB dialects
from one generator so layout audits (queries/scale.py q98) and the
write path (storage.Warehouse.write_zorder) share one definition.

Why arithmetic instead of shift/bit builtins: ``div``/``%``/``*`` with
power-of-two constants are defined identically in every SQL engine,
while shift operators and bit functions drift by dialect.  Every
expression here is engine-exact.
"""

from __future__ import annotations


def z_interleave_sql(bucket_exprs: list[str], dialect: str, bits: int = 8) -> str:
    """Bit-interleaved z-value of N ``bits``-wide bucket ids.

    Bit ``i`` of dimension ``d`` lands at position ``i*N + (N-1-d)`` —
    for two dims this puts dim 0 on the odd bits and dim 1 on the even
    bits (the classic x-major Morton order).  The result fits in
    ``bits·N`` bits; keep that ≤ 62 for BIGINT headroom."""
    n = len(bucket_exprs)
    if not 1 <= n * bits <= 62:
        raise ValueError(f"{n} dims × {bits} bits exceeds BIGINT range")
    div = "div" if dialect == "spark" else "//"
    terms = []
    for i in range(bits):
        for d, e in enumerate(bucket_exprs):
            pos = i * n + (n - 1 - d)
            terms.append(f"((({e}) {div} {1 << i}) % 2) * {1 << pos}")
    return "(" + " + ".join(terms) + ")"


def bucketize_sql(expr: str, min_expr: str, max_expr: str, dialect: str, bits: int = 8) -> str:
    """Map a value into [0, 2**bits) by linear range bucketing with pure
    integer arithmetic: ((x - min) * 2**bits) div (max - min + 1).
    min/max come from a one-row global stats aggregate (broadcast)."""
    div = "div" if dialect == "spark" else "//"
    return (
        f"((({expr}) - ({min_expr})) * {1 << bits}) "
        f"{div} ((({max_expr}) - ({min_expr})) + 1)"
    )
