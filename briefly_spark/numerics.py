"""Deterministic cross-engine numerics.

Floating-point aggregation order differs between engines (and between Spark
partitionings), so ``SUM(double)`` is not bit-reproducible.  The correctness
oracle (DuckDB) hash-compares values, and at 100 TB a re-run must produce
the same report — so every money/measure aggregate in this engine uses a
*fixed-point* discipline:

    sum_cents = SUM(floor(x * 100))          -- exact integer arithmetic
    result    = sum_cents / 100.0            -- single final fp op

``floor(x * 100)`` is a pure per-row IEEE-754 op on identical input bits, so
it is deterministic in any engine; the subsequent sum of integer-valued
doubles below 2^53 is exact and order-independent.  The same pattern (scale →
floor → exact combine → unscale) applies to averages and derived measures.

For *small-magnitude, low-error* values (e.g. a cosine similarity built from
~64 multiplies, error ~1e-15) a post-hoc ``floor(x * 1e4) / 1e4`` truncation
is sufficient: the probability that a 1e-15 error crosses a 1e-4 truncation
boundary is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: cents-style scale for money-like measures
MONEY_SCALE = 100
#: 4-decimal scale for ratio/score-like measures
RATIO_SCALE = 10_000


def fixed(x: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Per-row deterministic fixed-point projection: floor(x * scale)."""
    return F.floor(F.col(x) * F.lit(scale) if isinstance(x, str) else x * F.lit(scale))


def fixed_sum(x: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Order-independent SUM of a double measure, result back in units."""
    return F.sum(fixed(x, scale)) / F.lit(float(scale))


def fixed_avg(x: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Order-independent AVG of a double measure, result back in units."""
    return F.sum(fixed(x, scale)) / F.count(F.lit(1)) / F.lit(float(scale))


def trunc4(x: Column) -> Column:
    """Deterministic 4-decimal truncation for low-error derived values."""
    return F.floor(x * F.lit(RATIO_SCALE)) / F.lit(float(RATIO_SCALE))


# The SQL spellings, for oracle strings (DuckDB) and spark.sql parity.
def sql_fixed_sum(expr: str, scale: int = MONEY_SCALE, alias: str | None = None) -> str:
    s = f"sum(floor(({expr}) * {scale})) / {scale}.0"
    return f"{s} AS {alias}" if alias else s


def sql_fixed_avg(expr: str, scale: int = MONEY_SCALE, alias: str | None = None) -> str:
    s = f"sum(floor(({expr}) * {scale})) / count(*) / {scale}.0"
    return f"{s} AS {alias}" if alias else s


def sql_trunc4(expr: str, alias: str | None = None) -> str:
    s = f"floor(({expr}) * 10000) / 10000.0"
    return f"{s} AS {alias}" if alias else s
