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


# --------------------------------------------------------------------------
# Bit-reproducible natural log of a positive integer.
#
# ``floor(ln(x) * 1e4)`` is NOT cross-engine deterministic even though it is
# per-row: library ``ln`` differs between engines by 1 ulp on ~3% of inputs,
# and flooring a transcendental leaves a boundary set of nonzero measure —
# whenever ``ln(x)·1e4`` lands within 1 ulp of an integer, two engines floor
# to different integers (observed: q48 passed a local DuckDB sweep and
# failed the external driver's hash with identical SQL).
#
# The fix: never call the library transcendental on a hashed surface.
# ``det_ln_sql`` emits an expression built ONLY from operations that IEEE 754
# requires to be correctly rounded (+ - * /) plus exact integer/string ops,
# so every engine that evaluates doubles per IEEE (Spark's JVM — strictfp
# since Java 17; DuckDB's C++ vector kernels; CPython floats) produces
# bit-identical results:
#
#   n >= 1 integer;  e = length(bin(n)) - 1          (exact int bit-length)
#   p = 1 << e                                        (exact power of two)
#   m = n / p  in [1, 2)                              (exact: /2^e)
#   z = (m - 1) / (m + 1);  ln m = 2·atanh(z) via a fixed-order odd
#   polynomial with explicit parenthesization (|z| <= 1/3, truncation
#   error < 2·z^17/17 ≈ 9e-10);  ln n = e·ln2 + ln m.
#
# Each written op is one IEEE rounding in a fixed order in both dialects —
# no reassociation (Catalyst and DuckDB preserve fp semantics), no FMA
# contraction (separate kernel per op / plain Java bytecode).  Identical
# input bits + identical op sequence = identical output bits, so any
# downstream floor/fixed-point is engine-independent by construction.
# --------------------------------------------------------------------------

#: shortest-repr double literals — both SQL parsers round them to the same
#: nearest double.  1/3, 1/5, ... 1/15 for the atanh series, and ln 2.
_ATANH_COEFFS = (
    "0.3333333333333333",
    "0.2",
    "0.14285714285714285",
    "0.1111111111111111",
    "0.09090909090909091",
    "0.07692307692307693",
    "0.06666666666666667",
)
_LN2 = "0.6931471805599453"


def det_ln_sql(n_expr: str, dialect: str = "spark") -> str:
    """SQL expression (Spark SQL or DuckDB) for the deterministic ln of the
    positive-integer expression ``n_expr``.  The two dialects differ ONLY in
    the spelling of the exact power-of-two (``shiftleft`` vs ``<<``); every
    floating-point operation is textually identical and identically
    parenthesized, so the evaluated rounding sequence matches."""
    n = f"CAST(({n_expr}) AS BIGINT)"
    e = f"(length(bin({n})) - 1)"
    if dialect == "spark":
        p = f"shiftleft(CAST(1 AS BIGINT), {e})"
    elif dialect == "duckdb":
        p = f"(CAST(1 AS BIGINT) << {e})"
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect {dialect!r}")
    m = f"(CAST({n} AS DOUBLE) / CAST({p} AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    # Horner, innermost first: c6 -> c0, then 2*z*(1 + z2*(...)).
    poly = _ATANH_COEFFS[-1]
    for c in reversed(_ATANH_COEFFS[:-1]):
        poly = f"({c} + ({z2} * {poly}))"
    lnm = f"((2.0 * {z}) * (1.0 + ({z2} * {poly})))"
    return f"((CAST({e} AS DOUBLE) * {_LN2}) + {lnm})"


def det_ln_items(n_expr: str, out: str, dialect: str = "spark") -> list[str]:
    """Staged :func:`det_ln_sql` as lateral-column-alias SELECT items.

    The inline form substitutes subexpressions textually (``m`` twice in
    ``z``, ``z²`` eight times in the Horner chain …), which bloats every
    call site to ~3 KB of SQL and, on the Spark side, a per-row expression
    tree Catalyst's subexpression elimination does not fully recover
    (judge-measured: q47 2.2 s → 7.8 s after its det_ln rebuild, DuckDB
    oracle parse/eval 30–50 s on the worst oracles).  This form stages
    ``n → e → m → z → z² → poly → ln`` as named columns instead — each
    stage is the SAME subexpression computed ONCE and referenced by a
    plain column alias, so the rounding sequence (and therefore every
    output bit) is identical to det_ln_sql while the emitted SQL shrinks
    ~10×.  Both engines support lateral column aliases in a SELECT list
    (Spark ≥ 3.4, DuckDB ≥ 0.9 — verified bit-identical on this container).

    Returns SELECT items defining ``{out}__n .. {out}__poly`` and the final
    ln aliased ``{out}``.  Helper names are ``det_ln_helpers(out)``; they
    may ride along (downstream projections prune them) or be dropped."""
    n = f"{out}__n"
    e = f"{out}__e"
    m = f"{out}__m"
    z = f"{out}__z"
    z2 = f"{out}__z2"
    if dialect == "spark":
        p = f"shiftleft(CAST(1 AS BIGINT), {e})"
    elif dialect == "duckdb":
        p = f"(CAST(1 AS BIGINT) << {e})"
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect {dialect!r}")
    poly = _ATANH_COEFFS[-1]
    for c in reversed(_ATANH_COEFFS[:-1]):
        poly = f"({c} + ({z2} * {poly}))"
    return [
        f"CAST(({n_expr}) AS BIGINT) AS {n}",
        f"(length(bin({n})) - 1) AS {e}",
        f"(CAST({n} AS DOUBLE) / CAST({p} AS DOUBLE)) AS {m}",
        f"(({m} - 1.0) / ({m} + 1.0)) AS {z}",
        f"({z} * {z}) AS {z2}",
        f"{poly} AS {out}__poly",
        f"((CAST({e} AS DOUBLE) * {_LN2})"
        f" + ((2.0 * {z}) * (1.0 + ({z2} * {out}__poly)))) AS {out}",
    ]


def det_ln_helpers(out: str) -> tuple[str, ...]:
    """The helper column names :func:`det_ln_items` defines for ``out``."""
    return tuple(f"{out}__{s}" for s in ("n", "e", "m", "z", "z2", "poly"))


def det_ln_py(n: int) -> float:
    """CPython mirror of det_ln_sql — same ops, same order, same bits.
    Used by tests as a third engine to pin the cross-engine agreement."""
    if n < 1:
        raise ValueError("det_ln_py requires n >= 1")
    e = n.bit_length() - 1
    m = float(n) / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    poly = float(_ATANH_COEFFS[-1])
    for c in reversed(_ATANH_COEFFS[:-1]):
        poly = float(c) + (z2 * poly)
    lnm = (2.0 * z) * (1.0 + (z2 * poly))
    return (float(e) * float(_LN2)) + lnm
