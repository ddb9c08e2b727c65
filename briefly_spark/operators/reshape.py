"""Pivot / unpivot reshaping (X136) — the crosstab pair every analytics
engine ships: long→wide (one column per pivot value, conditional
aggregation) and wide→long (melt), with exact DuckDB mirrors.

Scale discipline: the pivot VALUES are caller-supplied, always.
Spark's value-inferring ``pivot(col)`` runs a hidden distinct pass AND
materializes one column per observed value — unbounded output width is
the scale hazard (a 10⁶-cardinality pivot column is a 10⁶-column
schema).  Requiring the value list keeps the plan ONE hash-aggregate
pass (conditional aggregation — no distinct scan), makes the output
schema static for the oracle/mirror, and turns the width decision into
a reviewed choice.  Values absent from the data yield typed
NULL/zero columns (the SQL conditional-agg semantics, identical in the
mirror); rows whose pivot value is outside the list fall out of every
value column but still count toward row presence only if some value
column matches — callers filter first when that matters.

unpivot is the exact inverse reshape (Spark's built-in melt — JVM-side
Expand, one pass, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sanitized column name for a pivot value
def _safe(v: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in str(v))


def _safe_names(values: list[str]) -> dict[str, str]:
    """value -> sanitized column name, REFUSING collisions: 'a-b' and
    'a.b' both sanitize to a_b, which would silently emit duplicate
    output columns here, duplicate SELECT aliases in the mirror, and a
    duplicate-key create_map in unpivot (ADVICE r11 #4)."""
    names = {str(v): f"n_{_safe(v)}" for v in values}
    if len(values) != len(names):
        raise ValueError("pivot values repeat after string coercion")
    seen: dict[str, str] = {}
    for v, n in names.items():
        if n in seen:
            raise ValueError(
                f"pivot values {seen[n]!r} and {v!r} sanitize to the same "
                f"column name {n!r} — rename or pre-map the values"
            )
        seen[n] = v
    return names


def _sql_str(v: str) -> str:
    """single-quote SQL literal (quotes doubled — the mirror previously
    interpolated raw, so a value containing ' broke the oracle)."""
    return "'" + str(v).replace("'", "''") + "'"


def pivot_counts(
    df: DataFrame,
    *,
    row_keys: list[str],
    pivot_col: str,
    values: list[str],
    agg_col: str | None = None,
) -> DataFrame:
    """Long→wide: one row per ``row_keys``, one BIGINT column per entry
    of ``values`` (named ``n_<value>``) holding the row count (or the
    sum of ``agg_col``) where ``pivot_col`` equals that value.  ONE
    hash-aggregate pass — conditional aggregation, no distinct scan, no
    Spark ``pivot()`` (see module doc).  Absent combinations are 0."""
    what = F.col(agg_col) if agg_col else F.lit(1)
    names = _safe_names(values)
    aggs = [
        F.sum(F.when(F.col(pivot_col) == v, what).otherwise(F.lit(0)))
        .cast("long")
        .alias(names[str(v)])
        for v in values
    ]
    return df.groupBy(*row_keys).agg(*aggs)


def unpivot_counts(
    wide: DataFrame,
    *,
    row_keys: list[str],
    values: list[str],
    var_name: str = "k",
    value_name: str = "n",
) -> DataFrame:
    """Wide→long inverse of :func:`pivot_counts`: (row_keys, k, n) with
    one row per (row, value) pair — Spark's built-in melt (an Expand,
    map-only, zero shuffles).  ``k`` carries the ORIGINAL pivot value,
    not the sanitized column name."""
    names = _safe_names(values)
    cols = [names[str(v)] for v in values]
    out = wide.unpivot(row_keys, cols, var_name, value_name)
    mapping = F.create_map(
        *[x for v in values for x in (F.lit(names[str(v)]), F.lit(str(v)))]
    )
    return out.withColumn(var_name, mapping[F.col(var_name)])


def sql_pivot_counts(
    table: str,
    *,
    row_keys: list[str],
    pivot_col: str,
    values: list[str],
    agg_col: str | None = None,
) -> str:
    """DuckDB mirror of :func:`pivot_counts` — the same conditional
    aggregation, the same static schema."""
    g = ", ".join(row_keys)
    what = agg_col if agg_col else "1"
    names = _safe_names(values)
    items = ",\n       ".join(
        f"CAST(sum(CASE WHEN {pivot_col} = {_sql_str(v)} THEN {what} ELSE 0 END)"
        f" AS BIGINT) AS {names[str(v)]}"
        for v in values
    )
    return f"SELECT {g},\n       {items}\nFROM {table} GROUP BY {g}"
