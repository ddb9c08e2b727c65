"""Per-group OLS trend regression (X129) — exact integer least squares
over grouped data, the drift-DETECTION companion to the drift-MEASURING
operators (X125 PSI, X119 anomaly history): PSI says two snapshots
differ, the trend says how a metric moves WITHIN a table ("does document
length decay over ingest order for this source?", "is this feed's
quality score sliding?").

Reference parity: beyond-reference (the reference has no analytics over
its own corpus) — part of the SURVEY §2.10 training-data surface, same
tier as the profiling/expectation operators it composes with.

Exactness — no division, no floats, anywhere:

- Inputs must be INTEGER-typed columns (raise otherwise — a DOUBLE
  metric has no engine-exact sum).
- The closed-form OLS solution is emitted as exact integer FRACTIONS:
  ``slope = slope_num / slope_den`` and
  ``intercept = icept_num / slope_den`` with

      slope_num = n·Σxy − Σx·Σy
      slope_den = n·Σxx − (Σx)²
      icept_num = Σy·Σxx − Σx·Σxy
      vary_num  = n·Σyy − (Σy)²      (r² = slope_num² / (slope_den·vary_num))

  All sums and products are computed in DECIMAL(38,0) on the Spark side
  and HUGEINT (int128) in the DuckDB mirror — both exact integer
  arithmetic, so the surfaces agree bit-for-bit.  A constant-x group
  (or n = 1) surfaces as ``slope_den = 0`` rather than a NULL-masked
  guess — the caller decides what an undefined trend means.

Scale (100 TB): ONE hash-aggregate shuffle on the group key with
map-side partial sums; the output is group-bounded.  Capacity: with x
pre-ranked or bucketed to 1..n the largest intermediate is
n·Σxx ≈ n⁴/3 — DECIMAL(38,0) holds exact results up to roughly n ≈ 10⁹
rows PER GROUP; for hotter groups, bucket x (e.g. by day) so n counts
buckets, not rows.  Pass x as a bounded ordinal (rank, epoch-day,
bucket id), never an unbounded surrogate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}

#: exact integer fraction surface emitted per group
TREND_COLS = ("n", "x_sum", "y_sum", "slope_num", "slope_den", "icept_num",
              "vary_num")


def _require_int(df: DataFrame, col: str) -> None:
    t = dict(df.dtypes).get(col)
    if t is None:
        raise ValueError(f"group_trend: unknown column {col!r}")
    if t not in _INT_TYPES:
        raise ValueError(
            f"group_trend: {col!r} is {t} — exact OLS needs an integer "
            f"column (rank, bucket, count, fixed-point score); cast or "
            f"quantize first"
        )


def group_trend(
    df: DataFrame, *, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Exact per-group OLS fit of ``y_col`` against ``x_col`` — one
    aggregation pass, output = ``group_cols`` + :data:`TREND_COLS`
    (DECIMAL(38,0) fractions, see module doc).  The DuckDB mirror is
    :func:`sql_group_trend`."""
    for c in (x_col, y_col):
        _require_int(df, c)
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast(dec).alias("x_sum"),
        F.sum(y).cast(dec).alias("y_sum"),
        F.sum(x * x).cast(dec).alias("xx_sum"),
        F.sum(x * y).cast(dec).alias("xy_sum"),
        F.sum(y * y).cast(dec).alias("yy_sum"),
    )
    n = F.col("n").cast(dec)
    return agg.select(
        *group_cols,
        "n",
        "x_sum",
        "y_sum",
        (n * F.col("xy_sum") - F.col("x_sum") * F.col("y_sum"))
        .cast(dec).alias("slope_num"),
        (n * F.col("xx_sum") - F.col("x_sum") * F.col("x_sum"))
        .cast(dec).alias("slope_den"),
        (F.col("y_sum") * F.col("xx_sum") - F.col("x_sum") * F.col("xy_sum"))
        .cast(dec).alias("icept_num"),
        (n * F.col("yy_sum") - F.col("y_sum") * F.col("y_sum"))
        .cast(dec).alias("vary_num"),
    )


def sql_group_trend(
    table: str, *, group_cols: list[str], x_col: str, y_col: str
) -> str:
    """DuckDB mirror of :func:`group_trend` — HUGEINT (int128) arithmetic,
    value-identical to the Spark DECIMAL(38,0) surface."""
    g = ", ".join(group_cols)
    return f"""WITH sums AS (
  SELECT {g},
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST({x_col} AS HUGEINT)) AS x_sum,
         sum(CAST({y_col} AS HUGEINT)) AS y_sum,
         sum(CAST({x_col} AS HUGEINT) * CAST({x_col} AS HUGEINT)) AS xx_sum,
         sum(CAST({x_col} AS HUGEINT) * CAST({y_col} AS HUGEINT)) AS xy_sum,
         sum(CAST({y_col} AS HUGEINT) * CAST({y_col} AS HUGEINT)) AS yy_sum
  FROM {table} GROUP BY {g}
)
SELECT {g}, n, x_sum, y_sum,
       CAST(n AS HUGEINT) * xy_sum - x_sum * y_sum AS slope_num,
       CAST(n AS HUGEINT) * xx_sum - x_sum * x_sum AS slope_den,
       y_sum * xx_sum - x_sum * xy_sum AS icept_num,
       CAST(n AS HUGEINT) * yy_sum - y_sum * y_sum AS vary_num
FROM sums"""
