"""Temporal join operators Spark lacks as builtins — as-of join and range
join — expressed as compositions of native DataFrame ops (brief §custom
operators; DuckDB has both natively, which is exactly what makes them
oracle-checkable).

Scale shapes:

- :func:`asof_join` — the union trick: tag both sides, one window over
  (key, ts) carrying the last non-null right payload forward.  ONE shuffle
  keyed on the join key, state = one row — the classic
  point-in-time-correct enrichment (feature stores, slowly-changing
  profiles) without any inequality join.
- :func:`range_join` — point-in-interval matching via bin banding: ranges
  explode to the coarse bins they cover, points compute their bin, the
  join is an equi-join on the bin plus a residual BETWEEN filter.  Shuffle
  is O(points + ranges·span/width) instead of the O(points·ranges)
  broadcast-nested-loop a naive inequality join plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same ``key`` (DuckDB/kdb ASOF JOIN
    semantics, ties included).

    Implementation: union both sides with a ``src`` tag ordered so right
    rows at an equal timestamp sort first, then one window per key carries
    the last RIGHT ROW forward as a single struct; left rows unpack it.
    Carrying the whole row (not per-column ``last(value, ignorenulls)``)
    keeps row presence separate from value nullability: a matched right row
    whose payload is legitimately NULL yields that NULL (not an older
    non-null value), and ``how="inner"`` keeps the row — exactly DuckDB's
    ASOF JOIN. Requires the right side to be unique per (key, right_ts) —
    enforce upstream (e.g. keep the max value per timestamp) for
    deterministic output."""
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    ).select(*lcols, "__ts", "__src", *[f"__v_{v}" for v in value_cols])
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL for left rows, a (never-NULL) struct for right rows — so
    # last(..., ignorenulls) finds the latest right ROW even when every
    # payload field in it is NULL.
    right_row = F.when(
        F.col("__src") == 0,
        F.struct(*[F.col(f"__v_{v}").alias(v) for v in value_cols]),
    )
    carried = (
        u.select(*lcols, "__src", F.last(right_row, ignorenulls=True).over(w).alias("__m"))
        .filter(F.col("__src") == 1)
    )
    if how == "inner":
        carried = carried.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how {how!r}")
    return carried.select(*lcols, *[F.col("__m")[v].alias(v) for v in value_cols])


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_span_bins: int = 4096,
) -> DataFrame:
    """Match each point to every range with lo ≤ point ≤ hi, as a banded
    equi-join: ranges explode to the coarse bins [floor(lo/w), floor(hi/w)]
    they cover, points join on their own bin, and the exact BETWEEN runs
    only on bin-collocated pairs.  ``bin_width`` trades replication
    (ranges appear in span/width bins) against candidate precision — set
    it near the typical range span.

    Guardrails (the explode is the one place a single bad row can sink an
    executor): an interval covering more than ``max_span_bins`` bins fails
    the stage with a clear error instead of materializing an unbounded
    ``sequence`` (one row with lo=0, hi=1e12 would otherwise OOM at any
    scale) — raise ``max_span_bins`` or widen ``bin_width`` for legitimately
    wide ranges.  Inverted intervals (hi < lo) match nothing by definition
    and are filtered before the explode (``F.sequence`` would silently
    DESCEND, manufacturing spurious bins)."""
    w = float(bin_width)
    pb = points.withColumn("__bin", F.floor(F.col(point_col) / w).cast("long"))
    lo_bin = F.floor(F.col(lo_col) / w).cast("long")
    hi_bin = F.floor(F.col(hi_col) / w).cast("long")
    # guard lives inside the used expression so the optimizer can't prune it
    guarded_hi = F.when(hi_bin - lo_bin < max_span_bins, hi_bin).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join: interval ["),
                F.col(lo_col).cast("string"),
                F.lit(", "),
                F.col(hi_col).cast("string"),
                F.lit(f"] covers more than max_span_bins={max_span_bins} bins of "
                      f"width {w}; widen bin_width or drop the malformed row"),
            )
        ).cast("long")
    )
    rb = ranges.filter(F.col(hi_col) >= F.col(lo_col)).withColumn(
        "__bin", F.explode(F.sequence(lo_bin, guarded_hi))
    )
    return pb.join(rb, "__bin").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("__bin")


# ---------------------------------------------------------------------------
# X144 — regular-grid resample with LOCF gap-fill
# ---------------------------------------------------------------------------
def resample_locf(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: int,
    origin: int = 0,
    max_fill: int | None = None,
) -> DataFrame:
    """Irregular observations → a regular per-key time grid with
    last-observation-carried-forward fill (the feature-store /
    time-series resample Spark lacks as a builtin; DuckDB mirrors it
    with generate_series + IGNORE NULLS windows, which keeps it
    oracle-checkable).

    Semantics: buckets are ``floor((ts - origin) / step)`` — FLOOR
    division, built from truncating ``div``/``//`` plus a negative-
    remainder correction that is identical in both engines (raw
    truncation would make bucket 0 span TWO steps around the origin and
    mis-assign pre-origin observations), so every bucket is exactly
    ``[bucket_start, bucket_start + step)``; ts and value follow the
    exact-integer contract of trends.require_int_column; convert
    timestamps with unix_micros first.  Within a bucket the LAST observation wins under the total
    order (ts, value) — deterministic through ties.  The grid spans each
    key's own observed [first, last] bucket; every grid row carries
    ``observed`` (did this bucket have a real observation) and the
    filled ``value`` — NULL again once a gap exceeds ``max_fill`` steps
    (None = fill forever).  Rows with NULL ts or value are excluded.

    Scale shape: one hash shuffle to bucket-aggregate the observations
    (map-side combinable), one per-key window over the GRID frame —
    partitioned by key, never global; grid size is span/step rows per
    key, the explode is per-key-bounded.  No corpus sort, no driver
    state.
    """
    from briefly_spark.operators.trends import require_int_column

    require_int_column(df, ts_col, ctx="resample_locf")
    require_int_column(df, value_col, ctx="resample_locf")
    if step <= 0:
        raise ValueError(f"resample_locf: step must be positive, got {step}")
    if max_fill is not None and max_fill < 0:
        raise ValueError(f"resample_locf: max_fill must be >= 0, got {max_fill}")
    obs = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            *key_cols,
            F.expr(
                f"(({ts_col} - {int(origin)}) div {int(step)})"
                f" - (CASE WHEN ({ts_col} - {int(origin)}) % {int(step)} < 0"
                f" THEN 1 ELSE 0 END)"
            ).alias("__b"),
            F.col(ts_col).alias("__ts"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*key_cols, "__b")
        .agg(F.max(F.struct("__ts", "__v")).alias("__last"))
        .select(*key_cols, "__b", F.col("__last.__v").alias("__obs_v"))
    )
    span = obs.groupBy(*key_cols).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    grid = span.select(
        *key_cols, F.explode(F.sequence("__b0", "__b1")).alias("bucket")
    )
    joined = grid.join(
        obs.withColumnRenamed("__b", "bucket"), [*key_cols, "bucket"], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *key_cols,
        F.col("bucket").cast("long").alias("bucket"),
        (F.lit(int(origin)) + F.col("bucket") * step)
        .cast("long")
        .alias("bucket_start"),
        F.col("__obs_v").isNotNull().alias("observed"),
        F.last("__obs_v", ignorenulls=True).over(w).alias("__fill"),
        F.last(
            F.when(F.col("__obs_v").isNotNull(), F.col("bucket")), ignorenulls=True
        ).over(w).alias("__src_b"),
    )
    age_ok = (
        F.lit(True)
        if max_fill is None
        else (F.col("bucket") - F.col("__src_b")) <= max_fill
    )
    return filled.select(
        *key_cols,
        "bucket",
        "bucket_start",
        "observed",
        F.when(age_ok, F.col("__fill")).alias("value"),
    )


def sql_resample_locf(
    table: str,
    *,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: int,
    origin: int = 0,
    max_fill: int | None = None,
) -> str:
    """DuckDB mirror of :func:`resample_locf` — identical integer bucket,
    tie, and fill-age arithmetic (generate_series grid, IGNORE NULLS
    last_value windows)."""
    g = ", ".join(key_cols)
    age_ok = (
        "TRUE"
        if max_fill is None
        else f"bucket - src_b <= {int(max_fill)}"
    )
    return f"""WITH obs AS (
  SELECT {g},
         (({ts_col} - {int(origin)}) // {int(step)})
           - (CASE WHEN ({ts_col} - {int(origin)}) % {int(step)} < 0
                   THEN 1 ELSE 0 END) AS b,
         max(struct_pack(ts := {ts_col}, v := {value_col})) AS last_row
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
  GROUP BY {g}, b
),
grid AS (
  SELECT {g}, unnest(generate_series(min(b), max(b))) AS bucket
  FROM obs GROUP BY {g}
),
joined AS (
  SELECT grid.*, obs.last_row
  FROM grid LEFT JOIN obs
    ON {' AND '.join(f'grid.{k} = obs.{k}' for k in key_cols)}
   AND grid.bucket = obs.b
),
filled AS (
  SELECT {g}, CAST(bucket AS BIGINT) AS bucket,
         CAST({int(origin)} + bucket * {int(step)} AS BIGINT) AS bucket_start,
         last_row IS NOT NULL AS observed,
         last_value(last_row IGNORE NULLS)
           OVER (PARTITION BY {g} ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS fill_row,
         last_value(CASE WHEN last_row IS NOT NULL THEN bucket END IGNORE NULLS)
           OVER (PARTITION BY {g} ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS src_b
  FROM joined
)
SELECT {g}, bucket, bucket_start, observed,
       CASE WHEN {age_ok} THEN fill_row.v END AS value
FROM filled"""


# ---------------------------------------------------------------------------
# X148 — as-of join with direction and tolerance (pandas merge_asof parity)
# ---------------------------------------------------------------------------
def asof_join_near(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    how: str = "left",
) -> DataFrame:
    """:func:`asof_join` generalized to pandas ``merge_asof`` semantics:
    ``direction`` backward (greatest right_ts ≤ left_ts — asof_join's
    contract), forward (smallest right_ts ≥ left_ts), or nearest
    (smaller |Δ|, ties to the backward match); ``tolerance`` bounds |Δ|
    inclusively (an out-of-tolerance match becomes NULL / drops under
    ``how="inner"``).

    Same machinery as asof_join — union both sides, ONE window per key,
    no inequality join — with the matched ``right_ts`` carried inside
    the struct so the tolerance/nearest arithmetic is a projection.
    ``nearest`` costs one extra window FUNCTION over the same ordering
    (current → following), not a second shuffle; ``forward`` reverses
    the equal-ts tiebreak so exact-timestamp matches are included, as in
    pandas.  Timestamps follow the exact-integer contract (convert with
    unix_micros first); the right side must be unique per (key,
    right_ts) — enforce upstream.  NULL timestamps never participate:
    NULL-ts right rows are dropped before the union (NULLs sort FIRST in
    the window ordering, so one timestamp-less right row would otherwise
    become a universal backward match), and a NULL-ts left row's match
    is forced NULL (kept under how="left", dropped under "inner").
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join_near: unknown direction {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"asof_join_near: tolerance must be >= 0, got {tolerance}")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join_near: unsupported how {how!r}")
    lcols = list(left.columns)
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[
            F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
            for v in value_cols
        ],
    )
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    ).select(*lcols, "__ts", "__src", *[f"__v_{v}" for v in value_cols])
    u = l.unionByName(r)
    # equal-ts tiebreak: rights sort BEFORE lefts for backward/nearest
    # (equal ts is a backward match, distance 0), AFTER them for forward
    src_order = F.col("__src") if direction != "forward" else (-F.col("__src"))
    base = Window.partitionBy(key).orderBy("__ts", src_order)
    right_row = F.when(
        F.col("__src") == 0,
        F.struct(
            F.col("__ts").alias("__rts"),
            *[F.col(f"__v_{v}").alias(v) for v in value_cols],
        ),
    )
    back = F.last(right_row, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first(right_row, ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        picked = back
    elif direction == "forward":
        picked = fwd
    else:  # nearest: smaller |delta| wins, tie -> backward
        picked = F.when(back.isNull(), fwd).when(fwd.isNull(), back).otherwise(
            F.when(
                (F.col("__ts") - back["__rts"]) <= (fwd["__rts"] - F.col("__ts")),
                back,
            ).otherwise(fwd)
        )
    # a NULL-ts left row never matches (it would otherwise sort to the
    # partition head and see the forward frame as a universal match)
    picked = F.when(F.col("__ts").isNotNull(), picked)
    carried = u.select(
        *lcols, "__ts", "__src", picked.alias("__m")
    ).filter(F.col("__src") == 1)
    if tolerance is not None:
        in_tol = F.abs(F.col("__ts") - F.col("__m")["__rts"]) <= tolerance
        carried = carried.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & in_tol, F.col("__m"))
        )
    if how == "inner":
        carried = carried.filter(F.col("__m").isNotNull())
    return carried.select(
        *lcols, *[F.col("__m")[v].alias(v) for v in value_cols]
    )
