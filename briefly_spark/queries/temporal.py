"""Temporal-join pack — as-of join and range join over ``events``
(operators/temporal.py; both are native DuckDB joins, which is what makes
the oracle exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.operators.temporal import asof_join, range_join
from briefly_spark.queries import register


# --------------------------------------------------------------------------
# q76 — as-of join: point-in-time-correct enrichment; since r13 also the
# host of X148's nearest/tolerance leg (pandas merge_asof parity), grafted
# per the r12 composite-first policy.
# --------------------------------------------------------------------------
_Q76_TOL = 21_600_000_000  # 6 h in unix micros — some matches must age out

_Q76_ORACLE = f"""
WITH prof AS (
  SELECT user_id, epoch_us(ts) AS rtsu,
         CAST(floor(max(value) * 100) AS BIGINT) AS pv_fp
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
pur AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT p.event_id, p.user_id, p.tsu, r.rtsu AS b_ts, r.pv_fp AS b_v
  FROM pur p ASOF LEFT JOIN prof r
    ON p.user_id = r.user_id AND p.tsu >= r.rtsu
),
f AS (
  SELECT p.event_id, r.rtsu AS f_ts, r.pv_fp AS f_v
  FROM pur p ASOF LEFT JOIN prof r
    ON p.user_id = r.user_id AND p.tsu <= r.rtsu
),
n AS (
  SELECT b.event_id, b.tsu,
         CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
              WHEN (b.tsu - b_ts) <= (f_ts - b.tsu) THEN b_ts ELSE f_ts END AS m_ts,
         CASE WHEN b_ts IS NULL THEN f_v WHEN f_ts IS NULL THEN b_v
              WHEN (b.tsu - b_ts) <= (f_ts - b.tsu) THEN b_v ELSE f_v END AS m_v
  FROM b JOIN f USING (event_id)
)
SELECT 'backward' AS section, CAST(p.event_id AS VARCHAR) AS k,
       CAST(p.user_id AS VARCHAR) || '/' || CAST(p.tsu AS VARCHAR) || '/' ||
       CAST(r.pv_fp AS VARCHAR) AS value
FROM pur p ASOF JOIN prof r
  ON p.user_id = r.user_id AND p.tsu >= r.rtsu
UNION ALL
SELECT 'nearest' AS section, CAST(event_id AS VARCHAR) AS k,
       concat_ws('/',
         CAST(CASE WHEN m_ts IS NOT NULL AND abs(tsu - m_ts) <= {_Q76_TOL}
                   THEN m_ts END AS VARCHAR),
         CAST(CASE WHEN m_ts IS NOT NULL AND abs(tsu - m_ts) <= {_Q76_TOL}
                   THEN m_v END AS VARCHAR)) AS value
FROM n
"""


@register(
    "q76_asof_enrich",
    covers=("J6", "W2"),
    oracle=_Q76_ORACLE,
)
def q76_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct enrichment (the feature-store join): each
    purchase picks the LATEST signup-profile value at-or-before its
    timestamp — an ASOF join, which Spark lacks as a builtin.  Expressed
    as the union trick (operators/temporal.py): one window pass carrying
    the last non-null profile forward per user — ONE shuffle keyed on
    user_id, no inequality join, no per-row lookups.  The right side is
    deduped per (user, ts) so ties are deterministic; DuckDB's native
    ASOF JOIN is the oracle.

    r13 graft (X148): a 'nearest' section carries the merge_asof-parity
    generalization (operators/temporal.py:asof_join_near) — nearest-match
    with ties to backward and a 6 h inclusive tolerance that ages some
    matches out to NULL; the oracle derives it declaratively from DuckDB's
    native backward+forward ASOF joins.  Timestamps ride as unix micros
    and profile values as fp2 integers so the string surface is
    engine-exact.  Output is a tidy (section, k, value) long frame."""
    from briefly_spark.operators.temporal import asof_join_near

    events = load_table(spark, sf_dir, "events")
    prof = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("profile_value"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("rtsu"),
            F.floor(F.col("profile_value") * 100).cast("long").alias("pv_fp"),
        )
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsu")
    )
    back_long = asof_join(
        pur,
        prof,
        key="user_id",
        left_ts="tsu",
        right_ts="rtsu",
        value_cols=["pv_fp"],
        how="inner",
    ).select(
        F.lit("backward").alias("section"),
        F.col("event_id").cast("string").alias("k"),
        F.concat_ws(
            "/",
            F.col("user_id").cast("string"),
            F.col("tsu").cast("string"),
            F.col("pv_fp").cast("string"),
        ).alias("value"),
    )
    near_long = asof_join_near(
        pur,
        prof,
        key="user_id",
        left_ts="tsu",
        right_ts="rtsu",
        value_cols=["rtsu", "pv_fp"],
        direction="nearest",
        tolerance=_Q76_TOL,
        how="left",
    ).select(
        F.lit("nearest").alias("section"),
        F.col("event_id").cast("string").alias("k"),
        F.concat_ws(
            "/", F.col("rtsu").cast("string"), F.col("pv_fp").cast("string")
        ).alias("value"),
    )
    return back_long.unionByName(near_long)


# --------------------------------------------------------------------------
# q77 — range join: point-in-interval matching via bin banding.
# --------------------------------------------------------------------------
@register(
    "q77_range_join",
    covers=("J3", "A3"),
    oracle="""
WITH ranges AS (
  SELECT event_id AS range_id, value - 7 AS lo, value + 7 AS hi
  FROM events WHERE event_id % 40 = 0
)
SELECT r.range_id, count(*) AS n_points,
       min(e.value) AS min_v, max(e.value) AS max_v
FROM events e JOIN ranges r ON e.value BETWEEN r.lo AND r.hi
GROUP BY r.range_id
""",
)
def q77_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (every event whose value falls in one of
    the sampled ±7 bands) without the O(points·ranges) nested loop a
    naive inequality join plans: ranges explode to the ~2 coarse bins they
    cover, points equi-join on their bin, and the exact BETWEEN runs only
    on bin-collocated pairs (operators/temporal.py:range_join, bin width
    10 ≈ the band span).  The oracle is the literal BETWEEN join DuckDB
    can afford at gate scale."""
    events = load_table(spark, sf_dir, "events")
    ranges = events.filter(F.col("event_id") % 40 == 0).select(
        F.col("event_id").alias("range_id"),
        (F.col("value") - 7).alias("lo"),
        (F.col("value") + 7).alias("hi"),
    )
    points = events.select("event_id", "value")
    joined = range_join(
        points, ranges, point_col="value", lo_col="lo", hi_col="hi", bin_width=10.0
    )
    return joined.groupBy("range_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
