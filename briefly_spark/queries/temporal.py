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
# q76 — as-of join: point-in-time-correct enrichment.
# --------------------------------------------------------------------------
@register(
    "q76_asof_enrich",
    covers=("J6", "W2"),
    oracle="""
WITH prof AS (
  SELECT user_id, ts, max(value) AS profile_value
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
pur AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, r.profile_value
FROM pur p ASOF JOIN prof r
  ON p.user_id = r.user_id AND p.ts >= r.ts
""",
)
def q76_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct enrichment (the feature-store join): each
    purchase picks the LATEST signup-profile value at-or-before its
    timestamp — an ASOF join, which Spark lacks as a builtin.  Expressed
    as the union trick (operators/temporal.py): one window pass carrying
    the last non-null profile forward per user — ONE shuffle keyed on
    user_id, no inequality join, no per-row lookups.  The right side is
    deduped per (user, ts) so ties are deterministic; DuckDB's native
    ASOF JOIN is the oracle."""
    events = load_table(spark, sf_dir, "events")
    prof = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("profile_value"))
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        pur,
        prof.select("user_id", F.col("ts").alias("rts"), "profile_value"),
        key="user_id",
        left_ts="ts",
        right_ts="rts",
        value_cols=["profile_value"],
        how="inner",
    )


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
