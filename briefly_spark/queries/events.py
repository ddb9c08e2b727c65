"""Event-time windowing pack — tumbling / sliding / session windows over
``events``, plus a JSON-props extraction query.

The reference has no event-time semantics (SURVEY §2.10: arrival-time
polling only), but its successor engine needs them for any stream-shaped
workload — these are the batch duals of the Structured Streaming
operators in :mod:`briefly_spark.streaming` (identical window semantics;
the streaming tests assert batch/stream agreement, the oracle certifies
the batch side against DuckDB).

All value sums use the fixed-point discipline (numerics.py) so float
aggregation hash-matches across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.numerics import sql_fixed_sum
from briefly_spark.queries import register


def _fixed_sum(col: str):
    return F.sum(F.floor(F.col(col) * 100)) / 100.0


# --------------------------------------------------------------------------
# q70 — tumbling window aggregation.
# --------------------------------------------------------------------------
@register(
    "q70_tumbling_window",
    covers=("A3", "A4"),
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS win_end,
       event_type,
       count(*) AS n_events,
       {sql_fixed_sum('value', 100, 'total_value')}
FROM events
GROUP BY 1, 2, 3
""",
)
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type: the canonical streaming
    aggregate in batch form (same `window()` expression Structured
    Streaming uses, so the plan is identical modulo the state store).
    One partial-agg shuffle; window assignment is pure codegen."""
    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return events.groupBy(w, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _fixed_sum("value").alias("total_value"),
    ).select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "event_type",
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# q71 — sliding (hopping) window aggregation.
# --------------------------------------------------------------------------
@register(
    "q71_sliding_window",
    covers=("A3",),
    oracle=f"""
WITH hopped AS (
  SELECT e.*, time_bucket(INTERVAL 30 MINUTES, e.ts) - k.k * INTERVAL 30 MINUTES AS win_start
  FROM events e, (SELECT unnest(range(0, 2)) AS k) k
  WHERE e.ts < time_bucket(INTERVAL 30 MINUTES, e.ts) - k.k * INTERVAL 30 MINUTES + INTERVAL 1 HOUR
)
SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end,
       count(*) AS n_events,
       {sql_fixed_sum('value', 100, 'total_value')}
FROM hopped
GROUP BY 1, 2
""",
)
def q71_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    width/slide = 2 windows (Spark expands this internally; the oracle
    expands it with an explicit hop join).  The expansion factor — not the
    shuffle — is the scale knob: state is O(windows), rows are O(events ×
    w/s)."""
    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return events.groupBy(w).agg(
        F.count(F.lit(1)).alias("n_events"),
        _fixed_sum("value").alias("total_value"),
    ).select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# q72 — session windows (gaps-and-islands).
# --------------------------------------------------------------------------
@register(
    "q72_session_windows",
    covers=("A3", "W6"),
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTES OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTES AS session_end,
       count(*) AS n_events,
       {sql_fixed_sum('value', 100, 'total_value')}
FROM sess
GROUP BY user_id, session_id
""",
)
def q72_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap —
    `session_window()` native (merging window state in streaming; a
    gaps-and-islands rewrite in the DuckDB oracle).  Session end is
    last-event + gap, matching Spark's definition."""
    events = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return events.groupBy(sw, "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _fixed_sum("value").alias("total_value"),
    ).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# q73 — JSON props extraction (F15/F16 over the events stream).
# --------------------------------------------------------------------------
@register(
    "q73_props_json_extract",
    covers=("F15", "F16"),
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def q73_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON props column (`from_json` with an
    explicit schema — F15/F16) feeding a grouped aggregate; integer sums
    need no fixed-point treatment."""
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"), F.max("k").alias("max_k"))
    )
