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
# q70 — tumbling window aggregation; since r13 also the host of X144's
# gap-filled regular-grid leg (LOCF resample), grafted per the r12
# composite-first policy.
# --------------------------------------------------------------------------
_Q70_STEP = 3_600_000_000  # 1 hour in unix micros — same grid as the windows


def _q70_oracle() -> str:
    from briefly_spark.operators.temporal import sql_resample_locf

    rs = sql_resample_locf(
        "(SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events)",
        key_cols=["user_id"],
        ts_col="tsu",
        value_col="event_id",
        step=_Q70_STEP,
        max_fill=2,
    )
    return f"""
WITH t AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(floor(value * 100)) AS BIGINT) AS tv_fp
  FROM events GROUP BY 1, 2
)
SELECT 'tumbling' AS section,
       CAST(epoch_us(ws) AS VARCHAR) || '|' || event_type AS k,
       CAST(n_events AS VARCHAR) || '/' || CAST(tv_fp AS VARCHAR) AS value
FROM t
UNION ALL
SELECT 'resample' AS section,
       CAST(user_id AS VARCHAR) || '|' || CAST(bucket AS VARCHAR) AS k,
       concat_ws('/', CAST(bucket_start AS VARCHAR), CAST(observed AS VARCHAR),
                 CAST(value AS VARCHAR)) AS value
FROM ({rs})
"""


@register(
    "q70_tumbling_window",
    covers=("A3", "A4"),
    oracle=_q70_oracle(),
)
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type: the canonical streaming
    aggregate in batch form (same `window()` expression Structured
    Streaming uses, so the plan is identical modulo the state store).
    One partial-agg shuffle; window assignment is pure codegen.

    r13 graft (X144): a second section carries the regular-grid LOCF
    resample on the SAME hourly grid — each user's event stream densified
    to hour buckets with last-observation-carried-forward fill, capped at
    max_fill=2 stale buckets (operators/temporal.py:resample_locf;
    mirror-matched on randomized gappy series in tests/test_resample.py).
    Output is a tidy (section, k, value) long frame so both legs ride one
    driver hash; the fixed-point tumbling sum stays integer (tv_fp) so
    the string surface is engine-exact."""
    from briefly_spark.operators.temporal import resample_locf

    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    tumb_long = (
        events.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("tv_fp"),
        )
        .select(
            F.lit("tumbling").alias("section"),
            F.concat_ws(
                "|",
                F.unix_micros(F.col("window.start")).cast("string"),
                F.col("event_type"),
            ).alias("k"),
            F.concat_ws(
                "/", F.col("n_events").cast("string"), F.col("tv_fp").cast("string")
            ).alias("value"),
        )
    )
    ev = events.select("user_id", F.unix_micros("ts").alias("tsu"), "event_id")
    rs_long = resample_locf(
        ev,
        key_cols=["user_id"],
        ts_col="tsu",
        value_col="event_id",
        step=_Q70_STEP,
        max_fill=2,
    ).select(
        F.lit("resample").alias("section"),
        F.concat_ws(
            "|", F.col("user_id").cast("string"), F.col("bucket").cast("string")
        ).alias("k"),
        F.concat_ws(
            "/",
            F.col("bucket_start").cast("string"),
            F.col("observed").cast("string"),
            F.col("value").cast("string"),
        ).alias("value"),
    )
    return tumb_long.unionByName(rs_long)


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


# --------------------------------------------------------------------------
# q74 — sketch audit: approximate distinct (HLL++) and approximate median
# (GK) against their exact counterparts, under an expected-outcome oracle;
# since r13 also the host of X142's quantile-bracket leg (the mergeable
# log-bin histogram registry), grafted per the r12 composite-first policy.
# --------------------------------------------------------------------------
def _q74_oracle() -> str:
    from briefly_spark.operators.histq import sql_group_quantiles

    fixed = (
        "(SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS value_fp "
        "FROM events) fx"
    )
    histq = sql_group_quantiles(
        fixed, group_cols=["event_type"], value_col="value_fp"
    )
    return f"""
SELECT 'audit' AS section, event_type, k, value FROM (
  SELECT event_type, 'hll_ok' AS k, 'true' AS value
  FROM (SELECT DISTINCT event_type FROM events)
  UNION ALL
  SELECT event_type, 'p50_ok' AS k, 'true' AS value
  FROM (SELECT DISTINCT event_type FROM events)
)
UNION ALL
SELECT 'histq' AS section, event_type,
       'p' || CAST(p AS VARCHAR) AS k,
       CAST(n AS VARCHAR) || '/' || CAST(rank AS VARCHAR) || '/' ||
       CAST(bin_idx AS VARCHAR) || '/' || CAST(lo AS VARCHAR) || '/' ||
       CAST(hi AS VARCHAR) AS value
FROM ({histq})
"""


@register(
    "q74_sketch_audit",
    covers=("A3", "A4"),
    oracle=_q74_oracle(),
)
def q74_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB aggregation workhorses — approx_count_distinct (HLL++)
    and percentile_approx (Greenwald-Khanna) — audited against their exact
    counterparts in one pass: per event_type, is the HLL estimate within
    15% of exact distinct and the approximate median within 5% of the true
    median.  The oracle asserts the expected all-true outcome (same
    pattern as the ANN recall audits: approximate values can't hash-match,
    bounded-error booleans can).  Measured error: HLL ≤ 6.7%, p50 ≤ 0.6%
    across sf0.001–0.1.  Exact distinct/percentile exist here only as the
    audit baseline; at 100 TB you run the sketches alone — one partial-agg
    shuffle, mergeable state, no giant sort.

    r13 graft (X142): a second section carries the mergeable log-bin
    histogram quantile registry's one-shot surface — exact-rank brackets
    of the fixed-point event value per event_type, value-identical to the
    DuckDB mirror (operators/histq.py; fold ≡ one-shot ≡ stream pinned in
    tests/test_histq.py).  Output is a tidy (section, event_type, k,
    value) long frame so both legs ride one driver hash."""
    events = load_table(spark, sf_dir, "events")
    r = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_d"),
        F.approx_count_distinct("user_id").alias("approx_d"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(value, 0.5)").alias("approx_p50"),
    )
    hll_ok = (F.abs(F.col("approx_d") - F.col("exact_d")) / F.col("exact_d")) <= 0.15
    p50_ok = (F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.abs(F.col("exact_p50"))) <= 0.05
    audit_long = r.select(
        "event_type", hll_ok.alias("hll_ok"), p50_ok.alias("p50_ok")
    ).selectExpr(
        "'audit' AS section",
        "event_type",
        "stack(2, 'hll_ok', CAST(hll_ok AS STRING), "
        "'p50_ok', CAST(p50_ok AS STRING)) AS (k, value)",
    )

    from briefly_spark.operators.histq import group_quantiles

    fixed = events.select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("value_fp")
    )
    histq_long = group_quantiles(
        fixed, group_cols=["event_type"], value_col="value_fp"
    ).select(
        F.lit("histq").alias("section"),
        "event_type",
        F.concat(F.lit("p"), F.col("p").cast("string")).alias("k"),
        F.concat_ws("/", "n", "rank", "bin_idx", "lo", "hi").alias("value"),
    )
    return audit_long.unionByName(histq_long)


# --------------------------------------------------------------------------
# q75 — ordered funnel (view → click → purchase) in ONE shuffle.
# --------------------------------------------------------------------------
@register(
    "q75_funnel",
    covers=("A3", "W2"),
    oracle="""
WITH u AS (
  SELECT user_id,
         list_sort(list(struct_pack(ts := ts, et := event_type))) AS l
  FROM events GROUP BY user_id
),
s AS (
  SELECT user_id,
         list_filter(l, x -> x.et = 'view')[1].ts AS v
  FROM u
),
s2 AS (
  SELECT u.user_id, s.v,
         list_filter(u.l, x -> x.et = 'click' AND s.v IS NOT NULL AND x.ts > s.v)[1].ts AS c
  FROM u JOIN s ON u.user_id = s.user_id
),
s3 AS (
  SELECT u.user_id, s2.v, s2.c,
         list_filter(u.l, x -> x.et = 'purchase' AND s2.c IS NOT NULL AND x.ts > s2.c)[1].ts AS p
  FROM u JOIN s2 ON u.user_id = s2.user_id
)
SELECT count(v) AS n_viewed, count(c) AS n_clicked_after, count(p) AS n_purchased_after
FROM s3
""",
)
def q75_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (first view → first later click → first
    later purchase) computed in ONE shuffle: collect each user's events
    into a sorted (ts, type) array, then pure array algebra finds the
    step timestamps — no self-joins, no window cascade (the classic
    funnel-by-joins shape shuffles the events table once per step).
    Per-user state is bounded by that user's event count; skew-safe via
    AQE.  Deterministic tie-break: struct sort orders (ts, event_type)."""
    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))).alias("l")
    )
    def first_after(arr, et, after):
        hits = F.filter(arr, lambda x: (x.et == et) & (F.lit(True) if after is None else (after.isNotNull() & (x.ts > after))))
        return F.get(hits, 0).ts
    staged = u.select("user_id", "l", first_after(F.col("l"), "view", None).alias("v"))
    staged = staged.select("user_id", "l", "v", first_after(F.col("l"), "click", F.col("v")).alias("c"))
    staged = staged.select("user_id", "v", "c", first_after(F.col("l"), "purchase", F.col("c")).alias("p"))
    return staged.agg(
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked_after"),
        F.count("p").alias("n_purchased_after"),
    )


# --------------------------------------------------------------------------
# q78 — time-RANGE rolling features (feature-store trailing aggregates).
# --------------------------------------------------------------------------
@register(
    "q78_rolling_features",
    covers=("A3", "W2"),
    oracle="""
SELECT event_id, user_id,
       count(*) OVER wr AS n_24h,
       sum(floor(value * 100)) OVER wr / 100.0 AS sum_24h,
       epoch_us(ts) - lag(epoch_us(ts)) OVER wl AS micros_since_prev
FROM events
WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
       wl AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q78_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-24h features (count, fixed-point value sum) plus
    time-since-previous-event — the point-in-time-correct feature-store
    shape (each row sees exactly its own past, never the future).  This is
    the time-RANGE window form (`rangeBetween` over epoch micros) the
    row-based running windows (q14) can't express: the frame is bounded
    by TIME, so burst users and sparse users get the same 24-hour
    lookback.  One shuffle on user_id serves both window specs; the sum
    is an integer sum inside the frame (order-independent).  Equal-ts
    peers are included identically in both engines (RANGE frame
    semantics); the lag window adds event_id to the order for
    deterministic ties."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    ev = events.withColumn("tmic", F.unix_micros("ts"))
    day_us = 86_400_000_000
    wr = (
        Window.partitionBy("user_id").orderBy("tmic").rangeBetween(-day_us, 0)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(wr).alias("n_24h"),
        (F.sum(F.floor(F.col("value") * 100)).over(wr) / 100.0).alias("sum_24h"),
        (F.col("tmic") - F.lag("tmic").over(wl)).alias("micros_since_prev"),
    )


# --------------------------------------------------------------------------
# q79 — last-touch attribution (as-of join + attribution window).
# --------------------------------------------------------------------------
@register(
    "q79_attribution",
    covers=("J4", "T1"),
    oracle="""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c0 AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
c AS (SELECT user_id, click_ts, max(click_id) AS click_id FROM c0 GROUP BY user_id, click_ts),
j AS (
  SELECT p.purchase_id, p.user_id, p.ts, c.click_ts, c.click_id
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
)
SELECT purchase_id, user_id,
       CASE WHEN click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000
            THEN click_id END AS attributed_click_id,
       CASE WHEN click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000
            THEN epoch_us(ts) - epoch_us(click_ts) END AS lag_micros
FROM j
""",
)
def q79_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase attributes to the user's
    most recent PRIOR click within a 7-day window — the classic
    point-in-time enrichment built from :func:`asof_join` (X30) rather
    than an inequality join: one shuffle on user_id, state = one row.
    Clicks are deduped to one per (user, ts) (max event_id) per the
    as-of contract; outside-window matches null out rather than being
    dropped, so the output row set is exactly the purchase set."""
    from briefly_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts_v", F.col("click_ts"))
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_id", "click_ts_v"],
        how="left",
    )
    week_us = 7 * 86_400_000_000
    lag = F.unix_micros("ts") - F.unix_micros("click_ts_v")
    in_window = F.col("click_ts_v").isNotNull() & (lag <= week_us)
    return joined.select(
        "purchase_id",
        "user_id",
        F.when(in_window, F.col("click_id")).alias("attributed_click_id"),
        F.when(in_window, lag).alias("lag_micros"),
    )


# --------------------------------------------------------------------------
# q64 — weekly retention cohorts (first-seen cohort × weeks-since matrix).
# --------------------------------------------------------------------------
@register(
    "q64_retention_cohorts",
    covers=("A4", "W2"),
    oracle="""
WITH w AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort FROM w GROUP BY user_id)
SELECT CAST(cohort AS BIGINT) AS cohort_week,
       CAST(w.week - cohort AS BIGINT) AS week_no,
       count(DISTINCT w.user_id) AS n_active
FROM w JOIN first USING (user_id)
GROUP BY cohort_week, week_no
""",
)
def q64_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users bucketed by first-seen week
    (cohort), counted as active per week-offset.  Weeks are integer
    epoch-day div 7 — no date_trunc dialect drift.  Two shuffles total:
    one user_id aggregate for the cohort assignment (user-dimension-sized
    → broadcast back into the event stream map-side) and one
    (cohort, week_no) count-distinct.  At 100 TB the first-seen frame is
    the user dimension — if it outgrows broadcast, the join degrades to a
    shuffle on user_id that AQE co-locates with the first aggregate's
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), date'1970-01-01') div 7").alias("week"),
    )
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        wk.join(F.broadcast(first), "user_id")
        .groupBy(
            F.col("cohort").cast("long").alias("cohort_week"),
            (F.col("week") - F.col("cohort")).cast("long").alias("week_no"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
    )


# --------------------------------------------------------------------------
# q65 — exact per-user median inter-event gap (integer rank selection).
# --------------------------------------------------------------------------
@register(
    "q65_median_gap",
    covers=("W2", "A4"),
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(prev_ts) AS gap_us
  FROM o WHERE prev_ts IS NOT NULL
),
r AS (
  SELECT user_id, gap_us,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_us) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM g
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps, CAST(gap_us AS BIGINT) AS median_gap_us
FROM r WHERE rk = (n + 1) // 2
""",
)
def q65_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median of each user's inter-event gaps, by integer rank
    selection (rk = (n+1) div 2) — engine-exact where percentile
    interpolation is not: gaps are integer seconds and the selected
    element is an actual data value, so the hash gate holds bit-for-bit.
    ONE user_id shuffle serves all three windows (lag ordering, gap
    ranking, per-user count share the partition key); no global sort.
    At 100 TB a power-user partition is the hazard — the rank window is
    per-user-bounded, and the same selection rewrites as a
    partial-aggregated groupBy(user, gap) + cumulative count when user
    streams outgrow a task."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("ts").over(wo).alias("prev_ts"),
        )
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("gap_us")
    wc = Window.partitionBy("user_id")
    r = gaps.select(
        "user_id",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return r.filter(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.col("gap_us").cast("long").alias("median_gap_us"),
    )


# --------------------------------------------------------------------------
# q102 — peak concurrent sessions per day: interval endpoints + a
# DISTRIBUTED prefix sum (per-day partials, day-frame offsets).
# --------------------------------------------------------------------------
def _q112_logp_items(dialect: str) -> list[str]:
    """Staged smoothed-transition log-probability as lateral-alias SELECT
    items ending in ``… AS logp_fp`` (numerics.det_ln_items — same op
    order as the inline det_ln expansion, ~10× smaller SQL).  Shared by
    the q102 host's 'transitions' section (r15 graft) and its Spark leg."""
    from briefly_spark.numerics import det_ln_items

    return [
        *det_ln_items("c_pair + 1", "__l_num", dialect),
        *det_ln_items("c_prev + n_types", "__l_den", dialect),
        "CAST(floor(((__l_num) - (__l_den)) * 10000.0) AS BIGINT) AS logp_fp",
    ]


@register(
    "q102_peak_concurrency",
    covers=("A4", "W6", "A3", "W2"),
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTES OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         min(ts) AS s,
         max(ts) + INTERVAL 30 MINUTES AS e
  FROM (SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps)
  GROUP BY user_id, sid
),
ep AS (
  SELECT s AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM sess
),
epd AS (
  SELECT ts, delta,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM ep
),
daynet AS (SELECT day, sum(delta) AS net FROM epd GROUP BY day),
pref AS (
  SELECT day,
         sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - net AS off
  FROM daynet
),
run AS (
  SELECT epd.day,
         pref.off + sum(delta) OVER (PARTITION BY epd.day
                                     ORDER BY ts, delta) AS conc
  FROM epd JOIN pref ON epd.day = pref.day
),
tpairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
trans AS (
  SELECT event_type, next_type, count(*) AS c_pair
  FROM tpairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
tot AS (
  SELECT event_type, CAST(sum(c_pair) AS BIGINT) AS c_prev
  FROM trans GROUP BY event_type
),
v AS (SELECT count(DISTINCT next_type) AS n_types FROM trans),
tscored AS (
  SELECT event_type, next_type, c_pair, {', '.join(_q112_logp_items('duckdb'))}
  FROM trans JOIN tot USING (event_type) CROSS JOIN v
)
SELECT 'peak' AS section, CAST(day_off AS VARCHAR) AS k,
       CAST(peak_conc AS VARCHAR) AS value
FROM (SELECT CAST(day AS BIGINT) AS day_off,
             CAST(max(conc) AS BIGINT) AS peak_conc
      FROM run GROUP BY day)
UNION ALL
SELECT 'transitions' AS section,
       event_type || '>' || next_type AS k,
       CAST(c_pair AS VARCHAR) || '/' || CAST(logp_fp AS VARCHAR) AS value
FROM tscored
""",
)
def q102_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-open sessions per day — interval
    algebra as a DISTRIBUTED prefix sum, never a global sort: session
    endpoints (+1 at start, −1 at end; q72's session definition) shuffle
    once by day, per-day running sums are day-local windows, and
    cross-day carry-over comes from a day-dimension-sized prefix frame
    (one row per day, broadcast back).  conc = day_offset + intra-day
    running sum is the exact global concurrency at every endpoint.  Ties
    at one timestamp resolve ends-before-starts (ORDER BY ts, delta —
    back-to-back sessions never overlap), and the RANGE-frame peer
    semantics of both engines make tied rows share one running value, so
    the per-day max is engine-exact integer arithmetic throughout.  At
    100 TB the day partitioning scales with history length while each
    day's endpoint set stays bounded — the classic two-level scan
    pattern.

    r15 graft (capacity policy: q112_event_transitions' standalone seat
    retired into this host — both are one-pass analytics over the same
    per-user ordered event stream): the 'transitions' section is the
    first-order Markov transition matrix, the sequence-modeling
    counterpart of q48's bigram LM (user behavior instead of text).
    Laplace-smoothed log P(next | prev) = det_ln(c_pair + 1) −
    det_ln(c_prev + V), both arguments INTEGERS, so the fixed-point
    score is engine-exact.  ONE user_id shuffle orders each stream for
    the lead() pairing (ties broken by event_id); the pair tally
    partial-aggregates map-side into a |types|²-bounded frame; row
    totals and V derive from THAT tiny frame and broadcast back — at
    100 TB the only corpus-sized cost is the window shuffle."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    sess = events.groupBy(sw, "user_id").agg(F.count(F.lit(1)).alias("n")).select(
        F.col("session_window.start").alias("s"),
        F.col("session_window.end").alias("e"),
    )
    ep = sess.select(F.col("s").alias("ts"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    )
    epd = ep.withColumn(
        "day", F.expr("datediff(to_date(ts), date'1970-01-01')")
    )
    daynet = epd.groupBy("day").agg(F.sum("delta").alias("net"))
    day_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = daynet.select(
        "day", (F.sum("net").over(day_w) - F.col("net")).alias("off")
    )
    run_w = Window.partitionBy("day").orderBy("ts", "delta")
    run = (
        epd.join(F.broadcast(pref), "day")
        .withColumn("conc", F.col("off") + F.sum("delta").over(run_w))
    )
    peak_long = (
        run.groupBy(F.col("day").cast("long").alias("day_off"))
        .agg(F.max("conc").cast("long").alias("peak_conc"))
        .select(
            F.lit("peak").alias("section"),
            F.col("day_off").cast("string").alias("k"),
            F.col("peak_conc").cast("string").alias("value"),
        )
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tpairs = events.select(
        "event_type", F.lead("event_type").over(wl).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = tpairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("c_pair")
    )
    trans = trans.persist()
    tot = trans.groupBy("event_type").agg(F.sum("c_pair").alias("c_prev"))
    v = trans.agg(F.count_distinct("next_type").alias("n_types"))
    trans_long = (
        trans.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(v))
        .selectExpr("event_type", "next_type", "c_pair", *_q112_logp_items("spark"))
        .select(
            F.lit("transitions").alias("section"),
            F.concat_ws(">", "event_type", "next_type").alias("k"),
            F.concat_ws(
                "/", F.col("c_pair").cast("string"), F.col("logp_fp").cast("string")
            ).alias("value"),
        )
    )
    return peak_long.unionByName(trans_long)


# --------------------------------------------------------------------------
# q112 — next-event transition matrix (first-order Markov model).
# (Briefly retired into q102's 'transitions' section mid-r15; restored as
# a standalone seat at the r15 optimization open — the driver contract
# forbids a declared query disappearing between rounds.  The host section
# stays; _q112_logp_items above is shared by both.)
# --------------------------------------------------------------------------
def _q112_oracle() -> str:
    return f"""
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
trans AS (
  SELECT event_type, next_type, count(*) AS c_pair
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
tot AS (
  SELECT event_type, CAST(sum(c_pair) AS BIGINT) AS c_prev
  FROM trans GROUP BY event_type
),
v AS (SELECT count(DISTINCT next_type) AS n_types FROM trans),
scored AS (
  SELECT event_type, next_type, c_pair, {', '.join(_q112_logp_items('duckdb'))}
  FROM trans JOIN tot USING (event_type) CROSS JOIN v
)
SELECT event_type, next_type, c_pair, logp_fp FROM scored
"""


@register("q112_event_transitions", covers=("A3", "W2"), oracle=_q112_oracle())
def q112_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams —
    the sequence-modeling counterpart of q48's bigram LM (user behavior
    instead of text): Laplace-smoothed log P(next | prev) =
    det_ln(c_pair + 1) − det_ln(c_prev + V), both arguments INTEGERS, so
    the fixed-point score is engine-exact.  Plan: ONE user_id shuffle
    orders each user's stream for the lead() pairing (ties broken by
    event_id — deterministic), then the pair tally partial-aggregates
    map-side into a |types|²-bounded frame; row totals and the type count
    V derive from THAT tiny frame (no second corpus scan) and broadcast
    back.  At 100 TB the only corpus-sized cost is the one window
    shuffle; everything after is dimension-sized."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        "event_type", F.lead("event_type").over(wl).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("c_pair")
    )
    trans = trans.persist()
    tot = trans.groupBy("event_type").agg(F.sum("c_pair").alias("c_prev"))
    v = trans.agg(F.count_distinct("next_type").alias("n_types"))
    return (
        trans.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(v))
        .selectExpr("event_type", "next_type", "c_pair", *_q112_logp_items("spark"))
        .select("event_type", "next_type", "c_pair", "logp_fp")
    )
