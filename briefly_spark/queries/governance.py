"""q149 — the release-governance pack: ONE driver-gated composite that
hash-gates the mirror-pinned data-governance surface (VERDICT r11
next-round #2: drain the mirror-pinned backlog by CONSOLIDATION — at a
saturated 50-slot rotation, one registry seat must cover many ops, the
q147/q128 discipline).

Twelve operators graduate from mirror-pinned (evidence class 2) to
driver-gated under this one hash, each as a labelled leg of a single
tidy (section, metric, k, value) frame — the exact long format a
training run's governance report ships as:

  X124 column profiles        — single-pass numeric profiling (lineitem)
  X125 PSI histogram drift    — even/odd-orderkey snapshot drift
  X119 expectation anomalies  — 4-run metrics history, median-vs-latest
  X129 exact OLS group trend  — per-source length-over-id fit (documents)
  X131 trend registry fold    — same fit via 3 mergeable sums blocks;
                                fold ≡ one-shot is gated BY construction
                                (both legs hash against the same oracle)
  X130 k-anonymity/l-diversity audit — customer (nation × segment) QIs
  X132 generalization-to-k release   — greedy ladder promotion + the
                                post-release re-audit; the data-dependent
                                greedy is hash-gated through a STATIC
                                UNROLLED oracle (the q148 discipline: the
                                single-candidate ladder's decision tree is
                                2 levels deep, so the oracle replays it as
                                nested CASEs over the same crowd counts)
  X133 release datasheet      — the Gebru et al. data-card frame (documents)
  X137 datasheet registry fold — exact legs via 3 batch blocks; the HLL
                                distinct leg stays pytest-pinned (register
                                state is not SQL-expressible) and is
                                filtered from the hashed surface
  X136 pivot/unpivot          — lang × source crosstab, BOTH directions
                                (the unpivot output is the hashed surface)
  X139 exact top-k registry   — 3 batch blocks -> resolve ≡ one-shot top-k
  X141 Poisson bootstrap      — 8 deterministic replica means per source

Correctness: every leg re-uses an operator whose DuckDB mirror is
ALREADY value-pinned by the suite on this same testdata; the composite
oracle is the UNION ALL of those mirrors wrapped into the long format,
so a red here localizes by section.  All values cross the hash as
VARCHAR built from engine-primitive types (BIGINT / DECIMAL(38,0) ↔
HUGEINT / BOOLEAN — the check_oracle type-audit contract); doubles are
fixed-pointed before stringification (profiles min/max).

Scale (100 TB): every leg is a hash-aggregate or bounded-frame shape —
profiles ONE agg pass, drift two histograms + a bucket-space join,
trends one agg (+ a 3-block group-bounded fold), k-anonymity
group-bounded crowd aggs with the release anti-join AQE-planned
(NULL-safe keys), datasheet four bounded aggs, pivot one conditional
agg, top-k TakeOrdered heads, bootstrap one scan + one shuffle with the
replica dimension exploded map-side.  Nothing collects more than the
greedy's one scalar per round.  Output is dimension-bounded
(sections × groups), never corpus-sized.  Legs scan their tables
INDEPENDENTLY (the plan shows one FileScan per leg pass — clarity and
per-leg plan shapes over shared-scan caching); a production governance
run over one 100 TB table would persist/checkpoint the projected
columns once and feed every leg — the composition here exists to put
twelve operators under one driver hash, not to prescribe a shared-scan
schedule.

Reference parity: beyond-reference (SURVEY §2.10 training-data
governance surface; the reference trusts its stores blindly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.operators.bootstrap import bootstrap_means, sql_bootstrap_means
from briefly_spark.operators.datasheet import (
    dataset_datasheet,
    datasheet_batch_blocks,
    datasheet_registry_fold,
    sql_dataset_datasheet,
)
from briefly_spark.operators.expectations import (
    accepted,
    column_profiles,
    expectation_anomalies,
    expectation_report_runs,
    histogram_drift,
    in_range,
    not_null,
    sql_column_profiles,
    sql_expectation_anomalies,
    sql_expectation_report,
    sql_histogram_drift,
)
from briefly_spark.operators.privacy import (
    generalize_to_k,
    k_anonymity_summary,
    sql_k_anonymity_summary,
)
from briefly_spark.operators.reshape import (
    pivot_counts,
    sql_pivot_counts,
    unpivot_counts,
)
from briefly_spark.operators.sketches import topk_batch, topk_registry_resolve
from briefly_spark.operators.trends import (
    group_trend,
    sql_group_trend,
    trend_registry_fit,
    trend_sums_by_batch,
)
from briefly_spark.queries import register

# ---- shared leg parameters (Spark side and oracle side read the SAME
# constants, so a drift between the two is impossible) ----------------------

_PROFILE_COLS = ["l_quantity", "l_discount", "l_partkey"]
_DRIFT_COL, _DRIFT_WIDTH = "l_extendedprice", 5000.0
_TREND = dict(group_cols=["source"], x_col="doc_id", y_col="n_chars")
_TREND_COLS = ("n", "x_sum", "y_sum", "slope_num", "slope_den",
               "icept_num", "vary_num")
_QI = ["c_nationkey", "c_mktsegment"]
_K_ANON = 8
_SHEET = dict(id_col="doc_id", text_col="text", lang_col="lang",
              source_col="source")
_SOURCES = [f"src{i}" for i in range(20)]
_BOOT = dict(group_cols=["source"], value_col="n_chars", id_col="doc_id",
             b=8, seed=7)
_TOPK = 10
_N_BATCHES = 3
_N_RUNS = 4  # anomaly-history runs
_EST_METRICS = ("n_distinct_texts_est", "n_exact_dup_docs_est")

_OUT = ("section", "metric", "k", "value")


def _anomaly_checks(table: str) -> list:
    """The history checks — check NAMES must not mention the per-run
    slice table (history keys on (table, check) across runs)."""
    return [
        in_range(table, "l_discount", 0.0, 0.05),
        accepted(table, "l_returnflag", "A", "N"),
        not_null(table, "l_shipdate"),
    ]


def _run_filter(r: int) -> str:
    """Deterministic growing slice for anomaly-history run ``r``."""
    return f"l_orderkey % 7 < {2 * (r + 1)}"


# ---- Spark side -------------------------------------------------------------


def _long(df: DataFrame, section: str, k_expr: str,
          items: list[tuple[str, str]]) -> DataFrame:
    """Wide leg -> the tidy long frame: one row per (input row, metric)."""
    stack = ", ".join(f"'{m}', CAST({e} AS STRING)" for m, e in items)
    return df.selectExpr(
        f"'{section}' AS section",
        f"CAST({k_expr} AS STRING) AS k",
        f"stack({len(items)}, {stack}) AS (metric, value)",
    ).select(*_OUT)


def _spark_legs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    cust = load_table(spark, sf_dir, "customer")
    legs: list[DataFrame] = []

    # X124 — profiles (doubles fixed-pointed before stringification)
    legs.append(_long(
        column_profiles(li, _PROFILE_COLS), "profiles", "column",
        [("n_rows", "n_rows"), ("n_null", "n_null"),
         ("n_distinct", "n_distinct"),
         ("min_fp", "CAST(floor(min_v * 10000) AS BIGINT)"),
         ("max_fp", "CAST(floor(max_v * 10000) AS BIGINT)"),
         ("mean_fp", "mean_fp")],
    ))

    # X125 — PSI drift between even/odd orderkey snapshots
    drift = histogram_drift(
        li.filter("l_orderkey % 2 = 0"), li.filter("l_orderkey % 2 = 1"),
        _DRIFT_COL, bucket_width=_DRIFT_WIDTH,
    )
    legs.append(_long(drift, "drift", "bucket",
                      [("n_a", "n_a"), ("n_b", "n_b"),
                       ("term_fp", "term_fp")]))

    # X119 — anomaly detection over a 4-run expectation-metrics history.
    # r16: the four runs are GROWING slices of one table (they share most
    # rows), so the per-run report loop re-scanned lineitem 4× for 12
    # conditional counts; expectation_report_runs computes the whole
    # (run × check) grid in ONE aggregate pass — rows identical by the
    # shared _violation_pred (guide §2.1).
    hist = expectation_report_runs(
        li,
        {r: F.expr(_run_filter(r)) for r in range(_N_RUNS)},
        _anomaly_checks("lineitem"),
    ).select(
        "run_id",
        F.lit("lineitem").alias("table"),
        "check", "n_rows", "n_violations",
    )
    anom = expectation_anomalies(hist, min_history=3)
    legs.append(_long(anom, "anomalies", "check",
                      [("latest_run", "latest_run"), ("n_prior", "n_prior"),
                       ("median_rate_fp", "median_rate_fp"),
                       ("latest_rate_fp", "latest_rate_fp"),
                       ("delta_fp", "delta_fp"),
                       ("enough_history", "enough_history"),
                       ("anomaly", "anomaly")]))

    # X129 — one-shot exact OLS trend per source
    t_items = [(c, c) for c in _TREND_COLS]
    legs.append(_long(group_trend(docs, **_TREND), "trend", "source", t_items))

    # X131 — the SAME fit through the mergeable registry (3 sums blocks);
    # hashing both legs against one oracle gates fold ≡ one-shot itself.
    # r16: the blocks come from ONE grouped pass (batch_id = doc_id % 3)
    # instead of three filtered scans — row-identical registry (guide
    # §2.1; every batch is non-empty wherever the corpus has ≥3 docs,
    # and an empty batch contributes no rows under either form).
    blocks = trend_sums_by_batch(
        docs, batch_col=F.col("doc_id") % _N_BATCHES, **_TREND,
    )
    legs.append(_long(trend_registry_fit(blocks, group_cols=["source"]),
                      "trend_registry", "source", t_items))

    # X130 — release-risk audit (l-diversity over account balance)
    summ = k_anonymity_summary(
        cust, quasi_cols=_QI, k=_K_ANON, sensitive_col="c_acctbal", l=2,
    )
    legs.append(_long(summ, "kanon", "''",
                      [(m, m) for m in
                       ("k_min", "n_groups", "n_rows", "n_violating_groups",
                        "n_suppressed_rows", "l_min", "n_l_violating_groups")]))

    # X132 — greedy generalization-to-k + post-release re-audit.  The
    # ladder has ONE promotable column (nation -> nation DIV 5 -> NULL;
    # segment is a fixed QI partner), so the greedy's decision tree is the
    # 2-level unroll the static oracle replays.
    ladders = {
        "c_nationkey": [F.expr("c_nationkey DIV 5").cast("int"),
                        F.lit(None).cast("int")],
        "c_mktsegment": [],
    }
    released, audit = generalize_to_k(
        cust.select(*_QI), ladders=ladders, k=_K_ANON,
    )
    legs.append(spark.createDataFrame(
        [("kanon_release", "level", "c_nationkey",
          str(audit["levels"]["c_nationkey"])),
         ("kanon_release", "rounds", "", str(audit["rounds"])),
         ("kanon_release", "suppressed_rows", "",
          str(audit["suppressed_rows"]))],
        "section STRING, metric STRING, k STRING, value STRING",
    ))
    legs.append(_long(
        k_anonymity_summary(released, quasi_cols=_QI, k=_K_ANON),
        "kanon_release", "''",
        [(m, m) for m in ("k_min", "n_groups", "n_rows",
                          "n_violating_groups", "n_suppressed_rows")],
    ))

    # X133 — release datasheet (already the long shape; re-sectioned)
    legs.append(
        dataset_datasheet(docs, **_SHEET).select(
            F.concat(F.lit("sheet_"), F.col("section")).alias("section"),
            "metric", "k", F.col("value").cast("string").alias("value"),
        )
    )

    # X137 — datasheet registry fold, exact legs (the HLL distinct leg is
    # register state — pytest-pinned, excluded from the hashed surface).
    # r16: one grouped pass per leg (batch_id = doc_id % 3) instead of
    # three full per-batch datasheet scans — registry rows identical for
    # the non-empty batches a modulo slice of a ≥3-doc corpus always is.
    sheet_reg = datasheet_batch_blocks(
        docs, batch_col=F.col("doc_id") % _N_BATCHES, **_SHEET,
    )
    legs.append(
        datasheet_registry_fold(sheet_reg)
        .filter(~F.col("metric").isin(*_EST_METRICS))
        .select(
            F.concat(F.lit("sheetreg_"), F.col("section")).alias("section"),
            "metric", "k", F.col("value").cast("string").alias("value"),
        )
    )

    # X136 — pivot AND unpivot: the crosstab goes wide then back to long,
    # so both reshapes sit under the hash
    wide = pivot_counts(docs, row_keys=["lang"], pivot_col="source",
                        values=_SOURCES)
    narrow = unpivot_counts(wide, row_keys=["lang"], values=_SOURCES)
    legs.append(narrow.select(
        F.lit("pivot").alias("section"),
        F.lit("n_docs").alias("metric"),
        F.concat_ws("|", "lang", "k").alias("k"),
        F.col("n").cast("string").alias("value"),
    ))

    # X139 — exact top-k registry: 3 per-batch heads -> resolve; the
    # one-shot oracle IS the exactness claim (semilattice fold)
    tk_reg = None
    for i in range(_N_BATCHES):
        blk = topk_batch(
            docs.filter(F.col("doc_id") % _N_BATCHES == i)
            .select("doc_id", "n_chars"),
            score_col="n_chars", id_col="doc_id", k=_TOPK, batch_id=i,
        )
        tk_reg = blk if tk_reg is None else tk_reg.unionByName(blk)
    top = topk_registry_resolve(tk_reg, score_col="n_chars",
                                id_col="doc_id", k=_TOPK)
    legs.append(top.select(
        F.lit("topk").alias("section"),
        F.lit("n_chars_topk").alias("metric"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_chars").cast("string").alias("value"),
    ))

    # X141 — deterministic Poisson bootstrap replica means
    reps = bootstrap_means(docs, **_BOOT)
    legs.append(reps.select(
        F.lit("bootstrap").alias("section"),
        F.lit("stat").alias("metric"),
        F.concat_ws(":", "source", F.col("rep").cast("string")).alias("k"),
        F.concat_ws("/", F.col("n_eff").cast("string"),
                    F.col("mean_fp").cast("string")).alias("value"),
    ))

    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---- DuckDB oracle ----------------------------------------------------------


def _sql_long(inner: str, section: str, k_expr: str,
              items: list[tuple[str, str]]) -> str:
    vals = ", ".join(f"('{m}', CAST({e} AS VARCHAR))" for m, e in items)
    return (
        f"SELECT '{section}' AS section, t.m AS metric, "
        f"CAST({k_expr} AS VARCHAR) AS k, t.v AS value\n"
        f"FROM ({inner}) q, LATERAL (VALUES {vals}) AS t(m, v)"
    )


def _sql_kanon_release() -> str:
    """The static 2-level unroll of the single-candidate greedy (module
    doc): lvl = first level whose sub-k row count is zero, else the
    ladder top; release = crowds >= k at lvl; audit scalars replayed
    from the same counts."""
    k = _K_ANON

    def bad(group_expr: str) -> str:
        return (
            f"(SELECT coalesce(sum(CASE WHEN cnt < {k} THEN cnt ELSE 0 END), 0)"
            f" FROM (SELECT count(*) AS cnt FROM cqi GROUP BY {group_expr}))"
        )

    return f"""WITH cqi AS (
  SELECT c_nationkey AS q, c_mktsegment AS s FROM customer
), b AS (
  SELECT {bad('q, s')} AS bad0, {bad('(q // 5), s')} AS bad1,
         {bad('s')} AS bad2
), lv AS (
  SELECT CASE WHEN bad0 = 0 THEN 0 WHEN bad1 = 0 THEN 1 ELSE 2 END AS lvl,
         CASE WHEN bad0 = 0 THEN 0 WHEN bad1 = 0 THEN 0 ELSE bad2 END
           AS suppressed
  FROM b
), grp AS (
  SELECT CASE (SELECT lvl FROM lv) WHEN 0 THEN q WHEN 1 THEN q // 5
         ELSE NULL END AS qf,
         s, CAST(count(*) AS BIGINT) AS cnt
  FROM cqi GROUP BY 1, 2
), rel AS (SELECT * FROM grp WHERE cnt >= {k})
SELECT 'kanon_release' AS section, 'level' AS metric, 'c_nationkey' AS k,
       CAST((SELECT lvl FROM lv) AS VARCHAR) AS value
UNION ALL SELECT 'kanon_release', 'rounds', '',
       CAST((SELECT lvl FROM lv) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'suppressed_rows', '',
       CAST((SELECT suppressed FROM lv) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'k_min', '',
       CAST((SELECT CAST(min(cnt) AS BIGINT) FROM rel) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'n_groups', '',
       CAST((SELECT CAST(count(*) AS BIGINT) FROM rel) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'n_rows', '',
       CAST((SELECT CAST(sum(cnt) AS BIGINT) FROM rel) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'n_violating_groups', '',
       CAST((SELECT CAST(sum(CASE WHEN cnt < {k} THEN 1 ELSE 0 END) AS BIGINT)
             FROM rel) AS VARCHAR)
UNION ALL SELECT 'kanon_release', 'n_suppressed_rows', '',
       CAST((SELECT CAST(sum(CASE WHEN cnt < {k} THEN cnt ELSE 0 END)
             AS BIGINT) FROM rel) AS VARCHAR)"""


def _sql_anomalies() -> str:
    runs = ",\n".join(
        f"run{r} AS (SELECT * FROM lineitem WHERE {_run_filter(r)})"
        for r in range(_N_RUNS)
    )
    hist = "\nUNION ALL\n".join(
        f"SELECT {r} AS run_id, 'lineitem' AS \"table\", \"check\","
        f" n_rows, n_violations"
        f" FROM ({sql_expectation_report(_anomaly_checks(f'run{r}'))})"
        for r in range(_N_RUNS)
    )
    anom = sql_expectation_anomalies("hist", min_history=3)
    inner = f"WITH {runs},\nhist AS (\n{hist}\n)\nSELECT * FROM ({anom})"
    return _sql_long(
        inner, "anomalies", '"check"',
        [("latest_run", "latest_run"), ("n_prior", "n_prior"),
         ("median_rate_fp", "median_rate_fp"),
         ("latest_rate_fp", "latest_rate_fp"), ("delta_fp", "delta_fp"),
         ("enough_history", "enough_history"), ("anomaly", "anomaly")],
    )


def _oracle() -> str:
    t_items = [(c, c) for c in _TREND_COLS]
    trend = sql_group_trend("documents", **_TREND)
    sheet = sql_dataset_datasheet("documents", **_SHEET)
    piv = sql_pivot_counts("documents", row_keys=["lang"],
                           pivot_col="source", values=_SOURCES)
    unpiv = "\nUNION ALL\n".join(
        f"SELECT 'pivot' AS section, 'n_docs' AS metric,"
        f" lang || '|' || '{v}' AS k, CAST(n_{v} AS VARCHAR) AS value"
        f" FROM piv"
        for v in _SOURCES
    )
    legs = [
        _sql_long(sql_column_profiles("lineitem", _PROFILE_COLS),
                  "profiles", '"column"',
                  [("n_rows", "n_rows"), ("n_null", "n_null"),
                   ("n_distinct", "n_distinct"),
                   ("min_fp", "CAST(floor(min_v * 10000) AS BIGINT)"),
                   ("max_fp", "CAST(floor(max_v * 10000) AS BIGINT)"),
                   ("mean_fp", "mean_fp")]),
        _sql_long(
            "WITH ev AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0),\n"
            "od AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1)\n"
            "SELECT * FROM (" + sql_histogram_drift(
                "ev", "od", _DRIFT_COL, bucket_width=_DRIFT_WIDTH) + ")",
            "drift", "bucket",
            [("n_a", "n_a"), ("n_b", "n_b"), ("term_fp", "term_fp")]),
        _sql_anomalies(),
        _sql_long(trend, "trend", "source", t_items),
        # X131: fold ≡ one-shot — the registry leg hashes against the SAME
        # one-shot oracle (the exactness pin, now under the driver hash)
        _sql_long(trend, "trend_registry", "source", t_items),
        _sql_long(sql_k_anonymity_summary(
            "customer", quasi_cols=_QI, k=_K_ANON,
            sensitive_col="c_acctbal", l=2),
            "kanon", "''",
            [(m, m) for m in
             ("k_min", "n_groups", "n_rows", "n_violating_groups",
              "n_suppressed_rows", "l_min", "n_l_violating_groups")]),
        # a WITH-headed statement cannot be a bare UNION ALL arm
        f"SELECT * FROM (\n{_sql_kanon_release()}\n)",
        f"SELECT 'sheet_' || section AS section, metric, k,"
        f" CAST(value AS VARCHAR) AS value FROM ({sheet})",
        # X137 exact legs: fold ≡ one-shot minus the sketch-estimate rows
        f"SELECT 'sheetreg_' || section AS section, metric, k,"
        f" CAST(value AS VARCHAR) AS value FROM ({sheet})"
        f" WHERE metric NOT IN ('n_distinct_texts', 'n_exact_dup_docs')",
        f"SELECT * FROM (WITH piv AS ({piv})\n{unpiv}\n)",
        # X139: resolve ≡ one-shot exact top-k under the total order
        f"SELECT 'topk' AS section, 'n_chars_topk' AS metric,"
        f" CAST(doc_id AS VARCHAR) AS k, CAST(n_chars AS VARCHAR) AS value"
        f" FROM (SELECT doc_id, n_chars FROM documents"
        f" ORDER BY n_chars DESC, doc_id ASC LIMIT {_TOPK})",
        f"SELECT 'bootstrap' AS section, 'stat' AS metric,"
        f" source || ':' || CAST(rep AS VARCHAR) AS k,"
        f" CAST(n_eff AS VARCHAR) || '/' || CAST(mean_fp AS VARCHAR) AS value"
        f" FROM ({sql_bootstrap_means('documents', **_BOOT)})",
    ]
    return "\nUNION ALL\n".join(legs)


@register(
    "q149_governance_pack",
    covers=("A3", "A4", "U2"),
    oracle=_oracle(),
)
def q149_governance_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-governance composite (module doc): column profiles (X124),
    PSI drift (X125), expectation anomalies (X119), exact OLS trend one-
    shot + registry fold (X129/X131), k-anonymity audit (X130), greedy
    generalization-to-k release (X132), release datasheet one-shot +
    registry exact legs (X133/X137), pivot/unpivot (X136), exact top-k
    registry (X139), and Poisson bootstrap (X141) — one tidy
    (section, metric, k, value) frame under one driver hash."""
    return _spark_legs(spark, sf_dir)
