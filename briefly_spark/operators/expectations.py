"""Declarative data-quality expectations — the Deequ/Great-Expectations
audit a 100 TB lake runs before trusting a table (public methods: Schelter
et al., "Automating Large-Scale Data Quality Verification", VLDB 2018).

A check is a declarative tuple; the report is one row per check with the
violation count — never a row per violation (the report stays
check-bounded at any corpus size).  Check kinds:

- ``unique(cols)``        — key uniqueness: n_rows − n_distinct(keys)
- ``not_null(col)``       — NULL count
- ``in_range(col, lo, hi)`` — values outside [lo, hi] (NULLs not counted:
  compose with not_null to assert both)
- ``accepted(col, values)`` — values outside an allow-set (NULLs counted:
  NULL is not an accepted value)
- ``fk(col, parent, parent_col)`` — child keys missing from the parent
  (referential containment; NULL FKs not counted — SQL FK semantics)

Scale design: every per-table check family collapses into ONE aggregate
pass over that table — the conditional counts are evaluated together in
a single ``agg`` and the per-check report rows are exploded OUT OF that
one-row aggregate (Spark has no cross-branch subtree reuse, so a
union-of-selects over the same agg would re-scan the table once per
check — the q127/q130 lesson).  ``unique`` adds one count-distinct
(partial-agg); ``fk`` is one left join + conditional count per (child,
parent) pair, with the PARENT side broadcast ONLY when the caller marks
it dimension-sized (``fk(..., dim=True)``) — an unconditional broadcast
hint on a fact-sized parent would force a driver collect of the key set
and OOM at 100 TB; un-hinted, AQE picks the strategy from runtime stats.
The emitted report is all-BIGINT + VARCHAR (the oracle-surface type
contract), so a registry entry can hash it directly.

Continuous-ingest half (Deequ's metrics repository + anomaly detection,
Schelter et al. §3.3): :func:`expectation_history_merge` persists each
audit run's report into a warehouse table keyed by run_id (group-replace
— the q120/NB replay discipline), and :func:`expectation_anomalies`
compares the newest run's violation RATE per (table, check) against the
exact median of the prior runs — a point-in-time audit says "is the
table valid", the history says "did quality MOVE", which is what pages
an on-call when an upstream ships a bad batch into a lake whose checks
all still individually pass (e.g. a null-rate drifting 0.1% → 3%).
Everything is (checks × runs)-bounded — corpus size never appears.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str  # unique | not_null | in_range | accepted | fk
    table: str
    cols: tuple[str, ...]
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    parent: str | None = None
    parent_cols: tuple[str, ...] = field(default_factory=tuple)
    #: parent is dimension-sized -> safe to broadcast its key set (fk only)
    dim: bool = False


def unique(table: str, *cols: str) -> Check:
    return Check("unique", table, tuple(cols))


def not_null(table: str, col: str) -> Check:
    return Check("not_null", table, (col,))


def in_range(table: str, col: str, lo: float, hi: float) -> Check:
    return Check("in_range", table, (col,), lo=lo, hi=hi)


def accepted(table: str, col: str, *values) -> Check:
    return Check("accepted", table, (col,), values=tuple(values))


def fk(table: str, col: str, parent: str, parent_col: str, dim: bool = False) -> Check:
    """``dim=True`` asserts the parent is dimension-sized (its distinct
    key set fits a broadcast); leave False for fact-sized parents so the
    join strategy is AQE's call."""
    return Check("fk", table, (col,), parent=parent, parent_cols=(parent_col,), dim=dim)


def _violation_pred(c: Check):
    """Row-level violation predicate for the CONDITIONAL kinds — the one
    source of truth :func:`expectation_report` (per-table agg) and
    :func:`expectation_report_runs` (per-slice agg) both count.  Never
    NULL: NULL-column semantics are folded in per kind (in_range ignores
    NULL values, accepted counts them — a NULL is not an accepted value).
    Returns None for the join/distinct kinds."""
    if c.kind == "not_null":
        return F.col(c.cols[0]).isNull()
    if c.kind == "in_range":
        col = F.col(c.cols[0])
        return col.isNotNull() & ((col < c.lo) | (col > c.hi))
    if c.kind == "accepted":
        return ~F.coalesce(F.col(c.cols[0]).isin(list(c.values)), F.lit(False))
    return None


def _check_name(c: Check) -> str:
    base = f"{c.kind}({', '.join(c.cols)})"
    if c.kind == "in_range":
        base = f"in_range({c.cols[0]}, {c.lo!r}, {c.hi!r})"
    elif c.kind == "accepted":
        base = f"accepted({c.cols[0]}, {list(c.values)!r})"
    elif c.kind == "fk":
        base = f"fk({c.cols[0]} -> {c.parent}.{c.parent_cols[0]})"
    return base


def expectation_report(
    spark: SparkSession, tables: dict[str, DataFrame], checks: list[Check]
) -> DataFrame:
    """Evaluate every check and return the audit report:
    (table, check, n_rows, n_violations, passed) — one row per check,
    deterministic order irrelevant (callers sort or hash).

    All not_null / in_range / accepted / unique checks against one table
    share a SINGLE aggregate pass (conditional counts + the unique
    checks' count-distincts, report rows exploded from the one agg row —
    no per-check re-scan), and all fk checks from one child share a
    single chained-left-join pass against their parents' distinct key
    sets — so each table is scanned once as a check subject and once per
    child-role (r16; guide §2.1).

    An empty ``checks`` list yields an empty report (same schema); a
    check naming a table or parent absent from ``tables`` raises
    ``ValueError`` with the offending name."""
    report_schema = (
        "table STRING, check STRING, n_rows LONG, n_violations LONG"
    )
    known_kinds = ("not_null", "in_range", "accepted", "unique", "fk")
    for c in checks:
        # an unknown kind must refuse loudly here (review r12): the arm
        # loops below would silently skip it — an audit reading absence
        # as "passed" — and the SQL mirror already raises for the same
        # input, so the two surfaces disagreed
        if c.kind not in known_kinds:
            raise ValueError(
                f"check {_check_name(c)!r}: unknown kind {c.kind!r} "
                f"(known: {known_kinds})"
            )
        for t in (c.table, c.parent):
            if t is not None and t not in tables:
                raise ValueError(
                    f"check {_check_name(c)!r} names unregistered table {t!r}"
                )
    if not checks:
        return spark.createDataFrame([], schema=report_schema).select(
            "table", "check", "n_rows", "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    frames: list[DataFrame] = []
    by_table: dict[str, list[Check]] = {}
    for c in checks:
        by_table.setdefault(c.table, []).append(c)

    for tname, tchecks in by_table.items():
        df = tables[tname]
        nrows = F.count(F.lit(1)).cast("long")
        # ONE scan for every conditional check on this table: a single
        # agg, then the per-check rows exploded out of its one row.  A
        # union of per-check selects over the same agg frame would
        # re-plan (and re-scan) the aggregate once per arm — Spark has no
        # cross-branch common-subtree reuse (ADVICE r09).  The unique
        # checks deliberately KEEP their own pass: folding them into this
        # agg was tried at r16 and measured SLOWER (Spark's
        # single-distinct rewrite keys the partial aggregate on the
        # distinct columns, so the conditional sums ride a
        # one-row-per-key shuffle instead of a one-row-per-partition
        # one — the fusion saved one narrow scan and paid a corpus-keyed
        # shuffle of the extra buffers; q147 +0.3 s at sf0.1 isolated
        # alternation, and strictly worse at 100 TB where the distinct
        # key count grows with the corpus).
        cond_aggs = []
        cond_names = []
        for c in tchecks:
            viol = _violation_pred(c)
            if viol is None:
                continue
            cond_names.append(_check_name(c))
            cond_aggs.append(
                F.sum(F.when(viol, 1).otherwise(0))
                .cast("long").alias(f"v{len(cond_aggs)}")
            )
        if cond_aggs:
            row = df.agg(nrows.alias("n_rows"), *cond_aggs)
            kv = F.explode(
                F.array(*[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.coalesce(F.col(f"v{i}"), F.lit(0))
                        .cast("long")
                        .alias("n_violations"),
                    )
                    for i, name in enumerate(cond_names)
                ])
            ).alias("kv")
            frames.append(
                row.select("n_rows", kv).select(
                    F.lit(tname).alias("table"),
                    F.col("kv.check").alias("check"),
                    "n_rows",
                    F.col("kv.n_violations").alias("n_violations"),
                )
            )
        for c in tchecks:
            if c.kind == "unique":
                # uniqueness is asserted over PRESENT keys (rows with a
                # NULL key component are not counted here — compose with
                # not_null to assert presence; count_distinct drops NULLs,
                # so the subtraction must too)
                keyed = df.na.drop(subset=list(c.cols))
                row = keyed.agg(
                    nrows.alias("n_rows"),
                    (
                        F.count(F.lit(1)) - F.count_distinct(*[F.col(x) for x in c.cols])
                    ).cast("long").alias("n_violations"),
                )
                frames.append(
                    row.select(
                        F.lit(tname).alias("table"),
                        F.lit(_check_name(c)).alias("check"),
                        "n_rows", "n_violations",
                    )
                )
        # ONE pass over the child for ALL its fk checks (r16; previously
        # one child scan per relationship): chain a LEFT join per parent
        # against its DISTINCT key set (dedup ⇒ at most one match per
        # child row — no row multiplication), then count every check's
        # rows and unmatched keys from the single joined frame.  Each
        # check's n_rows counts only PRESENT child keys (the old
        # per-check ``filter(isNotNull)``), now as a conditional count.
        # Broadcast only on the caller's dim=True assertion — a
        # fact-sized parent key set must go through a shuffled join (AQE
        # decides), never a driver collect.
        fks = [c for c in tchecks if c.kind == "fk"]
        if fks:
            joined = df
            for j, c in enumerate(fks):
                parent = tables[c.parent].select(
                    F.col(c.parent_cols[0]).alias(f"__pk{j}")
                ).distinct()
                if c.dim:
                    parent = F.broadcast(parent)
                joined = joined.join(
                    parent, df[c.cols[0]] == F.col(f"__pk{j}"), "left"
                )
            fk_aggs = []
            fk_structs = []
            for j, c in enumerate(fks):
                key = F.col(c.cols[0])
                fk_aggs.append(
                    F.sum(F.when(key.isNotNull(), 1).otherwise(0))
                    .cast("long").alias(f"fn{j}")
                )
                fk_aggs.append(
                    F.sum(
                        F.when(key.isNotNull() & F.col(f"__pk{j}").isNull(), 1)
                        .otherwise(0)
                    ).cast("long").alias(f"fv{j}")
                )
                fk_structs.append(
                    F.struct(
                        F.lit(_check_name(c)).alias("check"),
                        F.coalesce(F.col(f"fn{j}"), F.lit(0))
                        .cast("long").alias("n_rows"),
                        F.coalesce(F.col(f"fv{j}"), F.lit(0))
                        .cast("long").alias("n_violations"),
                    )
                )
            row = joined.agg(*fk_aggs)
            kv = F.explode(F.array(*fk_structs)).alias("kv")
            frames.append(
                row.select(kv).select(
                    F.lit(tname).alias("table"),
                    F.col("kv.check").alias("check"),
                    F.col("kv.n_rows").alias("n_rows"),
                    F.col("kv.n_violations").alias("n_violations"),
                )
            )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.select(
        "table", "check", "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def expectation_report_runs(
    df: DataFrame, runs: dict[int, "F.Column"], checks: list[Check]
) -> DataFrame:
    """The X119 anomaly-history shape in ONE aggregate pass (r16, guide
    §2.1): the SAME conditional checks evaluated over several
    predicate-sliced runs of one table — (run × check) conditional counts
    from a single scan, instead of one :func:`expectation_report` scan
    per run (the slices usually overlap, so per-run scans re-read the
    same rows).  Output: (run_id, check, n_rows, n_violations) — exactly
    the rows ``expectation_report`` emits for ``df.filter(pred)`` per
    run, by construction: n_rows = Σ(pred), violations = Σ(pred ∧
    violation), with the shared row-level :func:`_violation_pred`.
    Conditional kinds only (unique/fk need per-slice distinct/join
    passes — callers with those keep the per-run report)."""
    agg_exprs = []
    kv_structs = []
    for r, pred in runs.items():
        i = len(agg_exprs)
        agg_exprs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"v{i}")
        )
        for c in checks:
            viol = _violation_pred(c)
            if viol is None:
                raise ValueError(
                    f"expectation_report_runs: check {_check_name(c)!r} is "
                    f"{c.kind!r} — only conditional kinds share one pass"
                )
            j = len(agg_exprs)
            agg_exprs.append(
                F.sum(F.when(pred & viol, 1).otherwise(0))
                .cast("long").alias(f"v{j}")
            )
            kv_structs.append(
                F.struct(
                    F.lit(int(r)).cast("long").alias("run_id"),
                    F.lit(_check_name(c)).alias("check"),
                    F.coalesce(F.col(f"v{i}"), F.lit(0))
                    .cast("long").alias("n_rows"),
                    F.coalesce(F.col(f"v{j}"), F.lit(0))
                    .cast("long").alias("n_violations"),
                )
            )
    row = df.agg(*agg_exprs)
    kv = F.explode(F.array(*kv_structs)).alias("kv")
    return row.select(kv).select(
        F.col("kv.run_id").alias("run_id"),
        F.col("kv.check").alias("check"),
        F.col("kv.n_rows").alias("n_rows"),
        F.col("kv.n_violations").alias("n_violations"),
    )


def sql_expectation_report(checks: list[Check]) -> str:
    """DuckDB mirror of :func:`expectation_report` — one UNION ALL arm per
    check, identical check-name strings, identical NULL semantics
    (uniqueness over present keys; in_range ignores NULLs; accepted
    counts NULLs; FK per SQL semantics).  Ready for a registry oracle;
    until then tests/test_expectations.py runs it against DuckDB directly
    and value-compares with the Spark report."""
    arms = []
    for c in checks:
        name = _check_name(c).replace("'", "''")
        # coalesce(sum(...), 0): on an EMPTY table SQL sum is NULL while the
        # Spark report coalesces its conditional counts to 0 (passed=true) —
        # without it the two surfaces disagree on empty inputs (review r12,
        # deferred to ride q147's r13 graft so the hash moved inside a gate
        # window)
        if c.kind == "not_null":
            arms.append(
                f"SELECT '{c.table}' AS tbl, '{name}' AS chk,"
                f" CAST(count(*) AS BIGINT) AS n_rows,"
                f" CAST(coalesce(sum(CASE WHEN {c.cols[0]} IS NULL THEN 1 ELSE 0 END), 0)"
                f" AS BIGINT)"
                f" AS n_violations FROM {c.table}"
            )
        elif c.kind == "in_range":
            col = c.cols[0]
            arms.append(
                f"SELECT '{c.table}', '{name}', CAST(count(*) AS BIGINT),"
                f" CAST(coalesce(sum(CASE WHEN {col} IS NOT NULL AND"
                f" ({col} < {c.lo!r} OR {col} > {c.hi!r}) THEN 1 ELSE 0 END), 0) AS BIGINT)"
                f" FROM {c.table}"
            )
        elif c.kind == "accepted":
            vals = ", ".join(
                "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else repr(v)
                for v in c.values
            )
            arms.append(
                f"SELECT '{c.table}', '{name}', CAST(count(*) AS BIGINT),"
                f" CAST(coalesce(sum(CASE WHEN {c.cols[0]} IN ({vals}) THEN 0 ELSE 1 END), 0)"
                f" AS BIGINT) FROM {c.table}"
            )
        elif c.kind == "unique":
            present = " AND ".join(f"{x} IS NOT NULL" for x in c.cols)
            cols = ", ".join(c.cols)
            arms.append(
                f"SELECT '{c.table}', '{name}',"
                f" CAST((SELECT count(*) FROM {c.table} WHERE {present}) AS BIGINT),"
                f" CAST((SELECT count(*) FROM {c.table} WHERE {present})"
                f" - (SELECT count(*) FROM (SELECT DISTINCT {cols} FROM {c.table}"
                f" WHERE {present})) AS BIGINT)"
            )
        elif c.kind == "fk":
            col = c.cols[0]
            pc = c.parent_cols[0]
            arms.append(
                f"SELECT '{c.table}', '{name}',"
                f" CAST((SELECT count(*) FROM {c.table} WHERE {col} IS NOT NULL)"
                f" AS BIGINT),"
                f" CAST((SELECT count(*) FROM {c.table} WHERE {col} IS NOT NULL"
                f" AND {col} NOT IN (SELECT {pc} FROM {c.parent}"
                f" WHERE {pc} IS NOT NULL)) AS BIGINT)"
            )
        else:  # pragma: no cover - constructor-bounded
            raise ValueError(f"unknown check kind {c.kind!r}")
    union = "\nUNION ALL\n".join(arms)
    return (
        'SELECT tbl AS "table", chk AS "check", n_rows, n_violations,\n'
        "       n_violations = 0 AS passed\n"
        f"FROM (\n{union}\n) t(tbl, chk, n_rows, n_violations)"
    )


def expectation_history_merge(wh, report: DataFrame, table: str, run_id: int) -> None:
    """Persist one audit run's report into the metrics-history table,
    keyed by ``run_id`` ALONE (group-replace): re-running an audit for
    the same run_id replaces its ENTIRE prior contribution, so a crashed
    or replayed audit job never double-counts and rows from a
    differently-configured earlier attempt cannot linger — the q120 /
    NB-registry merge discipline.  History rows are
    (run_id, table, check, n_rows, n_violations): (runs × checks)-bounded."""
    wh.merge_upsert(
        report.select(
            F.lit(int(run_id)).cast("long").alias("run_id"),
            "table",
            "check",
            "n_rows",
            "n_violations",
        ),
        table,
        ["run_id"],
    )


def expectation_anomalies(
    history: DataFrame,
    *,
    min_history: int = 3,
    threshold_fp: int = 100,
) -> DataFrame:
    """Per (table, check): the newest run's violation rate against the
    exact median of ALL PRIOR runs' rates — Deequ-style anomaly detection
    on the metrics history.

    Rates are RATIO-scale fixed point (``floor(v·10⁴/n)``, 0 for an
    empty table); the median is DuckDB-compatible exact percentile over
    ≤ runs integer values per check, floored once.  ``anomaly`` fires
    when the absolute rate move exceeds ``threshold_fp`` (default 100 =
    one percentage point) AND the check has ``min_history`` prior runs —
    younger checks report ``enough_history = false`` and never fire
    (a new check's first runs are baseline-building, not anomalies).

    Scale: one groupBy over the (runs × checks)-bounded history; the
    corpus the audits measured never appears here."""
    rate = F.when(
        F.col("n_rows") > 0,
        F.floor(F.col("n_violations") * 10000 / F.col("n_rows")),
    ).otherwise(F.lit(0)).cast("long")
    h = history.select("run_id", "table", "check", rate.alias("rate_fp"))
    latest_run = h.groupBy("table", "check").agg(F.max("run_id").alias("run_id"))
    latest = h.join(latest_run, ["table", "check", "run_id"]).select(
        "table", "check", F.col("run_id").alias("latest_run"),
        F.col("rate_fp").alias("latest_rate_fp"),
    )
    prior = h.join(latest_run.withColumnRenamed("run_id", "mx"), ["table", "check"]).filter(
        F.col("run_id") < F.col("mx")
    )
    base = prior.groupBy("table", "check").agg(
        F.count(F.lit(1)).cast("long").alias("n_prior"),
        F.floor(F.expr("percentile(rate_fp, 0.5)")).cast("long").alias("median_rate_fp"),
    )
    return (
        latest.join(base, ["table", "check"], "left")
        .select(
            "table",
            "check",
            "latest_run",
            F.coalesce("n_prior", F.lit(0)).cast("long").alias("n_prior"),
            F.coalesce("median_rate_fp", F.lit(0)).cast("long").alias("median_rate_fp"),
            "latest_rate_fp",
            (F.col("latest_rate_fp") - F.coalesce("median_rate_fp", F.lit(0)))
            .cast("long")
            .alias("delta_fp"),
            (F.coalesce("n_prior", F.lit(0)) >= min_history).alias("enough_history"),
        )
        .withColumn(
            "anomaly",
            F.col("enough_history") & (F.abs(F.col("delta_fp")) > threshold_fp),
        )
    )


def sql_expectation_anomalies(
    history_table: str,
    *,
    min_history: int = 3,
    threshold_fp: int = 100,
) -> str:
    """DuckDB mirror of :func:`expectation_anomalies` — identical rate
    fixed-pointing, exact interpolating median (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``; midpoints of integers are exactly
    representable doubles, floored once), identical NULL handling.
    Value-compared in tests; ready as a registry oracle if the anomaly
    surface is ever gated."""
    return f"""WITH h AS (
  SELECT run_id, "table", "check",
         CAST(CASE WHEN n_rows > 0
              THEN floor(n_violations * 10000 / n_rows) ELSE 0 END AS BIGINT)
           AS rate_fp
  FROM {history_table}
), mx AS (
  SELECT "table", "check", max(run_id) AS latest_run FROM h GROUP BY 1, 2
), latest AS (
  SELECT h."table", h."check", mx.latest_run, h.rate_fp AS latest_rate_fp
  FROM h JOIN mx ON h."table" = mx."table" AND h."check" = mx."check"
             AND h.run_id = mx.latest_run
), prior AS (
  SELECT h."table", h."check", h.rate_fp
  FROM h JOIN mx ON h."table" = mx."table" AND h."check" = mx."check"
  WHERE h.run_id < mx.latest_run
), base AS (
  SELECT "table", "check", CAST(count(*) AS BIGINT) AS n_prior,
         CAST(floor(quantile_cont(rate_fp, 0.5)) AS BIGINT) AS median_rate_fp
  FROM prior GROUP BY 1, 2
)
SELECT l."table", l."check", l.latest_run,
       CAST(coalesce(b.n_prior, 0) AS BIGINT) AS n_prior,
       CAST(coalesce(b.median_rate_fp, 0) AS BIGINT) AS median_rate_fp,
       l.latest_rate_fp,
       CAST(l.latest_rate_fp - coalesce(b.median_rate_fp, 0) AS BIGINT) AS delta_fp,
       coalesce(b.n_prior, 0) >= {min_history} AS enough_history,
       (coalesce(b.n_prior, 0) >= {min_history})
         AND abs(l.latest_rate_fp - coalesce(b.median_rate_fp, 0)) > {threshold_fp}
         AS anomaly
FROM latest l
LEFT JOIN base b ON l."table" = b."table" AND l."check" = b."check" """


def column_profiles(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass numeric column profiling — the Analyzer layer next to
    the check layer (Deequ's Profiles; Schelter et al. §3.1): per column
    (column, n_rows, n_null, n_distinct, min_v, max_v, mean_fp).

    ONE aggregate job over the table for every requested column, rows
    exploded from the single agg row (the expectation_report discipline).
    The exact ``n_distinct`` columns make Spark plan a single Expand —
    input rows multiply by the number of profiled columns INSIDE one
    shuffle (the standard cost of multi-column exact distinct profiling;
    swap in approx_count_distinct when profiling wide tables at 100 TB
    and exactness isn't contractual — the oracle mirror requires exact).

    Determinism: min/max are order-independent; the mean is the
    fixed-point discipline (``floor(x·10⁴)`` summed exactly, ONE integer
    division at the end) so the surface hash never depends on
    aggregation order; all-NULL and empty columns profile to NULL
    min/max/mean, zero counts."""
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column_profiles: unknown column {c!r}")
        dt = dict(df.dtypes)[c]
        if dt.split("(")[0] not in numeric:
            raise ValueError(
                f"column_profiles: {c!r} has non-numeric type {dt!r} — the "
                "min/max/mean casts would silently NULL; profile numeric "
                "columns only (string columns: profile length(col) instead)"
            )
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"n_{i}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"z_{i}"),
            F.count_distinct(col).cast("long").alias(f"d_{i}"),
            F.min(col).cast("double").alias(f"mn_{i}"),
            F.max(col).cast("double").alias(f"mx_{i}"),
            F.sum(F.floor(col * 10000)).cast("long").alias(f"s_{i}"),
        ]
    row = df.agg(*aggs)
    kv = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"n_{i}"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.col(f"z_{i}"), F.lit(0)).alias("n_null"),
                F.coalesce(F.col(f"d_{i}"), F.lit(0)).alias("n_distinct"),
                F.col(f"mn_{i}").alias("min_v"),
                F.col(f"mx_{i}").alias("max_v"),
                F.when(
                    (F.col(f"n_{i}") - F.col(f"z_{i}")) > 0,
                    F.expr(f"s_{i} div (n_{i} - z_{i})"),
                ).cast("long").alias("mean_fp"),
            )
            for i, c in enumerate(cols)
        ])
    ).alias("kv")
    return row.select(kv).select("kv.*")


def sql_column_profiles(table: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`column_profiles` — identical NULL
    semantics, identical fixed-point mean (exact integer division),
    doubles via the same single cast."""
    arms = []
    for c in cols:
        arms.append(
            f"SELECT '{c}' AS \"column\","
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" CAST(min({c}) AS DOUBLE) AS min_v,"
            f" CAST(max({c}) AS DOUBLE) AS max_v,"
            f" CAST(CASE WHEN count({c}) > 0"
            f" THEN sum(CAST(floor({c} * 10000) AS BIGINT)) // count({c})"
            f" END AS BIGINT) AS mean_fp"
            f" FROM {table}"
        )
    return "\nUNION ALL\n".join(arms)


def histogram_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    col: str,
    *,
    bucket_width: float,
    scale: int = 1_000_000,
) -> DataFrame:
    """Population-stability-index (PSI) drift between two snapshots'
    distributions of a numeric column — the DISTRIBUTION complement to
    :func:`expectation_anomalies`' violation-RATE drift (classic
    model-monitoring method; PSI > 0.2 is the conventional "investigate"
    line, = 200_000 at the default micro-nat scale).

    Per union bucket i (``bucket = floor(col / width)``, NULLs excluded,
    add-one smoothing so empty buckets stay finite):

        term_i = (a_i/A − b_i/B) · (ln(a_i·B) − ln(b_i·A))
        PSI    = Σ term_i          (every term ≥ 0)

    with a = count+1, A = total + n_buckets.  Engine-exact: the log is
    the staged bit-reproducible det_ln on BIGINT products, the remaining
    per-bucket float ops are written in one fixed order, and each term is
    floored to ``scale`` BEFORE the sum — so the integer total is
    aggregation-order-independent and the DuckDB mirror
    (:func:`sql_histogram_drift`) hashes identically.

    Returns (bucket, n_a, n_b, term_fp); ``PSI_fp = sum(term_fp)``.
    Scale: two value-bounded histogram aggregations + one bucket-space
    join — corpus rows are touched once per snapshot, everything after
    is histogram-sized (the q140 discipline)."""
    from briefly_spark.numerics import det_ln_items

    def hist(df, alias):
        c = F.col(col)
        return (
            df.filter(c.isNotNull())
            .select(F.floor(c / F.lit(bucket_width)).cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(alias))
        )

    joined = hist(snap_a, "ca").join(hist(snap_b, "cb"), "bucket", "full_outer").select(
        "bucket",
        F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    totals = joined.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    staged = joined.crossJoin(F.broadcast(totals)).selectExpr(
        "bucket",
        "ca AS n_a",
        "cb AS n_b",
        "CAST(ca + 1 AS BIGINT) AS a1",
        "CAST(cb + 1 AS BIGINT) AS b1",
        "CAST(ta + k AS BIGINT) AS ta1",
        "CAST(tb + k AS BIGINT) AS tb1",
    ).selectExpr(
        "bucket",
        "n_a",
        "n_b",
        "a1",
        "b1",
        "ta1",
        "tb1",
        # ln is taken PER OPERAND (review r12): ln(a1·tb1) − ln(b1·ta1)
        # needs the BIGINT products a1·tb1, which overflow int64 once the
        # snapshots reach ~1e10 rows — ln(a1)+ln(tb1)−ln(b1)−ln(ta1) is the
        # same quantity with every operand count-sized, staged identically
        # in both dialects so the rounding sequence still matches bit-wise
        *det_ln_items("a1", "__ln_a1", "spark"),
        *det_ln_items("tb1", "__ln_tb1", "spark"),
        *det_ln_items("b1", "__ln_b1", "spark"),
        *det_ln_items("ta1", "__ln_ta1", "spark"),
    )
    return staged.selectExpr(
        "bucket",
        "n_a",
        "n_b",
        "CAST(floor(((CAST(a1 AS DOUBLE) / CAST(ta1 AS DOUBLE))"
        " - (CAST(b1 AS DOUBLE) / CAST(tb1 AS DOUBLE)))"
        " * ((__ln_a1 + __ln_tb1) - (__ln_b1 + __ln_ta1))"
        f" * {scale}.0) AS BIGINT) AS term_fp",
    )


def sql_histogram_drift(
    table_a: str,
    table_b: str,
    col: str,
    *,
    bucket_width: float,
    scale: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`histogram_drift` — identical bucket maths,
    identical smoothing, the det_ln staged in the duckdb dialect, and the
    SAME textual float expression for the term, so every bit matches."""
    from briefly_spark.numerics import det_ln_items

    lns = ",\n       ".join(
        item
        for operand, out in (
            ("a1", "__ln_a1"), ("tb1", "__ln_tb1"),
            ("b1", "__ln_b1"), ("ta1", "__ln_ta1"),
        )
        for item in det_ln_items(operand, out, "duckdb")
    )
    return f"""WITH ha AS (
  SELECT CAST(floor({col} / {bucket_width!r}) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS ca
  FROM {table_a} WHERE {col} IS NOT NULL GROUP BY 1
), hb AS (
  SELECT CAST(floor({col} / {bucket_width!r}) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cb
  FROM {table_b} WHERE {col} IS NOT NULL GROUP BY 1
), j AS (
  SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
         CAST(coalesce(ca, 0) AS BIGINT) AS ca,
         CAST(coalesce(cb, 0) AS BIGINT) AS cb
  FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
), t AS (
  SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
         CAST(count(*) AS BIGINT) AS k
  FROM j
), s AS (
  SELECT bucket, ca AS n_a, cb AS n_b,
         CAST(ca + 1 AS BIGINT) AS a1, CAST(cb + 1 AS BIGINT) AS b1,
         CAST(ta + k AS BIGINT) AS ta1, CAST(tb + k AS BIGINT) AS tb1
  FROM j CROSS JOIN t
), l AS (
  SELECT bucket, n_a, n_b, a1, b1, ta1, tb1,
       {lns}
  FROM s
)
SELECT bucket, n_a, n_b,
       CAST(floor(((CAST(a1 AS DOUBLE) / CAST(ta1 AS DOUBLE))
 - (CAST(b1 AS DOUBLE) / CAST(tb1 AS DOUBLE)))
 * ((__ln_a1 + __ln_tb1) - (__ln_b1 + __ln_ta1)) * {scale}.0) AS BIGINT) AS term_fp
FROM l"""
