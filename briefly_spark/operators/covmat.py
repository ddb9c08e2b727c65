"""Exact pairwise covariance/correlation sufficient statistics (X146) —
the CROSS-metric member of the exact-statistics family (X129 fits one
(x, y) trend; this emits every metric pair at once), with the same
mergeable-registry form.

Why exact: a correlation screen over table metrics (profile drift, PSI
companions, feature redundancy) feeds release gates; float `corr()`
differs across engines in the last ulps and cannot be hash-gated.  The
sufficient statistics — per-pair n, sums, squares, cross products — are
integers (DECIMAL(38,0) in Spark, HUGEINT in DuckDB), and the derived
moments stay integer:

    cov_num(a,b)  = n·sab − sa·sb          (n² · covariance)
    var_num(a)    = n·saa − sa·sa          (n² · variance)
    corr²         = cov_num² / (var_num_a · var_num_b)   — caller-side

so the full matrix is value-identical across engines, and a float
correlation is one driver-side division away.

NULL policy: PAIRWISE-complete — a row contributes to pair (a, b) iff
BOTH columns are non-null (so per-pair n differs; the alternative,
listwise deletion, silently shrinks every pair to the worst column).

Scale shape: ONE map-side-combinable hash aggregation computes all
p·(p+1)/2 pair statistics in a single corpus pass (the wide-agg
columns are pair-count-bounded, not corpus-bounded); the long-format
reshape runs on the (groups)-bounded result.  Registry blocks are
additive — the X131 fold ≡ one-shot argument verbatim.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from briefly_spark.operators.trends import require_int_column

_DEC = "decimal(38,0)"

#: per-pair sufficient statistics (after group cols + m_a/m_b labels)
PAIR_COLS = ("n", "sa", "sb", "saa", "sbb", "sab")


def _pairs(metric_cols: list[str]) -> list[tuple[str, str]]:
    if len(metric_cols) < 2 or len(set(metric_cols)) != len(metric_cols):
        raise ValueError(
            f"pairwise_stats: need >= 2 distinct metric columns, got {metric_cols!r}"
        )
    # '__' is the internal pair-tag separator: a name containing it could
    # collide two different pairs onto one aggregate alias (a,b__c vs
    # a__b,c both tag a__b__c) — refuse instead of silently corrupting
    bad = [c for c in metric_cols if "__" in c]
    if bad:
        raise ValueError(
            f"pairwise_stats: metric names must not contain '__' "
            f"(internal pair separator): {bad!r}"
        )
    return list(combinations(metric_cols, 2))


def _wide_aggs(pairs: list[tuple[str, str]]) -> list:
    aggs = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        ca = F.when(both, F.col(a).cast(_DEC))
        cb = F.when(both, F.col(b).cast(_DEC))
        aggs += [
            F.count(F.when(both, F.lit(1))).cast("long").alias(f"n__{tag}"),
            F.sum(ca).alias(f"sa__{tag}"),
            F.sum(cb).alias(f"sb__{tag}"),
            F.sum(ca * ca).alias(f"saa__{tag}"),
            F.sum(cb * cb).alias(f"sbb__{tag}"),
            F.sum(ca * cb).alias(f"sab__{tag}"),
        ]
    return aggs


def _to_long(wide: DataFrame, group_cols: list[str], pairs) -> DataFrame:
    rows = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        rows.append(
            F.struct(
                F.lit(a).alias("m_a"),
                F.lit(b).alias("m_b"),
                F.col(f"n__{tag}").alias("n"),
                F.coalesce(F.col(f"sa__{tag}"), F.lit(0).cast(_DEC)).alias("sa"),
                F.coalesce(F.col(f"sb__{tag}"), F.lit(0).cast(_DEC)).alias("sb"),
                F.coalesce(F.col(f"saa__{tag}"), F.lit(0).cast(_DEC)).alias("saa"),
                F.coalesce(F.col(f"sbb__{tag}"), F.lit(0).cast(_DEC)).alias("sbb"),
                F.coalesce(F.col(f"sab__{tag}"), F.lit(0).cast(_DEC)).alias("sab"),
            )
        )
    return (
        wide.select(*group_cols, F.explode(F.array(*rows)).alias("__p"))
        .select(*group_cols, "__p.*")
        # a (group, pair) with zero complete rows has no moments — the
        # mirror matches via HAVING count(*) > 0 (needed explicitly on
        # the ungrouped branch, where an aggregate with no GROUP BY would
        # otherwise emit one zero-filled row)
        .filter(F.col("n") > 0)
    )


def pairwise_sums(
    df: DataFrame, *, group_cols: list[str], metric_cols: list[str]
) -> DataFrame:
    """One-pass per-group pairwise sufficient statistics, long format:
    (group..., m_a, m_b, n, sa, sb, saa, sbb, sab) for every a < b in
    ``metric_cols`` order."""
    pairs = _pairs(metric_cols)
    for c in metric_cols:
        require_int_column(df, c, ctx="pairwise_stats")
    wide = df.groupBy(*group_cols).agg(*_wide_aggs(pairs))
    return _to_long(wide, group_cols, pairs)


def pairwise_moments(sums: DataFrame, *, group_cols: list[str]) -> DataFrame:
    """Exact integer moments from the sufficient statistics:
    (group..., m_a, m_b, n, cov_num, var_a_num, var_b_num) — correlation²
    = cov_num² / (var_a_num · var_b_num), computable driver-side or as a
    float projection when a non-gated surface wants it."""
    n = F.col("n").cast(_DEC)
    return sums.select(
        *group_cols,
        "m_a",
        "m_b",
        "n",
        (n * F.col("sab") - F.col("sa") * F.col("sb")).alias("cov_num"),
        (n * F.col("saa") - F.col("sa") * F.col("sa")).alias("var_a_num"),
        (n * F.col("sbb") - F.col("sb") * F.col("sb")).alias("var_b_num"),
    )


# ---------------------------------------------------------------------------
# the mergeable registry (X131 shape: additive blocks, group-replace)
# ---------------------------------------------------------------------------
def pairwise_batch_sums(
    df: DataFrame,
    *,
    group_cols: list[str],
    metric_cols: list[str],
    batch_id: int,
) -> DataFrame:
    """One batch's additive block — fold ≡ one-shot by commutativity."""
    sums = pairwise_sums(df, group_cols=group_cols, metric_cols=metric_cols)
    return sums.select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"), "*"
    )


def pairwise_registry_moments(
    registry: DataFrame, *, group_cols: list[str]
) -> DataFrame:
    """Moments over everything the registry has absorbed: sum blocks per
    (group, pair) — a blocks-bounded aggregation — then the exact
    moment formulas."""
    folded = registry.groupBy(*group_cols, "m_a", "m_b").agg(
        F.sum("n").alias("n"),
        *[F.sum(c).alias(c) for c in ("sa", "sb", "saa", "sbb", "sab")],
    )
    return pairwise_moments(folded, group_cols=group_cols)


def pairwise_registry_compact(
    registry: DataFrame, *, into_batch_id: int = -1
) -> DataFrame:
    """Re-sum into ONE sentinel block per (group, pair) — exact."""
    group_cols = [
        c
        for c in registry.columns
        if c not in ("batch_id", "m_a", "m_b", *PAIR_COLS)
    ]
    return (
        registry.groupBy(*group_cols, "m_a", "m_b")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(c).alias(c) for c in ("sa", "sb", "saa", "sbb", "sab")],
        )
        .select(
            F.lit(int(into_batch_id)).cast("long").alias("batch_id"),
            *group_cols,
            "m_a",
            "m_b",
            *PAIR_COLS,
        )
    )


def sql_pairwise_moments(
    table: str, *, group_cols: list[str], metric_cols: list[str]
) -> str:
    """DuckDB mirror of pairwise_sums → pairwise_moments — HUGEINT
    arithmetic, value-identical to the Spark DECIMAL(38,0) surface."""
    g = ", ".join(group_cols)
    g_pre = "".join(f"{c}, " for c in group_cols)
    legs = []
    for a, b in _pairs(metric_cols):
        legs.append(f"""SELECT {g_pre}'{a}' AS m_a, '{b}' AS m_b,
       CAST(count(*) AS BIGINT) AS n,
       coalesce(sum(CAST({a} AS HUGEINT)), 0) AS sa,
       coalesce(sum(CAST({b} AS HUGEINT)), 0) AS sb,
       coalesce(sum(CAST({a} AS HUGEINT) * CAST({a} AS HUGEINT)), 0) AS saa,
       coalesce(sum(CAST({b} AS HUGEINT) * CAST({b} AS HUGEINT)), 0) AS sbb,
       coalesce(sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)), 0) AS sab
FROM {table}
WHERE {a} IS NOT NULL AND {b} IS NOT NULL
GROUP BY {g}
HAVING count(*) > 0""" if group_cols else f"""SELECT '{a}' AS m_a, '{b}' AS m_b,
       CAST(count(*) AS BIGINT) AS n,
       coalesce(sum(CAST({a} AS HUGEINT)), 0) AS sa,
       coalesce(sum(CAST({b} AS HUGEINT)), 0) AS sb,
       coalesce(sum(CAST({a} AS HUGEINT) * CAST({a} AS HUGEINT)), 0) AS saa,
       coalesce(sum(CAST({b} AS HUGEINT) * CAST({b} AS HUGEINT)), 0) AS sbb,
       coalesce(sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)), 0) AS sab
FROM {table}
WHERE {a} IS NOT NULL AND {b} IS NOT NULL
HAVING count(*) > 0""")
    union = "\nUNION ALL\n".join(legs)
    return f"""WITH sums AS (
{union}
)
SELECT {g_pre}m_a, m_b, n,
       CAST(n AS HUGEINT) * sab - sa * sb AS cov_num,
       CAST(n AS HUGEINT) * saa - sa * sa AS var_a_num,
       CAST(n AS HUGEINT) * sbb - sb * sb AS var_b_num
FROM sums"""
