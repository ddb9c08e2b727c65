"""Row-cap guards for deliberately-brute-force DuckDB mirrors (VERDICT
r14 next-round #3 — the q37 SQL_BRUTE_FORCE_CAP pattern, generalized).

Several oracles state semantics as blocked-cartesian pair joins or
unrolled iterative CTE chains on purpose: a mirror that shares the
Spark side's inverted-index shortcut would only pin agreement on the
shortcut, not completeness.  The price is super-linear mirror cost —
the r15 oracle-cost ladder (tools/oracle_cost.py; BENCH_NOTES r15)
measured the worst at exp 1.7–1.9 over the sf0.01→sf0.1 decade, i.e.
roughly quadratic in corpus rows, extrapolating to hours at an
sf1-equivalent.  Above the cap these mirrors must REFUSE loudly rather
than wedge a sweep; completeness then pins at the largest swept SF plus
the operator's pytest references.

The guard is emitted as a MATERIALIZED one-row CTE that the caller
consumes in the quadratic join's FROM (``guarded_scan``): the join
cannot emit a single left-side row until the guard aggregate has
evaluated, so the refusal ordering is dataflow-structural — not a bet
on the optimizer evaluating an uncorrelated WHERE subquery early
(ADVICE r14 #3).  It must NOT be an unreferenced projected column:
DuckDB's column pruning deletes those, silently disarming the cap
(measured, operators/fuzzy.py).
"""

from __future__ import annotations

#: Default ceiling: the largest gate-swept corpus is sf0.1 (10k docs);
#: 20k keeps a 2× margin, and the ladder's exponents say a 2× corpus
#: costs a super-linear mirror ~3.5× its sf0.1 wall — minutes, not the
#: hours an uncapped sf1 sweep would wedge on.
ORACLE_ROW_CAP = 20_000


def sql_row_cap_cte(
    table: str, *, label: str, cap: int = ORACLE_ROW_CAP, cte: str = "brute_guard"
) -> str:
    """One MATERIALIZED guard CTE: ``{cte} AS (... ok ...)`` counting
    ``table`` once and raising a DuckDB ``error()`` naming ``label``
    above ``cap``.  Compose with :func:`guarded_scan` on the quadratic
    join's left side."""
    # safe-by-construction for any label (r15 review finding): a quote
    # in the interpolated message would otherwise break — or worse,
    # silently disarm — every execution of the guard
    label = label.replace("'", "''")
    if not table.replace("_", "").isalnum() or not cte.replace("_", "").isalnum():
        raise ValueError(f"table/cte must be bare identifiers: {table!r}, {cte!r}")
    return (
        f"{cte} AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN count(*) > {int(cap)}\n"
        f"    THEN error('{label}: input exceeds ORACLE_ROW_CAP={int(cap)} rows; "
        f"this mirror is deliberately brute-force/super-linear (oracle-cost "
        f"ladder, BENCH_NOTES r15) — above the cap its completeness pins at "
        f"the largest swept SF instead (briefly_spark/oracle_guards.py)')\n"
        f"    ELSE 1 END AS ok FROM {table})"
    )


def guarded_scan(table: str, *, cte: str = "brute_guard") -> str:
    """A derived-table scan of ``table`` that structurally depends on the
    guard CTE: ``(SELECT t.* FROM {table} t, {cte} g WHERE g.ok = 1)``."""
    return f"(SELECT t.* FROM {table} t, {cte} g WHERE g.ok = 1)"
