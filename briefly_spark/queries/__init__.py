"""Query registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 is exercised by at least one
registered query.  A query is a pure function ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) an equivalent DuckDB oracle SQL string; the
driver runs both at sf0.01 and hash-compares results (BASELINE.md t2).

Column-name contract: Spark result and oracle result must have identical
column names (the compare sorts columns by name before hashing) — alias
every computed column on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check
    covers: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 operator ids
    doc: str = ""
    #: sf_dir basename the oracle is pinned to (golden-fixture oracles are
    #: SF-specific); None = valid at any SF.  The driver gate runs at sf0.01.
    oracle_sf: str | None = None
    #: diagnostic queries whose driver outcome is EXPECTED red (e.g. a
    #: control arm that keeps a known hash hazard on purpose).  The single
    #: source of truth for tools/window_plan.py (no re-gate pressure) and
    #: tools/check_oracle.py (type-audit exemption).  r06's
    #: q48c_lm_hugeint_control was the only instance; it was retired after
    #: CORRECTNESS_r06 confirmed the HUGEINT mechanism (red exactly as
    #: predicted, q48/q48a green) — see queries/search.py for the record.
    expected_red: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    covers: tuple[str, ...] = (),
    oracle_sf: str | None = None,
    expected_red: bool = False,
):  # decorator
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, covers=covers, doc=fn.__doc__ or "",
            oracle_sf=oracle_sf, expected_red=expected_red,
        )
        return fn

    return deco


#: r13 driver-window head (VERDICT r12 "Next round" #1).  r12 was 50/50
#: green, so the rotation is tools/window_plan.py's emitted proposal
#: VERBATIM — exactly the 50 r10-green queries, zero spare seats (the
#: r12 forecast held).  Mechanically checked by tools/gate_debt.py +
#: tests/test_gate_debt.py against the committed last-gated-hash
#: manifest, and by the over-age invariant in tools/window_plan.py.
#:
#: REGISTRY CAPACITY POLICY (VERDICT r11 next-round #3 — the committed
#: written policy; window_plan/gate_debt enforce the mechanics):
#:   1. Hard bound: ≤ 150 registered queries — at a 50-slot gate and the
#:      3-round freshness bound, 150 is the saturation point; beyond it
#:      every registration permanently ages another query past the bound.
#:   2. Composite-first registration: a new capability lands
#:      pytest+DuckDB-mirror-pinned (window_plan.py:MIRROR_PINNED) and
#:      graduates by joining a COMPOSITE gated query (the q147/q128/q149
#:      pattern — one hash, many ops) rather than taking a fresh slot;
#:      a dedicated slot is the exception and needs a freed seat.
#:   3. Retirement rule: a mechanism-control row whose point is proven
#:      AND enforced mechanically elsewhere is retired (unregistered,
#:      with a dated record at its definition site) to free its seat —
#:      applied to q48c (r06) and now q48a (r12, see queries/search.py:
#:      the HUGEINT-surface mechanism it proved is enforced on every
#:      query by check_oracle's output-surface type audit).
#:
#: r13 EXECUTED (the r12 forecast and graft queue, in full): all eight
#: X142–X149 grafts landed on their named hosts (q74/q37/q70/q31/q147/
#: q30/q76/q02 — tidy (section, k, value) long frames, each host's fresh
#: r13 row carries the grafted surface), the deferred
#: sql_expectation_report empty-table coalesce rode q147's graft, and
#: MIRROR_PINNED drained to the five standing pins.
#:
#: r14 forecast (written at r13 close so the rotation is no surprise):
#: after the r13 gate the stale pack is the 50 r11-green queries, PLUS
#: q149 must re-gate (its oracle form moved with the expectation-report
#: coalesce; it holds r13's one-round tail seat) — 51 candidates for 50
#: seats, so ONE r11-pack query rides the r14 tail seat (the q128
#: r12→r13 precedent; pick the one window_plan lists last).  r14
#: registers nothing new; any new capability lands mirror-pinned with a
#: disposition, or grafts into an r11-pack query whose seat is already
#: paid (the r13 pattern).
WINDOW_HEAD: tuple[str, ...] = (
    # r13 head — exactly the 50 r10-green queries (window_plan.py
    # proposal, taken verbatim; zero spare seats as the r12 forecast
    # said).  q128 leads: its de-collected r12 form held the one-round
    # tail seat and its driver row is due now.  The eight r13 grafts
    # (X142–X149) all land on queries in this head — q74, q37, q70,
    # q31, q147, q30 family, q76, q02 family — so every grafted surface
    # earns a fresh driver row this round.
    "q128_jobs_dag_resolve",
    "q39_line_boilerplate_filter",
    "q66_curriculum_buckets",
    "q67_pack_exact",
    "q40_ann_topk",
    "q41_related_articles",
    "q42_lsh_ann",
    "q43_ivf_ann",
    "q49_contrastive_pairs",
    "q45_quantized_ann",
    "q44_related_lsh",
    "q60_chunk_embed_meanpool",
    "q61_factcheck_scores",
    "q62_summarize_worklist",
    "q63_embed_arrow_harness",
    "q70_tumbling_window",
    "q71_sliding_window",
    "q72_session_windows",
    "q73_props_json_extract",
    "q74_sketch_audit",
    "q75_funnel",
    "q78_rolling_features",
    "q79_attribution",
    "q76_asof_enrich",
    "q77_range_join",
    "q30_exact_dedup",
    "q31_minhash_lsh_pairs",
    "q32_simhash_fingerprints",
    "q33_ngram_jaccard_pairs",
    "q34_embedding_near_dup",
    "q36_decontaminate",
    "q29_dedup_survivors",
    "q37_dup_clusters",
    "q01_pricing_summary",
    "q02_topk_orders_per_customer",
    "q03_revenue_by_nation",
    "q04_customers_without_orders",
    "q05_orders_with_heavy_items",
    "q06_distinct_segments",
    "q07_order_status_tallies",
    "q08_order_set_ops",
    "q09_part_scalar_funcs",
    "q10_latest_events_per_user",
    "q11_events_worklist",
    "q12_weighted_customer_score",
    "q13_cube_revenue",
    "q14_running_totals",
    "q15_small_lot_revenue",
    "q80_media_metadata",
    "q147_expectation_audit",
    # TAIL SEAT (position 51 — beyond the 50-entry gate, bounded to one
    # round by tests/test_gate_debt.py): the r12-deferred
    # sql_expectation_report empty-table coalesce landed with q147's r13
    # graft, and q149's anomalies leg embeds the same helper, so q149's
    # oracle FORM moved too (values unchanged — the synthetic runs are
    # non-empty, coalesce is a no-op there; q147's fresh r13 row gates the
    # fix's value surface).  q149 is r12-green (fresh deferral) and its
    # driver row lands at r14 — the q128 r12→r13 precedent.
    "q149_governance_pack",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration) and return the
    registry, reordered so WINDOW_HEAD leads.

    The driver's correctness gate records registry entries in insertion
    order and gates a bounded prefix (50 entries), so the returned dict is
    explicitly reordered each round: WINDOW_HEAD (this round's must-gate
    queries — see its comment) first, every other query in module import
    order after it.  Queries beyond the window are covered by the
    committed check_oracle full-sweep evidence and their r04/r05 driver
    rows."""
    from briefly_spark.queries import (  # noqa: F401
        textstats,
        text,
        search,
        ingest,
        worklists,
        tts,
        training,
        graph,
        analytics,
        scale,
        pipeline,
        events,
        temporal,
        dedup,
        similarity,
        relational,
        multimodal,
        streamgate,
        jobsgate,
        expectgate,
        governance,
    )

    missing = [n for n in WINDOW_HEAD if n not in REGISTRY]
    if missing:  # pragma: no cover - registration bug
        raise KeyError(f"WINDOW_HEAD names unknown queries: {missing}")
    head = {n: REGISTRY[n] for n in WINDOW_HEAD}
    head.update((n, s) for n, s in REGISTRY.items() if n not in head)
    return head
