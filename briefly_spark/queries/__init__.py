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


#: r14 driver-window head (VERDICT r13 "Next round" #1).  r13 was 50/50
#: green, so the rotation is tools/window_plan.py's emitted proposal —
#: the 49 r11-green queries plus q149's mandated re-gate — with ONE
#: reorder the verdict prescribes: q149_governance_pack LEADS the head
#: (its oracle form moved with the shared empty-table coalesce helper at
#: r13; it held the documented one-round tail seat and its driver row is
#: due now).  50 candidates for 50 seats — the r13 forecast guessed 51
#: (one r11 query riding a tail seat) but the r11 pack is 49, not 50, so
#: the window closes exactly with zero spare seats and zero tail seats.
#: Mechanically checked by tools/gate_debt.py + tests/test_gate_debt.py
#: against the committed last-gated-hash manifest, and by the over-age
#: invariant in tools/window_plan.py.
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
#: r15 forecast (written at r14 open so the rotation is no surprise):
#: after the r14 gate the stale pack is the r12-green queries MINUS
#: q149 (it re-gates at r14, moving to the r14 pack) = 49, PLUS q37's
#: re-gate (its oracle form moved at r14 open with the brute-force cost
#: ceiling; it holds r14's one-round tail seat) — exactly 50 candidates
#: for 50 seats, zero spare, zero tail.  The capacity arithmetic works
#: BECAUSE q149's regate consumed the cycle's one spare seat at r14 and
#: thereby shrank the r15-due pack by one; a second oracle-form change
#: this round would not fit — don't make one.  r14 registers nothing
#: new; any new capability lands mirror-pinned with a disposition, or
#: grafts into a query whose seat is already paid (the r13 pattern).
WINDOW_HEAD: tuple[str, ...] = (
    # r15 head — q37 LEADS (the r14 verdict's mandate: its oracle gained
    # the SQL_BRUTE_FORCE_CAP error() guard at r14 and held the
    # documented one-round tail seat; the q149 r13→r14 precedent ends
    # here with its fresh driver row).  Then the r12-green queries in
    # window_plan.py proposal order.  q118 sits in the head because the
    # X150 IVF-PQ graft lands under its driver hash this round
    # (tools/window_plan.py X150 disposition).
    #
    # Mid-round amendment: the round's own work changed FOUR more query
    # forms after the open rotation — q33/q115 gained the armed
    # ORACLE_ROW_CAP guard CTEs (oracle_guards.py; q95/q122/q144 too,
    # but those were already seated), q41's fn now passes
    # corpus_n/queries_n hints, and q129's dense branch gates on the
    # pair product.  Form-changed debt outranks unchanged-form
    # staleness (gate_debt's invariant), which left 54 claimants for 50
    # seats (49 r12-stale + q37 + these four).  The mid-round
    # resolution retired the four r12-stale tail entries
    # (q112_event_transitions, q123_dup_cluster_histogram,
    # q138_lsh_calibration, q104_frame_fingerprint_pairs) into seated
    # hosts (q112→q102 'transitions', q123→q37 'size_histogram',
    # q138→q122 'lsh_calibration', q104→q33 'frame_pairs').
    #
    # r15-optimization-open amendment: the driver contract forbids a
    # DECLARED query disappearing between rounds — retirement of a
    # registered seat is a regression however sound the capacity
    # arithmetic, so the four standalone queries are RESTORED in their
    # last-gated (r12) forms (manifest hashes unchanged: not debt, but
    # over-age at r15) while the host sections stay.  Seating with 55
    # claimants: the 45 plain r12-stale + the 4 restored r12-stale must
    # hold gated head seats (a tail seat requires r13+ evidence), q37
    # keeps the mandated lead, and the five claimants WITH r13/r14
    # evidence (q33, q41, q115, q129 — form-changed; q128/q120 — forms
    # moved by the r15 drain/partitioned-write optimizations) take the
    # one-round tail seats the q149/q37 precedents define.  Their current forms stay covered by
    # the committed builder-side oracle sweep until the r16 head seats
    # them first.
    # r16 head (rotated at optimization-round open, after
    # `gate_debt.py --update 15` absorbed CORRECTNESS_r15's 50 greens).
    # Seat arithmetic: the r13-green pack is 49 queries (all over-age at
    # r16) and the remaining gate debt is 6 (q33/q41/q128 — r13-green AND
    # form-moved at r15; q115/q120/q129 — r14-green, form-moved at r15).
    # 49 + q120 = exactly 50 head seats.  q128 and q120 LEAD — the r15
    # verdict's explicit mandate (next-round #2): their forms moved most
    # at r15 (drain convergence + partitioned micro-batch write) and both
    # rotated out of the r15 driver sample, so the r16 gate must
    # re-verify them first.  Then q33/q41 (debt + over-age), then the
    # remaining 45 r13-green in window_plan.py proposal order.
    # q115/q129 hold the one-round tail seats the q149/q37 precedents
    # define (r14 driver evidence + committed builder-side oracle-sweep
    # coverage of the moved forms); they are the first claimants of the
    # r17 head.
    "q128_jobs_dag_resolve",
    "q120_hh_stream_resolve",
    "q33_ngram_jaccard_pairs",
    "q41_related_articles",
    "q39_line_boilerplate_filter",
    "q66_curriculum_buckets",
    "q67_pack_exact",
    "q40_ann_topk",
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
    "q34_embedding_near_dup",
    "q36_decontaminate",
    "q29_dedup_survivors",
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
    # --- one-round tail seats (positions 51+; r14 driver evidence +
    # builder-side oracle-sweep coverage of the r15-moved forms) ---
    "q115_label_propagation",
    "q129_hybrid_rrf",
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
