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


#: r10 driver-window head (VERDICT r09 "Next round" #1).  r09 was 50/50
#: green, so the rotation is the exhaustive r07-stale pack: all 50
#: queries whose newest green driver row is r07 (tools/window_plan.py
#: lists them exactly; after this round no registry query's evidence
#: predates r08).  New/changed queries this round (gate debt by
#: construction) lead the head.  Mechanically checked by
#: tools/gate_debt.py + tests/test_gate_debt.py against the committed
#: last-gated-hash manifest, and by the over-age invariant in
#: tools/window_plan.py (now keyed off the manifest round — VERDICT r09
#: next-round #2).
#:
#: Capacity note: the driver gates the FIRST 50 entries, the r07-stale
#: pack is exactly 50, and this round also must gate the new
#: expectation-suite query (VERDICT r09 next-round #3) and the trimmed
#: q128 (next-round #5) — 52 candidates for 50 slots.  The two tail
#: entries (q81_media_decode_arrow, q82_frame_sample) are the deliberate
#: sacrifice: both are pytest-pinned decode/sample harnesses whose
#: multimodal family keeps fresh driver evidence through q80 (gated this
#: round) and q104 (green r09).  They keep their WINDOW_HEAD slots (so
#: the over-age invariant records them as scheduled, positions 51–52)
#: and are first in line for the r11 rotation.
WINDOW_HEAD: tuple[str, ...] = (
    # (a) new / changed in r10 (uncommented as each lands)
    "q147_expectation_audit",
    "q128_jobs_dag_resolve",
    # (b) the exhaustive r07-stale pack (window_plan.py order)
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
    # positions 51–52: scheduled but beyond the driver's 50-entry gate
    # this round (see capacity note above) — r11 rotation leads with them
    "q81_media_decode_arrow",
    "q82_frame_sample",
    #
    # r11 round-open notes: after gate_debt --update 10, the must-schedule
    # set is q81 + q82 (above) + the 47 queries whose newest row is r08 =
    # 49 — ONE spare slot.  Planned use: register the unigram tokenizer
    # (operators/unigram.py, X118 — trainer + fertility encode already
    # pytest-pinned) as q148 IF the r10 gate is fully green; a red eats
    # the spare slot instead.  Registry capacity note: at 149 queries the
    # 3-round rotation is within one of saturation (150) — from r11 on,
    # new capabilities land pytest+mirror-pinned first and only take a
    # registry slot when a rotation has room.
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
    )

    missing = [n for n in WINDOW_HEAD if n not in REGISTRY]
    if missing:  # pragma: no cover - registration bug
        raise KeyError(f"WINDOW_HEAD names unknown queries: {missing}")
    head = {n: REGISTRY[n] for n in WINDOW_HEAD}
    head.update((n, s) for n, s in REGISTRY.items() if n not in head)
    return head
