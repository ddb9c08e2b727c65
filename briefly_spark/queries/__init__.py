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


#: r11 driver-window head (VERDICT r10 "Next round" #1).  r10 was 50/50
#: green, so the rotation is exactly tools/window_plan.py's emitted
#: proposal: q81 + q82 first (the only r07 evidence left — the two tail
#: seats deliberately deferred from r10's 52-for-50 capacity conflict),
#: then the exhaustive r08-stale pack (47 queries).  That is 49
#: must-schedule entries; the ONE spare slot goes to the staged unigram
#: tokenizer (q148 — VERDICT r10 next-round #3), new-query debt by
#: construction, so it leads the head per window_plan policy.
#: Mechanically checked by tools/gate_debt.py + tests/test_gate_debt.py
#: against the committed last-gated-hash manifest, and by the over-age
#: invariant in tools/window_plan.py (manifest-round keyed; tail seats
#: now bounded to one round — ADVICE r10 #3,
#: tests/test_gate_debt.py:test_window_tail_entries_bounded_to_one_round).
#:
#: Registry capacity note (standing policy, now mechanical): at 149
#: queries the 3-round × 50-slot rotation is within one of saturation —
#: new capabilities land pytest+DuckDB-mirror-pinned first and take a
#: registry slot only when a rotation has room.  tools/window_plan.py
#: enumerates the mirror-evidence class (MIRROR_PINNED) so a
#: mirror-pinned op can't silently lose its mirror (VERDICT r10
#: next-round #5).  Queued for r12 slots, in order: X124 column profiles
#: and X125 PSI drift (VERDICT r10 next-round #6 — the committed
#: decision), then the r11 single-query-shaped additions behind them
#: (X129 group trend, X130 k-anonymity summary, X133 release datasheet,
#: X136 pivot) — all already SQL-mirrored, see MIRROR_PINNED.
WINDOW_HEAD: tuple[str, ...] = (
    # (a) new in r11 (gate debt by construction)
    "q148_unigram_tokenizer",
    # (b) the only remaining r07 evidence (deferred tail seats from r10)
    "q81_media_decode_arrow",
    "q82_frame_sample",
    # (c) the exhaustive r08-stale pack (window_plan.py order)
    "q50_token_stats",
    "q51_language_id",
    "q52_quality_score",
    "q53_winnow_fingerprints",
    "q54_source_quality_rollup",
    "q55_gopher_rules",
    "q56_pii_scrub",
    "q57_hash_split",
    "q58_mixture_resample",
    "q59_pack_sequences",
    "q35_top_ngram_repetition",
    "q38_stratified_quota_sample",
    "q68_group_split",
    "q69_pack_assemble",
    "q114_temperature_mixture",
    "q20_clean_documents",
    "q21_chunk_fixed",
    "q22_chunk_recursive",
    "q23_doc_source_dims",
    "q24_summary_bullets",
    "q25_img_and_ids",
    "q26_url_canonical",
    "q27_paragraph_extract",
    "q46_tfidf_topterms",
    "q47_bm25_search",
    "q48_lm_perplexity",
    "q48a_lm_nll_int_surface",
    "q121_token_surprisal",
    "q129_hybrid_rrf",
    "q90_ingest_normalize",
    "q92_feeds_config",
    "q93_two_tier_worklist",
    "q94_worklist_hydration",
    "q91_tts_synthesis",
    "q83_span_dedup",
    "q85_semantic_dedup",
    "q88_vocab_encode",
    "q109_bpe_merges",
    "q126_bpe_encode",
    "q124_classifier_train",
    "q115_label_propagation",
    "q16_volume_shipping",
    "q17_large_volume_orders",
    "q18_disjunctive_revenue",
    "q19_revenue_concentration",
    "q28_heavy_hitters",
    "q120_hh_stream_resolve",
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
