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


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    covers: tuple[str, ...] = (),
    oracle_sf: str | None = None,
):  # decorator
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, covers=covers, doc=fn.__doc__ or "",
            oracle_sf=oracle_sf,
        )
        return fn

    return deco


#: r06 driver-window head (VERDICT.md r05 next-round #1/#3), in order:
#: (a) the 7 r05 hash-reds, now fixed (HUGEINT→BIGINT oracle surfaces) +
#:     the q48a/q48c diagnostics that make the gate prove the mechanism;
#: (b) the 22 queries that have never had a driver row (registry outgrew
#:     the 50-entry window in r05);
#: (c) q46/q47 (re-gate: det_ln restaged this round) and the remaining
#:     det_ln/dsir-staged queries changed this round (q84–q89 pack, q87
#:     composes the staged DSIR plan).
#: The tail (50 − len) falls through in prior insertion order, which keeps
#: r04/r05-green evidence fresh for the oldest of the remaining queries.
#:
#: r06 expectation: 49/50 green — q48c_lm_hugeint_control is the
#: EXPECTED-RED control arm of the HUGEINT-surface diagnostic (see
#: queries/search.py); a red there plus green q48/q48a CONFIRMS the
#: mechanism.  r07 rotation: lead with any r06 reds, then r07-changed
#: queries, then the oldest r04-green packs.
WINDOW_HEAD: tuple[str, ...] = (
    # (a) fixed reds + diagnostics
    "q48_lm_perplexity",
    "q48a_lm_nll_int_surface",
    "q48c_lm_hugeint_control",
    "q84_dsir_weights",
    "q86_dsir_select",
    "q89_dsir_budget_fill",
    "q95_dup_graph_pagerank",
    "q96_kmeans_clusters",
    "q114_temperature_mixture",
    # (b) first driver row ever
    "q64_retention_cohorts",
    "q65_median_gap",
    "q97_bloom_decontaminate",
    "q98_zorder_layout",
    "q99_group_sample",
    "q100_waiting_suppliers",
    "q101_winsorize_lengths",
    "q102_peak_concurrency",
    "q103_grouped_median",
    "q104_frame_fingerprint_pairs",
    "q105_snapshot_diff",
    "q106_weighted_sample",
    "q107_term_pmi",
    "q108_source_similarity",
    "q110_balance_prospects",
    "q111_nation_top_supplier",
    "q112_event_transitions",
    "q113_random_projection",
    "q116_mmr_rerank",
    "q117_source_drift_kl",
    "q118_pq_ann",
    "q119_rank_fusion",
    # (c) re-gate the other queries whose score expressions were restaged
    "q46_tfidf_topterms",
    "q47_bm25_search",
    "q87_curation_funnel",
    # (d) new this round: first driver row for the streaming/jobs surface,
    #     plus the round's two new curation signals
    "q120_hh_stream_resolve",
    "q121_token_surprisal",
    "q122_shingle_containment",
    "q123_dup_cluster_histogram",
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
    )

    missing = [n for n in WINDOW_HEAD if n not in REGISTRY]
    if missing:  # pragma: no cover - registration bug
        raise KeyError(f"WINDOW_HEAD names unknown queries: {missing}")
    head = {n: REGISTRY[n] for n in WINDOW_HEAD}
    head.update((n, s) for n, s in REGISTRY.items() if n not in head)
    return head
