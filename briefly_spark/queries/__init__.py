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


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration) and return the registry.

    Import order is deliberate, not alphabetical: the driver's correctness
    gate records registry entries in insertion order and has recorded a
    bounded prefix (50 entries), so modules whose queries most need fresh
    driver evidence come first.  Round-5 rotation (VERDICT.md r04
    next-round #2): the 30 queries whose only green driver row is r03
    (textstats q50–q59/q35/q38/q39/q66–q69, text q20–q27, ingest q90,
    worklists q92–q94, tts q91) lead, then search (q46–q48 changed this
    round: det_ln deterministic scores — q48 was the r04 red), then
    first-driver-row candidates in priority order — the curation pack
    (q83–q89), the iterative ops (q96 k-means, q109 BPE, q95 PageRank,
    q115 label propagation, plus q114 riding in the textstats block) and
    the decision-support joins (q16–q19, q28) — filling the 50-entry
    window exactly.  Everything beyond the window either has an
    r04-green driver row (pipeline, events, temporal, dedup, similarity,
    relational, multimodal) or queues for the r06 rotation (scale
    q97–q106, analytics q100/q107/q108/q110/q111/q117, events q112,
    similarity q113/q116); ALL of it is covered by the committed
    check_oracle full-sweep evidence either way.
    """
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
    )

    return REGISTRY
