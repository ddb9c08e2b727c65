"""Mergeable distinct-count sketch registry — incremental cardinality
over continuous ingest (Apache DataSketches HLL, exposed by Spark's
``hll_sketch_agg`` / ``hll_union_agg``; public method: Heule et al.
HLL++, the Datasketches library's sketch algebra).

q74 audits one-shot approximate distincts against exact counts; this
module is the INCREMENTAL form a 100 TB lake actually operates: each
ingest batch contributes one binary sketch row per group, the registry
table accumulates batch blocks, and "distinct users per event_type over
any ingested window" is a sketch UNION over the registry — no
reprocessing of history, ever.  The same shape as the other long-lived
registries (heavy-hitter X69, NB X115, claims X101/X117):

- partials are per-(batch, group) and MERGEABLE (sketch union is
  associative + commutative + idempotent at the register level, so the
  estimate is independent of batch boundaries AND of row order —
  HLL registers take a max per bucket);
- the registry merge keys on batch_id ALONE (group-replace): a replayed
  batch replaces its entire block, counts never double;
- registry size is (batches × groups) sketch rows, ≤ ~1.5 KB each at
  the default lg_k — corpus-independent;
- compaction = re-union blocks into one sentinel block
  (:func:`hll_registry_compact`), exact at the register level, same
  committed-state caveat as the other compactors.

Determinism: sketch binaries and estimates are deterministic functions
of the VALUE SET (order-independence is the register-max property), so
batch ≡ fold ≡ stream pins hold exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default log2(registers) — ~1.6% relative error, ≤ 1.5 KB per sketch
DEFAULT_LG_K = 12


def hll_batch_sketches(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    batch_id: int,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One batch's contribution: (batch_id, *group_cols, sketch) — a
    map-side-combinable aggregation; NULL values are ignored (a NULL is
    not a distinct member, matching count(DISTINCT) semantics)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"))
        .select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            *group_cols,
            "sketch",
        )
    )


def hll_registry_estimate(
    registry: DataFrame, *, group_cols: list[str]
) -> DataFrame:
    """Distinct-count estimates over everything the registry has absorbed:
    one sketch union per group (partial-aggregating — blocks union
    map-side), estimate emitted as BIGINT."""
    return (
        registry.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select(
            *group_cols,
            F.hll_sketch_estimate("u").cast("long").alias("n_distinct_est"),
        )
    )


def hll_registry_compact(registry: DataFrame, *, into_batch_id: int = -1) -> DataFrame:
    """Re-union a grown registry into ONE block per group — register-level
    exact (union is associative/idempotent), so estimates before and
    after compaction are identical (pytest-pinned).  Same caveat as the
    other registry compactors: only compact batches whose replay window
    has passed; the NEGATIVE sentinel cannot collide with foreachBatch
    ids (≥ 0) after a checkpoint reset."""
    group_cols = [c for c in registry.columns if c not in ("batch_id", "sketch")]
    return (
        registry.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            F.lit(int(into_batch_id)).cast("long").alias("batch_id"),
            *group_cols,
            "sketch",
        )
    )


def hll_counts_stream(
    source: DataFrame,
    wh,
    *,
    registry_table: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> None:
    """Streaming maintenance: each micro-batch's sketch block merges into
    the registry keyed on batch_id alone (group-replace — the X69/X115
    replay discipline: a re-delivered batch replaces its entire block,
    so registers never absorb a batch twice under a different
    partitioning)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        block = hll_batch_sketches(
            batch_df,
            group_cols=group_cols,
            value_col=value_col,
            batch_id=batch_id,
            lg_k=lg_k,
        )
        if block.take(1):
            wh.merge_upsert(block, registry_table, ["batch_id"])

    q = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
