"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only cross-run state is "which URLs have I already
ingested" — a driver-side set rebuilt from MongoDB every tick
(raw_articles.py:44-46,66).  In Structured Streaming that is a KEYED STATE
problem: the state store holds one tiny record per key, partitioned by the
grouping key across executors, checkpointed with the query — no driver-side
set, no full-table rescan per micro-batch.

Scale design: state is hash-partitioned on the key (same layout as the
shuffle), lookups are local to the task, and TTL (GroupStateTimeout)
bounds the store for unbounded key domains — at 100 TB of history you keep
hot-window keys in state and rely on the idempotent merge sink
(:func:`briefly_spark.streaming.incremental.merge_stream`) as the
durable backstop for cold keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_dedup(stream: DataFrame, key_col: str) -> DataFrame:
    """First-seen dedup across micro-batches (SURVEY §2.3 P5 / §2.10 T2 as
    a stateful streaming operator).

    Emits each key's first-ever row (first occurrence inside the first
    micro-batch that contains it); every later occurrence — same batch or
    any later batch — is suppressed.  State per key is a single counter,
    so the store is O(distinct keys), not O(rows).

    Output schema = input schema + ``n_dups_prior`` (occurrences already
    seen for this key when the batch arrived; 0 on the emitted row).
    """
    # StructType.add mutates in place — build a fresh schema, never touch
    # the stream's own StructType.
    out_schema = T.StructType(
        [*stream.schema.fields, T.StructField("n_dups_prior", T.LongType())]
    )
    cols = stream.columns

    def dedup(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)
        first_seen = seen
        total = seen
        out = []
        for pdf in batches:
            if first_seen == 0 and len(pdf) > 0:
                row = pdf.iloc[[0]].copy()
                row["n_dups_prior"] = 0
                out.append(row)
                first_seen = 1
            total += len(pdf)
        state.update((total,))
        if out:
            yield pd.concat(out)[[*cols, "n_dups_prior"]]

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
