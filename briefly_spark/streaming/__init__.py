"""Structured Streaming layer — SURVEY §2.10's polling sensors re-expressed
as streams.

The reference detects work by polling MongoDB with status predicates every
60-300 s (T1) and registers per-article dynamic partitions (T2).  In this
engine the same semantics come in two interchangeable modes sharing one
operator layer:

- **batch mode** (briefly_spark.jobs): predicates as work-lists, cron-style
  re-runs; backfill = re-run (T3).
- **streaming mode** (this package): the table/source *is* the stream;
  ``Trigger.AvailableNow`` gives exactly the reference's periodic-sweep
  behavior with checkpointed exactly-once progress, and ``foreachBatch``
  funnels every micro-batch through the same idempotent keyed merge the
  batch jobs use — so at-least-once delivery + idempotent merge =
  effectively-once table state, no dynamic-partition registry needed.

Event-time operators (watermarked tumbling/sliding/session windows) share
expressions with the batch pack (queries/events.py q70-q72), which is
oracle-checked; streaming tests assert batch/stream agreement.
"""

from briefly_spark.streaming.incremental import (  # noqa: F401
    audited_merge_stream,
    available_now_to_memory,
    merge_stream,
    neardup_stream,
    read_parquet_stream,
    scd2_stream,
    session_counts,
    span_dedup_stream,
    substring_dedup_stream,
    windowed_counts,
)
from briefly_spark.streaming.stateful import stateful_dedup  # noqa: F401
