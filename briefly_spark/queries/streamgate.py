"""q120 — the streaming/jobs surface made visible to the driver gate.

The streaming twins (streaming/incremental.py) and the Warehouse merge
protocol (storage.py) were pytest-only at the driver: their entry points
need a checkpoint dir and a warehouse root, which the pure
``(spark, sf_dir) -> DataFrame`` gate contract doesn't provide.  q120
closes that gap (VERDICT.md r05 next-round #6) by running the WHOLE
micro-batched pipeline — parquet file stream → per-batch Misra–Gries
summaries → batch-id-keyed Warehouse merges → exact candidate-restricted
resolve — inside the query function against throwaway temp dirs, and
gating the RESOLVED output against the plain one-shot SQL oracle.  The
equality is the point: the MG merge bound is batch-boundary-independent
and the resolve pass is exact, so the streamed answer must hash-match
the batch answer (q28's oracle shape with the same φ = 1/100).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.queries import register


@register(
    "q120_hh_stream_resolve",
    covers=("T2", "A3", "A4"),
    oracle="""
WITH t AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM documents
),
c AS (SELECT term, count(*) AS freq FROM t GROUP BY term),
tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c)
SELECT term, freq FROM c, tot WHERE freq * 100 >= total
""",
)
def q120_hh_stream_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streamed heavy hitters: the documents table is replayed
    as three parquet micro-batches through ``heavy_hitter_stream`` (MG
    summaries merged into a Warehouse candidates table, batch-id-keyed —
    the T2 exactly-once discipline), then ``heavy_hitters_resolve``
    restricts an exact count to the accumulated candidates.  Gated
    against the one-shot SQL answer: equality holds for ANY batching
    because the MG undercount bound is additive over batches and the
    resolve pass re-counts exactly.

    Scale: each micro-batch is one bounded-memory mapInPandas pass plus a
    candidates-table merge of ≤ (k+1)·partitions rows; the resolve is a
    broadcast semi-join — the corpus never shuffles on the full
    vocabulary.  (The temp warehouse/checkpoint are per-run throwaways;
    at 100 TB these are durable tables and the stream is the live
    ingest.)"""
    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming.incremental import (
        heavy_hitter_stream,
        heavy_hitters_resolve,
        read_parquet_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # TemporaryDirectory (not bare mkdtemp) so the dir cannot leak if this
    # frame unwinds before any later cleanup would run
    with tempfile.TemporaryDirectory(prefix="q120_hh_") as root:
        src = f"{root}/src"
        # ONE partitioned write emits all three micro-batch dirs (b=0..2)
        # instead of three filter+coalesce write jobs (r15 opt): the
        # repartition clusters each batch into its own task, so every
        # value dir gets one file, and the stream's leaf-dir glob reads
        # the same (doc_id, text) schema — batch contents are identical
        # and the gate is batching-order independent by construction.
        (
            docs.withColumn("b", (F.col("doc_id") % 3).cast("int"))
            .repartition("b")
            .write.partitionBy("b")
            .parquet(src)
        )
        wh = Warehouse(spark, f"{root}/wh")
        heavy_hitter_stream(
            read_parquet_stream(spark, src + "/*/", max_files_per_trigger=1),
            wh,
            candidates_table="hh_cand",
            checkpoint=f"{root}/ckpt",
            text_col="text",
        )
        resolved = heavy_hitters_resolve(
            docs, wh, candidates_table="hh_cand", text_col="text", phi_den=100
        )
        # materialize before the temp warehouse disappears
        out = spark.createDataFrame(
            resolved.collect(), schema="term STRING, freq BIGINT"
        )
        return out
