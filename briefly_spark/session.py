"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); production
design point is a multi-executor cluster at ~100 TB.  Every knob set here is
chosen to behave sensibly in BOTH modes:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast-join demotion/promotion are the main levers that let one static
  plan survive a 1000x scale-up.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE's coalescing makes the initial number mostly a ceiling.
- Arrow enabled: every pandas-UDF operator in this engine is Arrow-batched.
- Session timezone pinned to UTC so timestamp semantics are engine- and
  host-independent (matters for the DuckDB correctness oracle too).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "briefly_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local master parallelism. If a session
    already exists (e.g. the driver passed one in), config that can only be
    set at build time is left as-is — all operators read config at call time
    where it matters.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # testdata events.parquet stores TIMESTAMP(NANOS).  Spark 4.x reads
        # it as TIMESTAMP_NTZ (the 3.x `spark.sql.legacy.parquet.nanosAsLong`
        # conf is inert here); catalog.normalize_event_ts converts either
        # arrival type to TimestampType (micros) on load.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Allow shuffled-hash join where its size conditions fit (guide §9
        # baseline; §3.1): both sides still shuffle, but the smaller side
        # builds a hash table instead of BOTH sides sorting — measured
        # 5-20% on the join-heavy iterative queries (q95 4.6→3.7 s, q31
        # 5.6→4.5 s, q116 3.5→3.1 s at sf0.1) with identical results.
        # Scale note: this is a planner PREFERENCE, not a local[32] tune —
        # AQE skew-join splitting applies to shuffled-hash joins too, and
        # a build side that outgrows memory falls back per-partition
        # spill-free risk is bounded by the same size estimates sort-merge
        # relies on; revisit per-join with SHUFFLE_MERGE hints if a
        # production profile shows build-side OOM.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # A small parquet table is one file => ONE scan partition, which
        # serializes every downstream narrow stage (shingling, signatures,
        # nested-loop pair joins run at parallelism 1).  Force file splits
        # to at least the core count; at 100 TB files outnumber cores and
        # this floor is a no-op.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # InferFiltersFromGenerate clones the generator's child expression
        # into a size()>0 filter at the scan; for computed-array explodes
        # (shingles, chunks, signatures) that re-evaluates the whole array
        # pipeline per row in an interpreted Filter — strictly worse than
        # just exploding. Measured 26s → 1s on the MinHash shingle explode.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
        # local[N] = driver AND all executors in ONE JVM whose default heap
        # is 1g — 32 task threads sharing 1g OOM on any >sf0.1 shuffle
        # (observed: tools/bench_scale.py 32x sweep).  Size the single JVM
        # like the executor it is; launch-time-only, so an externally
        # provided session (the driver's) is never touched, and on a real
        # cluster executor memory is the deployment's knob, not this one.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
