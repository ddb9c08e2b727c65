"""Table catalog: load the driver testdata tables and register views.

Tables (TESTDATA.md): ``region nation customer supplier part orders
lineitem events documents embeddings`` — one parquet each under an
``sf*`` directory.  At the 100 TB design point these become partitioned
parquet/Delta table roots; the loader is the single place that knows
physical layout, so swapping in ``spark.read.table`` or a partitioned
path scheme is a one-file change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-join candidates.
DIM_TABLES = ("region", "nation", "supplier", "part", "customer")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a parquet TIMESTAMP(NANOS) column to TimestampType (micros).

    How the nanos column arrives depends on the Spark version:

    - Spark 3.x with ``spark.sql.legacy.parquet.nanosAsLong``: a raw
      epoch-nanos LongType.  Convert with integer ``div`` (NOT ``/``:
      epoch-nanos ~1.7e18 exceed double precision 2^53, so
      ``floor(ts / 1000.0)`` is off by ±1 µs).
    - Spark 4.x: the nanosAsLong conf is inert and the column loads as
      TIMESTAMP_NTZ (nanos truncated to micros by the reader).  Cast to
      TimestampType — the session timezone is pinned UTC, so the cast is
      value-stable (same wall-clock instant, same oracle hash), and
      Structured Streaming watermarks require TimestampType (NTZ is
      rejected with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).

    DuckDB reads the same column as TIMESTAMP at micros, so both branches
    land on identical values.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


#: (applicationId, path, mtime_ns) -> the scan DataFrame.  A DataFrame is
#: an immutable LOGICAL plan — memoizing it shares plan construction, not
#: data: every action still plans physically under the current session
#: conf and reads the parquet bytes.  What it removes is the ~110 ms of
#: driver time `spark.read.parquet` burns per call on schema inference +
#: file-index setup (measured at r15; ~250 load_table calls per bench run
#: ⇒ tens of seconds of pure re-planning of the same five immutable
#: paths).  The mtime key invalidates the entry if anything rewrites the
#: path (atomic dir swaps and fresh replica builds both bump it).
_LOAD_MEMO: dict[tuple[str, str, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    import os as _os

    path = table_path(sf_dir, name)
    sc = spark.sparkContext
    app_id = getattr(sc, "_briefly_app_id", None)
    if app_id is None:
        app_id = sc.applicationId  # one py4j round-trip, once per context
        sc._briefly_app_id = app_id  # type: ignore[attr-defined]
    key = (app_id, path, _os.stat(path).st_mtime_ns)
    df = _LOAD_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_event_ts(df)
        # Stamp the scan's identity so spread() can memoize its
        # partition-count probe per table version: the probe key shares
        # this entry's full (app, path, mtime) identity, so a rewritten
        # path or a new context can never reuse a stale partition count
        # (ADVICE r15 #2 — the old probe key was (path, parallelism)
        # only, surviving both rewrites and session restarts).
        df._briefly_scan_key = key  # type: ignore[attr-defined]
        # Evict superseded entries on insert (ADVICE r15 #3 / VERDICT
        # r15 #8): entries from other applicationIds pin DataFrames of
        # dead/foreign contexts for the process lifetime, and an older
        # mtime of the same path can never be read again.  Keeps both
        # memos bounded by the live table count of one app.
        stale = [
            k for k in _LOAD_MEMO
            if k != key
            and (k[0] != app_id or (k[1] == path and k[2] != key[2]))
        ]
        for k in stale:
            del _LOAD_MEMO[k]
        if stale:
            dead = {k[:3] for k in _SPREAD_PROBE_MEMO} - set(_LOAD_MEMO) - {key}
            for k in [p for p in _SPREAD_PROBE_MEMO if p[:3] in dead]:
                del _SPREAD_PROBE_MEMO[k]
        _LOAD_MEMO[key] = df
    return df


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count straight from the parquet footer — no Spark job at
    all (pyarrow metadata read; the footer stores num_rows per file).
    The driver-side probe killer for auto-tier gates (VERDICT r14 #4):
    a raw-scan ``df.count()`` already prunes to metadata, but it still
    schedules a Spark job per call; this is a few microseconds of file
    I/O.  Only valid for the CATALOG parquet tables — derived frames
    must still count."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):  # replicated/warehouse layout: a dir of parts
        parts = glob.glob(os.path.join(path, "*.parquet")) or glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        if not parts:
            # an unrecognized layout must REFUSE, not report 0: scale
            # gates compare this count against pair bounds, and a silent
            # 0 flips them to the exact tier — the unsafe direction —
            # on an arbitrarily large corpus (r15 review finding)
            raise FileNotFoundError(f"no parquet parts under {path}")
        return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    return pq.ParquetFile(path).metadata.num_rows


def spread(df: DataFrame) -> DataFrame:
    """Ensure a DataFrame occupies at least the cluster's parallelism.

    A small table is one parquet file with one row group — it scans as a
    SINGLE partition no matter what ``spark.sql.files.minPartitionNum``
    says (a row group is the minimum read unit), which serializes every
    downstream narrow stage: shingling, signatures, Arrow UDF batches,
    nested-loop pair joins all run on one core.  One narrow shuffle here
    buys full-width execution for everything after.  When the scan is
    already wide (the 100 TB case — files ≫ cores) this is a no-op.

    The probe is memoized per catalog table VERSION (see
    :func:`load_table`): the split count of a parquet path is constant
    while its (app, path, mtime) identity holds, so only the first call
    per version pays the ~150 ms plan-translation cost of ``df.rdd``;
    derived frames (no stamp) still probe directly.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    scan_key = getattr(df, "_briefly_scan_key", None)
    if scan_key is not None:
        # key includes the parallelism: files.minPartitionNum follows the
        # core count, so a re-built session with different cores plans a
        # different split count for the same path
        key = (*scan_key, par)
        n = _SPREAD_PROBE_MEMO.get(key)
        if n is None:
            n = df.rdd.getNumPartitions()
            _SPREAD_PROBE_MEMO[key] = n
    else:
        n = df.rdd.getNumPartitions()
    if n < par:
        return df.repartition(par)
    return df


#: (app_id, scan path, mtime_ns, parallelism) -> planned partition count
#: (plan metadata, not data).  Shares _LOAD_MEMO's full version identity
#: (ADVICE r15 #2): a path rewrite bumps mtime and a new context changes
#: app_id, so a stale count can never skip (or force) the repartition;
#: load_table evicts entries here when their _LOAD_MEMO version dies.
_SPREAD_PROBE_MEMO: dict[tuple[str, str, int, int], int] = {}


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
