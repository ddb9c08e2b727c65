"""File-format sources beyond parquet (X134) and the schema contract
for continuous ingest (X135) — the boundary layer a 100 TB lake needs
in front of the admission gate: parse-level corruption routes to a
quarantine frame WITH provenance (raw record + source file) instead of
poisoning the batch, and schema drift between a delivery and the live
table is classified (additive / missing / retyped) before any merge.

Reference parity: the reference ingests RSS/HTML (S2/S3 —
operators/ingest.py); bulk-file deliveries (JSONL dumps, CSV exports)
are the batch twin every migrating pipeline also has.  Composes with
the rest of the boundary: read_jsonl/read_csv → (good → expectation
gate q147/X120 → merge; bad → the same quarantine discipline).

Spark-first: both readers are the built-in DataSource scans in
PERMISSIVE mode (JVM-side parsing, predicate/column pruning intact —
never a Python line loop); the corrupt-record column and
``input_file_name()`` provide the routing and provenance for free.

Scale: one scan; good/bad split is a filter on the corrupt column (both
frames share the scan until materialized).  Schema drift reports are
schema-sized driver work — no data pass at all.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: name reserved for Spark's corrupt-record capture
CORRUPT_COL = "_corrupt_record"


class QuarantinedRead(NamedTuple):
    """(good, bad, raw) — ``raw`` is the cached scan both routed frames
    share (the cache is REQUIRED for corrupt-record semantics, see
    ``_split``).  Callers MUST ``unpersist()`` after materializing good
    and bad, or the cached scan lives for the session (ADVICE r11 #5 —
    a continuous-ingest loop leaked one cached frame per delivery)."""

    good: DataFrame
    bad: DataFrame
    raw: DataFrame

    def unpersist(self) -> "QuarantinedRead":
        self.raw.unpersist()
        return self


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    # a NEW StructType — StructType.add mutates in place, and the caller's
    # schema must stay corrupt-free for the good-rows projection
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def _split(raw: DataFrame, data_cols: list[str]) -> QuarantinedRead:
    # provenance must be stamped AT the scan (input_file_name() is empty
    # once a cached frame re-serves rows); the cache itself is REQUIRED
    # for correct corrupt-record semantics on the JSON/CSV readers
    # (documented Spark behavior: the corrupt column must materialize
    # together with the parsed columns).
    raw = raw.withColumn("__source_file", F.input_file_name()).cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).select(*data_cols)
    bad = (
        raw.filter(F.col(CORRUPT_COL).isNotNull())
        .select(
            F.col(CORRUPT_COL).alias("raw_record"),
            F.col("__source_file").alias("source_file"),
        )
    )
    return QuarantinedRead(good, bad, raw)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> QuarantinedRead:
    """Schema-enforced JSON-lines scan → (good, bad, raw): records that
    fail to parse OR fail the declared schema land in ``bad`` as
    (raw_record, source_file); well-formed records project to exactly
    the declared columns.  PERMISSIVE + corrupt-column — one JVM scan,
    no Python in the loop.  ``raw`` is the shared cached scan — call
    ``.unpersist()`` once good/bad are materialized (QuarantinedRead)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw, schema.fieldNames())


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    sep: str = ",",
) -> QuarantinedRead:
    """Schema-enforced CSV scan → (good, bad, raw) with the same routing
    contract as :func:`read_jsonl` (malformed lines, wrong column
    counts, and uncastable fields quarantine with provenance)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("enforceSchema", "false")
        .csv(path)
    )
    return _split(raw, schema.fieldNames())


# -- X135: schema contract between a delivery and the live table -------------


def schema_drift_report(
    batch: DataFrame, table: DataFrame
) -> dict[str, list[str] | list[tuple[str, str, str]]]:
    """Classify the schema delta of a delivery against the live table —
    driver-side only, no data pass:

      added   — columns the batch has and the table lacks (candidate
                additive evolution),
      missing — table columns absent from the batch (filled NULL by
                :func:`conform_batch`),
      retyped — same name, different type: (col, batch_type, table_type)
                — NEVER auto-resolved; a silent cast is how a lake
                corrupts itself."""
    b = dict(batch.dtypes)
    t = dict(table.dtypes)
    return {
        "added": sorted(c for c in b if c not in t),
        "missing": sorted(c for c in t if c not in b),
        "retyped": sorted(
            (c, b[c], t[c]) for c in b if c in t and b[c] != t[c]
        ),
    }


def conform_batch(
    batch: DataFrame, table: DataFrame, *, allow_additive: bool = False
) -> DataFrame:
    """Align a delivery to the live table's schema contract, or refuse:

    - retyped columns always raise (the contract violation),
    - added columns raise unless ``allow_additive`` (then they are
      DROPPED from the conformed batch — additive evolution of the
      TABLE is a separate, deliberate migration, not an ingest
      side-effect),
    - missing columns fill with typed NULLs,
    - column order conforms to the table.

    The result is mergeable into the table by any Warehouse merge."""
    drift = schema_drift_report(batch, table)
    if drift["retyped"]:
        raise ValueError(f"schema contract violation — retyped: {drift['retyped']}")
    if drift["added"] and not allow_additive:
        raise ValueError(
            f"unexpected new columns {drift['added']} — pass "
            f"allow_additive=True to drop them, or migrate the table first"
        )
    t_types = dict(table.dtypes)
    return batch.select(
        *[
            F.col(c).alias(c)
            if c in batch.columns
            else F.lit(None).cast(t_types[c]).alias(c)
            for c in table.columns
        ]
    )
