"""briefly_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference pipeline (Viperoxz/briefly).

Architecture (SURVEY.md §7.1): three layers —

1. tables   — schemas + parquet-backed storage with MERGE semantics
              (:mod:`briefly_spark.catalog`, :mod:`briefly_spark.merge`).
2. operators — every operator of SURVEY.md §2 as a pure
              ``DataFrame -> DataFrame`` function, native Column expressions
              first, Arrow-batched pandas UDFs only where Spark has no
              builtin (:mod:`briefly_spark.functions`,
              :mod:`briefly_spark.operators`).
3. jobs     — batch jobs mirroring the reference DAG (ingest / summarize /
              embed / relate / tts), each *work-list by status predicate →
              transform → single MERGE* (:mod:`briefly_spark.pipeline`),
              plus incremental wrappers (:mod:`briefly_spark.streaming`).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from briefly_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
