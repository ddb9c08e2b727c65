"""Column-level function library — SURVEY.md §2.8 F-series.

Native ``pyspark.sql.functions`` expressions wherever Spark can express the
semantics (JVM-side, whole-stage-codegen'd); Python only where the stdlib is
genuinely required (html unescape), and then as Arrow-batched pandas UDFs.
"""
