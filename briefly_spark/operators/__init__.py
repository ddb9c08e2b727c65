"""Composite operators — SURVEY.md §2 operators with no single Spark builtin.

Each is a pure ``DataFrame -> DataFrame`` function built from DataFrame
primitives; pandas UDFs appear only where per-row imperative logic is
irreducible (chunking, model inference), always Arrow-batched.
"""
