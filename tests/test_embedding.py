"""Embedding harness tests: the Arrow/mapInPandas plumbing must be
byte-identical to the native stub expression, and the model backend must
fail loudly (not silently fall back) when model libs are absent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table
from briefly_spark.operators.embedding import (
    embed_map_in_pandas,
    hash_embed_expr,
    hash_embed_py,
)


def test_arrow_harness_matches_native_expr(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    native = docs.select("doc_id", hash_embed_expr(F.col("text"), 8).alias("v"))
    arrow = embed_map_in_pandas(docs, "text", "doc_id", dims=8, backend="hash")
    n = {r["doc_id"]: r["v"] for r in native.collect()}
    a = {r["doc_id"]: r["vector"] for r in arrow.collect()}
    assert n == a  # exact float equality — both are dyadic md5-derived


def test_hash_embed_py_matches_expr(spark):
    df = spark.createDataFrame([("hello world",)], ["text"])
    got = df.select(hash_embed_expr(F.col("text"), 4).alias("v")).first()["v"]
    assert got == hash_embed_py("hello world", 4)


def test_model_backend_is_import_gated(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(2)
    out = embed_map_in_pandas(docs, "text", "doc_id", dims=4, backend="model")
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        out.collect()


def test_mean_pool_exactness(spark):
    # dyadic values: mean over permuted row orders must be identical
    from briefly_spark.functions.vectors import mean_pool

    rows = [(1, [0.25, -0.5]), (1, [0.75, 0.5]), (1, [0.5, 0.25])]
    a = mean_pool(spark.createDataFrame(rows, "id long, v array<double>"), ["id"], "v")
    b = mean_pool(
        spark.createDataFrame(list(reversed(rows)), "id long, v array<double>"), ["id"], "v"
    )
    assert a.first()["vector"] == b.first()["vector"] == [0.5, 0.08333333333333333]
