"""q136 Heaps curve / q137 Zipf curve invariants the oracle hash can't
see directly: monotone cumulative counts, first-occurrence partition of
the vocab, nonnegative piecewise slopes, and det_ln_py three-engine
agreement on the emitted fixed-point logs."""

from __future__ import annotations

from briefly_spark.numerics import det_ln_py
from briefly_spark.queries.analytics import (
    q136_heaps_vocab_growth,
    q137_zipf_rank_curve,
)


def test_heaps_curve_invariants(spark, sf_dir):
    rows = {r["bucket"]: r for r in q136_heaps_vocab_growth(spark, sf_dir).collect()}
    buckets = sorted(rows)
    assert buckets == list(range(len(buckets)))  # dense checkpoint ids
    prev_docs = prev_toks = prev_types = 0
    total_new = 0
    for b in buckets:
        r = rows[b]
        # cumulative counts are the running sums of the per-bucket tallies
        assert r["docs_cum"] == prev_docs + r["n_docs"]
        assert r["toks_cum"] == prev_toks + r["n_toks"]
        assert r["types_cum"] == prev_types + r["new_types"]
        prev_docs, prev_toks, prev_types = r["docs_cum"], r["toks_cum"], r["types_cum"]
        total_new += r["new_types"]
        # emitted fp logs agree with the pure-Python det_ln third engine
        if r["toks_cum"] >= 1:
            assert r["ln_toks_fp"] == int(det_ln_py(r["toks_cum"]) * 10000 // 1)
        if r["types_cum"] >= 1:
            assert r["ln_types_fp"] == int(det_ln_py(r["types_cum"]) * 10000 // 1)
        # Heaps exponent is a fraction: 0 <= beta <= 1 (V grows at most
        # linearly in N) whenever defined
        if r["beta_fp"] is not None:
            assert 0 <= r["beta_fp"] <= 10000
    # first-occurrence buckets PARTITION the vocabulary
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from briefly_spark.operators.search import tokens_of
    from pyspark.sql import functions as F

    vocab = docs_df.select(F.explode(tokens_of(F.col("text"))).alias("t")).distinct().count()
    assert total_new == vocab
    assert rows[buckets[-1]]["types_cum"] == vocab


def test_zipf_curve_invariants(spark, sf_dir):
    rows = sorted(q137_zipf_rank_curve(spark, sf_dir).collect(), key=lambda r: r["rk"])
    # checkpoints are exactly the powers of two within the vocab depth
    assert [r["rk"] for r in rows] == [1 << i for i in range(len(rows))]
    prev_c = None
    for r in rows:
        assert r["c"] >= 1
        assert r["ln_rank_fp"] == int(det_ln_py(r["rk"]) * 10000 // 1)
        assert r["ln_count_fp"] == int(det_ln_py(r["c"]) * 10000 // 1)
        if prev_c is not None:
            assert r["c"] <= prev_c  # rank order means nonincreasing counts
            assert r["slope_fp"] is not None and r["slope_fp"] >= 0
        else:
            assert r["slope_fp"] is None
        prev_c = r["c"]
