"""Unit + plan tests for operators/curation.py (q83–q85).

The oracle gate checks end-to-end hashes at sf0.01; these tests pin the
operator semantics on hand-built fixtures (keep-first span survival,
DSIR weight arithmetic against the CPython det_ln mirror, SemDeDup
keep-lowest-id) and the scale-design plan claims (no window over the
span key, broadcast feature/centroid joins).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from briefly_spark.numerics import RATIO_SCALE, det_ln_py
from briefly_spark.operators.curation import (
    dsir_log_weights,
    semantic_dedup,
    span_dedup,
)

from tests.test_plans import plan_of


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


A8, B8, C8 = _toks("a", 8), _toks("b", 8), _toks("c", 8)


def test_span_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (1, f"{A8} {B8}"),       # both spans first occurrences
            (2, f"{A8} {C8}"),       # span A repeated -> trimmed, C kept
            (3, f"{A8} {B8}"),       # exact copy of doc 1 -> fully trimmed
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in span_dedup(docs, id_col="id", text_col="text").collect()
    }
    assert set(out) == {1, 2}  # doc 3 reduced to nothing and dropped
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == f"{A8} {B8}"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == C8


def test_span_dedup_partial_last_window_and_order(spark):
    # 10 tokens -> spans of 8 + 2; the short tail span is its own unit
    docs = spark.createDataFrame(
        [(7, _toks("z", 10))], "id long, text string"
    )
    row = span_dedup(docs, id_col="id", text_col="text").collect()[0]
    assert row["n_spans"] == 2 and row["n_kept"] == 2
    assert row["clean_text"] == _toks("z", 10)  # order preserved


def test_span_dedup_randomized_invariants(spark):
    # tiny alphabet + short spans force heavy span collisions; the core
    # invariant is conservation: every DISTINCT span text in the input
    # survives in exactly ONE output doc, and each doc's kept spans are a
    # subsequence of its original spans (order preserved, nothing invented)
    import random

    rng = random.Random(83)
    alphabet = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    out = span_dedup(docs, id_col="id", text_col="text", span_tokens=2).collect()

    def spans_of(text: str) -> list[str]:
        toks = text.split(" ")
        return [" ".join(toks[i : i + 2]) for i in range(0, len(toks), 2)]

    orig = {i: spans_of(t) for i, t in rows}
    all_distinct = {s for sp in orig.values() for s in sp}
    kept_flat: list[str] = []
    for r in out:
        kept = spans_of(r["clean_text"])
        assert r["n_kept"] == len(kept) and r["n_spans"] == len(orig[r["id"]])
        # subsequence of the original span list
        it = iter(orig[r["id"]])
        assert all(s in it for s in kept), (r["id"], kept, orig[r["id"]])
        kept_flat.extend(kept)
    assert sorted(kept_flat) == sorted(all_distinct)


def test_span_dedup_incremental_equals_one_shot(spark, tmp_path):
    # the incremental contract: folding monotone-id batches through the
    # registry reproduces the one-shot result exactly — with the registry
    # persisted through a real Warehouse merge between batches
    import random

    from briefly_spark.operators.curation import span_dedup_incremental
    from briefly_spark.storage import Warehouse

    rng = random.Random(85)
    alphabet = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(2, 10))))
        for i in range(24)
    ]
    all_docs = spark.createDataFrame(rows, "id long, text string")
    expect = {
        r["id"]: (r["n_spans"], r["n_kept"], r["clean_text"])
        for r in span_dedup(
            all_docs, id_col="id", text_col="text", span_tokens=2
        ).collect()
    }

    wh = Warehouse(spark, str(tmp_path / "wh_spans"))
    wh.overwrite(
        spark.createDataFrame([], "span string, first_key long"), "span_registry"
    )
    got: dict[int, tuple] = {}
    last_clean: dict[int, tuple] = {}
    for lo, hi in ((0, 8), (8, 16), (16, 24)):
        batch = spark.createDataFrame(rows[lo:hi], "id long, text string")
        clean, delta = span_dedup_incremental(
            batch,
            wh.read("span_registry"),
            id_col="id",
            text_col="text",
            span_tokens=2,
        )
        last_clean = {
            r["id"]: (r["n_spans"], r["n_kept"], r["clean_text"])
            for r in clean.collect()
        }
        got.update(last_clean)
        wh.merge_upsert(delta, "span_registry", ["span"])
    assert got == expect
    # the registry ends up holding exactly the corpus's distinct spans
    n_reg = wh.read("span_registry").count()
    n_distinct = sum(v[1] for v in expect.values())
    assert n_reg == n_distinct

    # replay idempotence: the last batch's delta is already merged (the
    # foreachBatch crash-replay window) — re-running it must reproduce
    # byte-identical output via own-claim recognition, and re-merging its
    # delta must leave the registry unchanged
    batch = spark.createDataFrame(rows[16:24], "id long, text string")
    clean2, delta2 = span_dedup_incremental(
        batch, wh.read("span_registry"), id_col="id", text_col="text", span_tokens=2
    )
    replay = {
        r["id"]: (r["n_spans"], r["n_kept"], r["clean_text"])
        for r in clean2.collect()
    }
    assert replay == last_clean
    wh.merge_upsert(delta2, "span_registry", ["span"])
    assert wh.read("span_registry").count() == n_reg


def _hash16_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_dsir_weights_match_python_mirror(spark):
    B = 64
    rows = [
        (1, "cat sat mat sat", True),
        (2, "cat sat hat", True),
        (3, "dog ran far ran dog", False),
    ]
    docs = spark.createDataFrame(
        [(i, t, l) for i, t, l in rows], "id long, text string, is_en boolean"
    )
    out = {
        r["id"]: (r["n_bigrams"], r["weight_fp"])
        for r in dsir_log_weights(
            docs, id_col="id", text_col="text", target=F.col("is_en"), n_buckets=B
        ).collect()
    }

    # CPython mirror: identical hash, identical det_ln rounding sequence.
    feats: dict[int, list[int]] = {}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for i, t, is_t in rows:
        toks = t.split(" ")
        fs = [_hash16_py(f"{a} {b}") % B for a, b in zip(toks, toks[1:])]
        feats[i] = fs
        for f in fs:
            cr[f] = cr.get(f, 0) + 1
            ct[f] = ct.get(f, 0) + int(is_t)
    R, T = sum(cr.values()), sum(ct.values())
    fp = lambda n: math.floor(det_ln_py(n) * RATIO_SCALE)  # noqa: E731
    score = {
        f: fp(ct[f] + 1) + fp(R + B) - fp(cr[f] + 1) - fp(T + B) for f in cr
    }
    for i, _, _ in rows:
        expect = (len(feats[i]), sum(score[f] for f in feats[i]))
        assert out[i] == expect, (i, out[i], expect)


def test_dsir_targets_score_above_offtarget(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", True) for i in range(6)]
        + [(10 + i, "uno dos tres cuatro", False) for i in range(4)],
        "id long, text string, is_en boolean",
    )
    out = dsir_log_weights(
        docs, id_col="id", text_col="text", target=F.col("is_en"), n_buckets=256
    ).collect()
    w = {r["id"]: r["weight_fp"] for r in out}
    assert min(w[i] for i in range(6)) > max(w[10 + i] for i in range(4))


def test_semantic_dedup_flags_higher_id_twin(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),   # twin of 1 -> dup
            (3, [0.0, 1.0]),
            (4, [0.0, 1.0]),   # twin of 3 -> dup
        ],
        "id long, v array<double>",
    )
    out = semantic_dedup(emb, id_col="id", vec_col="v", n_cells=2, threshold=0.99)
    rows = {r["id"]: r["is_dup"] for r in out.collect()}
    assert rows == {1: 0, 2: 1, 3: 0, 4: 1}


def test_semantic_dedup_orthogonal_not_flagged(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id long, v array<double>"
    )
    out = semantic_dedup(emb, id_col="id", vec_col="v", n_cells=1, threshold=0.99)
    assert {r["is_dup"] for r in out.collect()} == {0}


# ---------------------------------------------------------------------------
# plan claims
# ---------------------------------------------------------------------------
def test_q83_first_occurrence_is_agg_not_window(spark, sf_dir):
    # the keep-first decision must be a partial-aggregable min-groupBy —
    # a Window over the span key would serialize on hot boilerplate spans
    plan = plan_of(spark, sf_dir, "q83_span_dedup")
    assert "Window" not in plan, plan


def test_q84_feature_table_joins_broadcast(spark, sf_dir):
    # the <=4096-row feature/score table must broadcast into the per-doc
    # pass — a shuffle join here would reshuffle the whole exploded corpus
    plan = plan_of(spark, sf_dir, "q84_dsir_weights")
    assert "BroadcastHashJoin" in plan, plan


def test_q85_centroid_assignment_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q85_semantic_dedup")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_q88_vocab_via_take_ordered_and_broadcast(spark, sf_dir):
    # top-V must be TakeOrdered (a global Sort over all distinct tokens
    # would not survive corpus scale) and the vocab must broadcast into
    # the encode join
    plan = plan_of(spark, sf_dir, "q88_vocab_encode")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# kmeans_refine — deterministic Lloyd rounds
# ---------------------------------------------------------------------------
def test_kmeans_refine_separates_planted_clusters(spark):
    from briefly_spark.operators.curation import kmeans_refine

    # two tight blobs far apart; seeds (ids 0,1) both land in blob A, so
    # only an actual centroid UPDATE can pull one seed over to blob B
    blob_a = [[0.0 + 0.01 * i, 0.0] for i in range(6)]       # ids 0..5
    blob_b = [[10.0 + 0.01 * i, 10.0] for i in range(6)]     # ids 6..11
    rows = [(i, v) for i, v in enumerate(blob_a + blob_b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_refine(df, id_col="vec_id", vec_col="embedding", k=2, iters=3)
    got = {r["id"]: r["cell"] for r in out.collect()}
    cells_a = {got[i] for i in range(6)}
    cells_b = {got[i] for i in range(6, 12)}
    assert len(cells_a) == 1 and len(cells_b) == 1 and cells_a != cells_b


def test_kmeans_refine_zero_iters_is_seed_assignment(spark):
    from briefly_spark.operators.curation import kmeans_refine

    rows = [(i, [float(i), 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_refine(df, id_col="vec_id", vec_col="embedding", k=2, iters=0)
    got = {r["id"]: (r["cell"], r["sq_dist"]) for r in out.collect()}
    # seeds are ids 0 and 1; each point goes to the nearer seed, ties to
    # the smaller cell id, and the seed rows themselves have distance 0
    assert got[0] == (0, 0) and got[1] == (1, 0)
    assert got[2][0] == 1 and got[3][0] == 1 and got[4][0] == 1
