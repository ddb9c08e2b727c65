"""Skew-stress bench (VERDICT r03 #6, r04 #7): measure that AQE skew
handling keeps the LSH/similarity/LM/dedup queries usable on a
deliberately skewed corpus.

Four skew shapes, one per query family:

- q41_related_articles — TOPIC skew: 90% of embeddings forced into one
  topic label, so the topic-blocked candidate join concentrates in one
  block.  This is the AQE-skew-join scenario: same join shape, one hot key.
- q31_minhash_lsh_pairs — LSH BUCKET skew: a slice of documents share one
  boilerplate text, collapsing them into a single band bucket.  NOTE the
  slice is 5%, not 90%: near-dup pair OUTPUT is quadratic in bucket
  membership, so "90% of docs in one bucket" is an output-explosion
  scenario (≈40M result pairs at sf0.1) that no engine's shuffle strategy
  changes — any correct engine must emit those pairs.  5% boilerplate
  (500 bucket members after the corpus doubling, ~125k pairs in ONE
  bucket vs O(100) elsewhere) isolates the actual skew question: does one
  hot bucket serialize the stage?
- q48 (lm_doc_scores) — HOT BIGRAM: a footer sentence appended to EVERY
  document, so its bigrams appear corpus-wide.  In ``c12_mode="window"``
  the global bigram count is a window over the (w1, w2) partition — the
  hot bigram's partition cannot be split.  ``c12_mode="join"`` partial-
  aggregates and equi-joins the counts back, which AQE skew-splits; this
  bench measures both modes under the same skew (the docstring's claimed
  scale path, now with a number attached).
- q29_dedup_survivors — HOT COMPONENT: the 5% boilerplate slice collapses
  into one giant near-dup cluster, so the component-partitioned election
  windows and the CC iterations see one massive key.
- q83_span_dedup — HOT SPAN: the same boilerplate slice makes each of its
  aligned 8-token spans a corpus-hot key; first-occurrence must partial-
  aggregate map-side (min-groupBy, not a window) and the keep equi-join
  must AQE skew-split.

Usage: python tools/bench_skew.py [sf_dir] — prints one JSON line with
cold/min-of-2 times for uniform vs skewed and the ratio; paste the table
into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from briefly_spark.catalog import TABLES, table_path
from briefly_spark.queries import load_registry
from briefly_spark.session import get_spark

WARMUP_SF_DIR = "/root/testdata/sf0.001"
BOILERPLATE = " ".join(
    f"boiler{i} common navigation footer subscribe newsletter cookie" for i in range(12)
)
#: appended to EVERY document in the "footer" shape — each adjacent pair
#: here becomes a bigram with corpus-wide document frequency (the q48
#: hot-window hazard)
FOOTER = "subscribe to our newsletter for daily updates and offers"
#: prepended to EVERY document in the "header" shape — 64 bytes (incl.
#: the joining space), i.e. exactly the first TWO fixed-stride 32-byte
#: frames of q104: every document shares those frame hashes, the
#: inverted-index hot-posting-list hazard the df cap exists for
HEADER = "breaking news network presents this exclusive special report.."


def build_skewed_dir(spark, sf_dir: str, out_dir: str, shape: str = "lsh") -> None:
    """Skewed copy of an sf dir: all tables linked through, documents (and
    for ``lsh`` also embeddings) rewritten with the requested skew shape."""
    os.makedirs(out_dir, exist_ok=True)
    rewrite = (
        ("documents", "embeddings")
        if shape == "lsh"
        else ("embeddings",)
        if shape == "vecdup"
        else ("documents",)
    )
    for t in TABLES:
        src = table_path(sf_dir, t)
        dst = table_path(out_dir, t)
        if t not in rewrite and not os.path.exists(dst):
            os.symlink(src, dst)
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    if shape == "lsh":
        skewed_docs = docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 20 == 0, F.lit(BOILERPLATE)).otherwise(
                F.col("text")
            ),
        )
    elif shape == "footer":
        skewed_docs = docs.withColumn(
            "text", F.concat_ws(" ", F.col("text"), F.lit(FOOTER))
        )
    elif shape == "header":
        skewed_docs = docs.withColumn(
            "text", F.concat_ws(" ", F.lit(HEADER), F.col("text"))
        )
    elif shape == "onelabel":
        # 99% of documents forced to lang='en': the q124 perceptron's
        # label becomes almost-constant, so early rounds misclassify
        # nearly everything and the gradient's feats⋈misclassified join
        # is corpus-sized — it must ride the persisted id partitioning
        # (equi-join, AQE-splittable), never a hot-key window
        skewed_docs = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 100 != 0, F.lit("en")).otherwise(F.col("lang")),
        )
    elif shape == "vecdup":
        # 20% of embeddings replaced by ONE constant vector: they all
        # quantize to identical PQ codes and coarse-assign to one cell —
        # the hot-cell / hot-candidate-bucket hazard for the ANN ladder
        emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
        emb.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 5 == 0,
                F.transform(F.col("embedding"), lambda x: x * F.lit(0.0) + F.lit(0.25)),
            ).otherwise(F.col("embedding")),
        ).write.mode("overwrite").parquet(table_path(out_dir, "embeddings"))
        return
    else:
        raise ValueError(f"unknown skew shape {shape!r}")
    skewed_docs.write.mode("overwrite").parquet(table_path(out_dir, "documents"))
    if shape == "lsh":
        emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
        emb.withColumn(
            "label",
            F.when(F.col("vec_id") % 10 != 0, F.lit(0)).otherwise(F.col("label")),
        ).write.mode("overwrite").parquet(table_path(out_dir, "embeddings"))


def run(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _q104_query(df_cap: int | None):
    """q104's candidate join with or without the hot-frame df cap — the
    no-cap variant exists ONLY here, to measure the hazard the cap
    removes."""
    from pyspark.sql import Window

    from briefly_spark.catalog import load_table, spread
    from briefly_spark.operators.multimodal import attach_media, frame_fingerprints

    def fn(spark, sf_dir):
        media = attach_media(spread(load_table(spark, sf_dir, "documents")))
        fp = frame_fingerprints(media, frame_bytes=32, n_frames=16)
        a_src = fp
        if df_cap is not None:
            a_src = fp.withColumn(
                "df",
                F.count(F.lit(1)).over(Window.partitionBy("frame_idx", "frame_md5")),
            ).filter(F.col("df") <= df_cap)
        a = a_src.select(F.col("media_id").alias("id_a"), "frame_idx", "frame_md5")
        b = fp.select(F.col("media_id").alias("id_b"), "frame_idx", "frame_md5")
        return (
            a.join(b, ["frame_idx", "frame_md5"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= 3)
        )

    return fn


def _lm_query(mode: str):
    from briefly_spark.catalog import load_table, spread
    from briefly_spark.operators.lm import lm_doc_scores

    def fn(spark, sf_dir):
        docs = spread(load_table(spark, sf_dir, "documents"))
        return lm_doc_scores(docs, "doc_id", "text", c12_mode=mode)

    return fn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_skew")
    registry = load_registry()
    queries = {
        "q31_minhash_lsh_pairs": registry["q31_minhash_lsh_pairs"].fn,
        "q41_related_articles": registry["q41_related_articles"].fn,
        "q29_dedup_survivors": registry["q29_dedup_survivors"].fn,
        # q83 hot-span hazard: the 5% identical-boilerplate slice makes
        # each of its ~11 aligned 8-token spans a corpus-hot key in the
        # first-occurrence min-groupBy (partial-aggregates map-side) and
        # the keep equi-join (AQE skew-splits) — the claimed no-hot-window
        # design, measured
        "q83_span_dedup": registry["q83_span_dedup"].fn,
        # q115 hot-component hazard: the boilerplate slice collapses into
        # ONE giant near-dup component; the per-round (dst, label) tally
        # partial-aggregates map-side, so the hot vertex never serializes
        "q115_label_propagation": registry["q115_label_propagation"].fn,
        # q119 tie-mass hazard: the identical-boilerplate slice gives 5%
        # of documents IDENTICAL curation-signal values, so each signal's
        # value histogram gets one hot bucket and the Borda rank map
        # hands out one giant tie class — the sort-free prefix-sum design
        # must absorb it (the histogram is value-keyed and partial-aggs
        # map-side; ranks attach by broadcast, never a per-doc window)
        "q119_rank_fusion": registry["q119_rank_fusion"].fn,
        # q122 output-explosion hazard (the q31 class, amplified): the
        # boilerplate slice is a containment-1.0 CLIQUE and q122 ships
        # WITHOUT the Jaccard size-ratio prune by design — the measured
        # ratio is the price of the correct answer (quadratic OUTPUT in
        # clique size), not an engine pathology; any correct engine must
        # emit those pairs
        "q122_shingle_containment": registry["q122_shingle_containment"].fn,
        # q131 hot-shingle + full-coverage hazard: the 5% identical-
        # boilerplate slice makes every one of its overlapping 8-shingles
        # corpus-hot (count groupBy must partial-agg map-side) and those
        # docs FULLY covered (the interval-merge window sees a dense dup-
        # start frame for them, still partitioned by doc)
        "q131_exact_substring_dedup": registry["q131_exact_substring_dedup"].fn,
        # q140 hot-histogram-value hazard: the 5% identical-boilerplate
        # slice gets ONE identical avg-NLL score, so the (lang, avg_fp)
        # value histogram gains a hot key — it must partial-agg map-side,
        # and the cumulative window still runs on the value-bounded
        # histogram (never per-doc)
        "q140_ccnet_ppl_buckets": registry["q140_ccnet_ppl_buckets"].fn,
    }
    # q109 hot-word hazard rides the FOOTER corpus (below): a sentence in
    # every document makes its words corpus-hot, but BPE counts pairs on
    # the distinct-WORD frame — frequency is a weight column, not a key
    footer_queries = {
        "q109_bpe_merges": registry["q109_bpe_merges"].fn,
        # footer shape for the substring pair: EVERY doc gains the same
        # 9-token footer, so every doc carries dup windows — the sparse-
        # dup-starts assumption is deliberately violated corpus-wide; the
        # per-doc windows stay doc-partitioned and the keep-first min-
        # groupBy (q133) must combine the corpus-hot shingle map-side
        "q131_exact_substring_dedup_footer": registry[
            "q131_exact_substring_dedup"
        ].fn,
        "q133_substring_dedup_keepfirst": registry[
            "q133_substring_dedup_keepfirst"
        ].fn,
    }

    skew_dir = tempfile.mkdtemp(prefix="skewed_sf_")
    footer_dir = tempfile.mkdtemp(prefix="skewed_footer_sf_")
    try:
        build_skewed_dir(spark, sf_dir, skew_dir, shape="lsh")
        build_skewed_dir(spark, sf_dir, footer_dir, shape="footer")
        for name, fn in queries.items():  # warmup: plans + codegen
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()

        out = {}
        for name, fn in queries.items():
            uniform = run(fn, spark, sf_dir)
            skewed = run(fn, spark, skew_dir)
            # contrast: skewed corpus with AQE skew-join splitting OFF
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                skewed_noaqe = run(fn, spark, skew_dir)
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            out[name] = {
                "uniform_s": uniform,
                "skewed_s": skewed,
                "skewed_no_skewjoin_s": skewed_noaqe,
                "ratio": round(skewed / uniform, 2),
            }

        for name, fn in footer_queries.items():
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = {
                "uniform_s": run(fn, spark, sf_dir),
                "skewed_s": run(fn, spark, footer_dir),
            }
            out[name]["ratio"] = round(
                out[name]["skewed_s"] / out[name]["uniform_s"], 2
            )

        # q48 hot-bigram shape: window vs join global-count strategy under
        # the same universal-footer skew (lm.py's documented scale path)
        lm_out = {}
        for mode in ("window", "join"):
            fn = _lm_query(mode)
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            lm_out[f"uniform_{mode}_s"] = run(fn, spark, sf_dir)
            lm_out[f"skewed_{mode}_s"] = run(fn, spark, footer_dir)
        lm_out["skew_ratio_window"] = round(
            lm_out["skewed_window_s"] / lm_out["uniform_window_s"], 2
        )
        lm_out["skew_ratio_join"] = round(
            lm_out["skewed_join_s"] / lm_out["uniform_join_s"], 2
        )
        out["q48_lm_doc_scores"] = lm_out

        # q118 hot-cell shape: 20% of embeddings are one constant vector,
        # so they share PQ codes and a coarse cell — candidate generation
        # must stay bucket-bounded (per-query shortlist cap) instead of
        # fanning out quadratically in the hot cell
        vecdup_dir = tempfile.mkdtemp(prefix="skewed_vecdup_sf_")
        try:
            build_skewed_dir(spark, sf_dir, vecdup_dir, shape="vecdup")
            fn = registry["q118_pq_ann"].fn
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            q118_out = {
                "uniform_s": run(fn, spark, sf_dir),
                "skewed_s": run(fn, spark, vecdup_dir),
            }
            q118_out["ratio"] = round(
                q118_out["skewed_s"] / q118_out["uniform_s"], 2
            )
            out["q118_pq_ann"] = q118_out
        finally:
            shutil.rmtree(vecdup_dir, ignore_errors=True)

        # q124 classifier shapes (VERDICT r07 #2c): (1) hot feature
        # bucket — the universal footer concentrates token mass into the
        # footer words' few hash buckets, which the ≤33-group gradient
        # partial-agg must absorb map-side (j is never a shuffle key at
        # corpus granularity); (2) 99%-one-label — an almost-constant
        # label makes the per-round misclassified set corpus-sized, so
        # the feats⋈mis id equi-join carries the whole corpus and must
        # reuse the persisted id partitioning instead of serializing
        onelabel_dir = tempfile.mkdtemp(prefix="skewed_onelabel_sf_")
        try:
            build_skewed_dir(spark, sf_dir, onelabel_dir, shape="onelabel")
            clf_fn = registry["q124_classifier_train"].fn
            clf_fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            clf_out = {
                "uniform_s": run(clf_fn, spark, sf_dir),
                "hot_bucket_footer_s": run(clf_fn, spark, footer_dir),
                "onelabel_s": run(clf_fn, spark, onelabel_dir),
            }
            clf_out["ratio_hot_bucket"] = round(
                clf_out["hot_bucket_footer_s"] / clf_out["uniform_s"], 2
            )
            clf_out["ratio_onelabel"] = round(
                clf_out["onelabel_s"] / clf_out["uniform_s"], 2
            )
            out["q124_classifier_train"] = clf_out

            # q141 NB shapes (same corpora): (1) footer — token mass
            # concentrates into the footer words' few hash buckets, which
            # the (class, bucket) count aggregate must absorb map-side
            # (bounded groups, never a doc-keyed shuffle); (2) onelabel —
            # one class owns ~99% of the token mass AND the priors; the
            # model stays a (classes × buckets) broadcast either way
            nb_fn = registry["q141_nb_confusion"].fn
            nb_fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            nb_out = {
                "uniform_s": run(nb_fn, spark, sf_dir),
                "hot_bucket_footer_s": run(nb_fn, spark, footer_dir),
                "onelabel_s": run(nb_fn, spark, onelabel_dir),
            }
            nb_out["ratio_hot_bucket"] = round(
                nb_out["hot_bucket_footer_s"] / nb_out["uniform_s"], 2
            )
            nb_out["ratio_onelabel"] = round(
                nb_out["onelabel_s"] / nb_out["uniform_s"], 2
            )
            out["q141_nb_confusion"] = nb_out
        finally:
            shutil.rmtree(onelabel_dir, ignore_errors=True)

        # q104 hot-frame shape: a universal 64-byte header makes the
        # first two fixed-stride frames corpus-hot; the df cap drops
        # them, the no-cap variant pays the quadratic posting fan-out
        header_dir = tempfile.mkdtemp(prefix="skewed_header_sf_")
        try:
            build_skewed_dir(spark, sf_dir, header_dir, shape="header")
            q104_out = {}
            for label, cap in (("cap", 64), ("nocap", None)):
                fn = _q104_query(cap)
                fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
                q104_out[f"uniform_{label}_s"] = run(fn, spark, sf_dir)
                q104_out[f"header_{label}_s"] = run(fn, spark, header_dir)
            q104_out["skew_ratio_cap"] = round(
                q104_out["header_cap_s"] / q104_out["uniform_cap_s"], 2
            )
            q104_out["skew_ratio_nocap"] = round(
                q104_out["header_nocap_s"] / q104_out["uniform_nocap_s"], 2
            )
            out["q104_frame_fingerprints"] = q104_out

            # q142 hot-posting hazard: the universal header makes every
            # query doc's leading bigram (the phrase) corpus-hot — leg A
            # touches the postings of that first word corpus-wide and
            # EVERY doc matches every query (output-driven work, the
            # q31/q122 class); the adjacency equi-join must AQE-split and
            # the (qid, doc) count must partial-agg map-side
            ph_fn = registry["q142_phrase_search"].fn
            ph_fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
            ph_out = {
                "uniform_s": run(ph_fn, spark, sf_dir),
                "header_s": run(ph_fn, spark, header_dir),
            }
            ph_out["ratio"] = round(ph_out["header_s"] / ph_out["uniform_s"], 2)
            out["q142_phrase_search"] = ph_out
        finally:
            shutil.rmtree(header_dir, ignore_errors=True)

        print(json.dumps({"sf_dir": sf_dir, "results": out}))
    finally:
        shutil.rmtree(skew_dir, ignore_errors=True)
        shutil.rmtree(footer_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
