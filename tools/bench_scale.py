"""Weak-scaling sweep: measure how the corpus operators' wall time grows
when the documents table grows K× — the local stand-in for the "would
this plan survive 100× the data?" question the scale design answers on
paper (COVERAGE.md X-series notes).

Corpus construction: the documents table is replicated K× with every
token PREFIXED by a replica tag (``r3the r3quick ...``) and doc_ids
offset per replica.  Prefixing (rather than appending a tag token)
keeps replicas lexically DISJOINT at the WORD level — no cross-replica
shingles, spans, bigrams or band keys — so every query's output
cardinality grows linearly in K and the sweep measures engine scaling,
not output explosion.  Within a replica the dup/near-dup structure of
the original corpus is preserved exactly.  CAVEAT (r14, measured): the
word-level guarantee does NOT extend to CHARACTER q-grams — "quick" is
a substring of "r3quick" — so char-gram operators (the q37 fuzzy tier)
see the untagged original replica's grams recur in every tagged
replica, inflating prefix-filter candidates by an n_orig·K term; their
cells here are an artifact CEILING, dispositioned in BENCH_NOTES with
a char-disjoint (per-replica Caesar rotation) control showing the
engine leg sub-linear.

Queries, one per shuffle family:

- q50_token_stats       — map-only (+ rollup): the linear floor.
- q30_exact_dedup       — hash-agg shuffle + (r13) the X147 split/leakage
  legs on the groups frame (digest-keyed; text never shuffles).
- q83_span_dedup        — min-groupBy + keep equi-join + per-doc agg.
- q84_dsir_weights      — explode + BOUNDED feature agg (table stays
  ≤ n_buckets rows at every K — the broadcast-by-construction claim) +
  broadcast join back.
- q31_minhash_lsh_pairs — banded self-equi-join (the near-dup scale path).
- q47_bm25_search       — inverted-index postings equi-join.

Output: one JSON line {"sf_dir":..., "ks":[...], "results": {query:
{"t_<K>": sec, ..., "x64": t(K_max)/t(1), "eff": K_max / x64}}}.
``eff`` ≈ 1 means perfectly linear weak scaling on a fixed-size
executor pool (time grows with data); eff > 1 means sublinear growth
(fixed overheads amortizing); the red flag is eff ≪ 1 (superlinear —
a quadratic join or a hot serial stage).  Paste into BENCH_NOTES.md.

Usage: python tools/bench_scale.py [sf_dir] [K ...] [--isolate]
(default sf0.1, K=1 8 64; --isolate runs one subprocess/session per K —
the exponent-grade protocol, see _run_isolated)

Heap: the heavy pack at K >= 32 needs SPARK_GRAFT_DRIVER_MEM=48g — the
8g session default OOMs on the biggest agg states (measured r14: flat
PQ's 2e8-group ADC agg at x32; the per-cell emission below preserves
everything measured up to such a crash).
"""

from __future__ import annotations

import json
import math
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
QUERIES = (
    "q50_token_stats",
    "q30_exact_dedup",
    "q83_span_dedup",
    "q84_dsir_weights",
    "q86_dsir_select",
    "q88_vocab_encode",
    "q31_minhash_lsh_pairs",
    "q47_bm25_search",
    "q28_heavy_hitters",
    "q97_bloom_decontaminate",
    "q109_bpe_merges",
    "q117_source_drift_kl",
    # iterative driver-loop family: 3 synchronous perceptron rounds over
    # the ONE persisted feature frame — time must scale with the frame,
    # rounds stay 3, driver state stays ≤33 rows at every K
    "q124_classifier_train",
    # train + materialized margins + rubric second scan + one-row audit
    "q127_classifier_funnel_audit",
    # one-pass generative trainer: (classes × buckets) model, no rounds —
    # time must scale with the feature frame alone
    "q141_nb_confusion",
    # LM + value-histogram bucketing: the histogram/cuts stages are
    # value-bounded, so growth must track the LM scans only
    "q140_ccnet_ppl_buckets",
    # held-out LM: train-slice model joined onto the val slice — both
    # sides grow with K, the vocab broadcast with Heaps(K)
    "q145_lm_holdout_ppl",
    # r12 governance composite: only its DOCUMENT legs grow with K
    # (datasheet, trend, pivot, top-k, bootstrap); the lineitem/customer
    # legs are fixed — growth must therefore be strongly sublinear, and
    # the output stays (sections × groups)-bounded at every K
    "q149_governance_pack",
    # r14 heavy-plan pack (VERDICT r13 next-round #2 — the x32 rung for
    # the ten heaviest plans; q31/q149 already above):
    # full jobs-DAG drain against a temp warehouse — growth tracks the
    # ingest/curate/summarize/embed legs; the per-batch merge rounds are
    # fixed orchestration cost
    "q128_jobs_dag_resolve",
    # CC min-propagation over the banded pair graph + the fuzzy
    # edit-distance tier (replica-prefixed tokens keep replicas
    # lexically disjoint — candidate volume grows linearly in K)
    "q37_dup_clusters",
    # sketch-vs-exact audit over EVENTS (replicated with user_id offsets
    # from r14 on): HLL/GK state is constant per group, the exact audit
    # baselines grow with rows — the documented at-scale mode drops them
    "q74_sketch_audit",
    # 28 declarative checks + the corr screen: lineitem/customer legs are
    # FIXED (not replicated), so growth tracks the documents/events legs
    # only — expect strongly sublinear cells, dispositioned in the notes
    "q147_expectation_audit",
    # unigram-LM/SentencePiece trainer: fixed EM rounds over a vocab
    # whose size follows Heaps(K); time must track the corpus scans
    "q148_unigram_tokenizer",
    # near-dup graph label propagation: O(log n) rounds over the banded
    # pair set — rounds grow with the DIAMETER (constant per replica,
    # replicas disjoint), state with component count
    "q115_label_propagation",
    # PQ train/encode/recall-audit over EMBEDDINGS (replicated with
    # vec_id offsets from r14 on; replicas value-nudged per-replica from
    # r15 — see _replicate_embeddings — so centroids shift only by the
    # nudge epsilon; encode/audit legs grow linearly either way)
    "q118_pq_ann",
    # streaming heavy-hitter drain + resolve gate: micro-batch count is
    # fixed, per-batch state is (k x partitions)-bounded by Misra-Gries
    "q120_hh_stream_resolve",
    # r15 gate-rung pack (VERDICT r14 next-round #5 — the remaining
    # pipeline/stream gates at x32):
    # hybrid retrieval: BM25 postings join + exact cosine branch + RRF
    # fusion over |Q|*20 candidate rows — both branches grow with the
    # corpus (queries are doc_id % 100, so the panel grows too)
    "q129_hybrid_rrf",
    # keep-first ExactSubstr one-shot: partial-aggregable min-groupBy on
    # the md5 shingle key + one equi-join + sparse interval merge; its
    # STREAM leg is the x133_substring_stream extra below
    "q133_substring_dedup_keepfirst",
    # r15 graft-host pack: the merged forms carry their retired seats'
    # legs, so the hosts need their own cells.
    # containment postings join + the grafted calibration legs (truth
    # postings join, banded candidates, pair-keyed flag join) off ONE
    # persisted shingled frame — every leg is O(postings), none O(n²)
    "q122_shingle_containment",
    # inverted-index Jaccard + the grafted frame-fingerprint postings
    # join (16 frames/doc, df ≤ 64 cap bounds posting lists)
    "q33_ngram_jaccard_pairs",
    # day-partitioned prefix sum + the grafted per-user transition
    # window: one user_id shuffle, |types|²-bounded tally
    "q102_peak_concurrency",
)

#: Non-registry scale cells — callables measured exactly like QUERIES
#: rows (cold, noop-sink where applicable).  x133: the streaming
#: ExactSubstr twin (streaming/incremental.py:substring_dedup_stream) —
#: a FIXED 4-micro-batch drain of the replicated documents dir through
#: the shingle-registry foreachBatch sink into a temp warehouse, so the
#: cell measures per-batch work growing with K (weak scaling of the
#: stream leg), not a batch-count artifact.
EXTRAS = ("x133_substring_stream",)


def run_substring_stream_cell(spark, sf_dir: str) -> float:
    import glob as _glob

    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming import read_parquet_stream, substring_dedup_stream

    doc_path = table_path(sf_dir, "documents")
    wrap = None
    if os.path.isfile(doc_path):
        # base testdata stores the table as ONE file; the file stream
        # source needs a directory — wrap it (warmup path only; the
        # replicated dirs this sweep measures are directories already)
        wrap = tempfile.mkdtemp(prefix="sub_stream_src_")
        os.symlink(doc_path, os.path.join(wrap, "part-0.parquet"))
        doc_path = wrap
    files = _glob.glob(os.path.join(doc_path, "*.parquet"))
    per_trigger = max(1, math.ceil(max(len(files), 1) / 4))
    tmp = tempfile.mkdtemp(prefix="sub_stream_")
    try:
        wh = Warehouse(spark, os.path.join(tmp, "wh"))
        wh.overwrite(
            spark.createDataFrame(
                [],
                "id long, n_tokens long, n_dup_windows long, n_runs long, "
                "n_covered long, max_run_len long, clean_text string",
            ),
            "clean_docs",
        )
        wh.overwrite(
            spark.createDataFrame([], "h string, first_key long"), "sub_registry"
        )
        t0 = time.perf_counter()
        substring_dedup_stream(
            read_parquet_stream(spark, doc_path, max_files_per_trigger=per_trigger),
            wh,
            clean_table="clean_docs",
            registry_table="sub_registry",
            checkpoint=os.path.join(tmp, "ckpt"),
            id_col="doc_id",
            text_col="text",
            min_tokens=8,
        )
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if wrap:
            shutil.rmtree(wrap, ignore_errors=True)


#: doc_id offset per replica — far above any testdata id, far below the
#: q83 okey stride overflow bound (id·1e6 must stay < 2^63)
_REPLICA_STRIDE = 10_000_000


#: tables the sweep replicates K× (everything else is symlinked at ×1):
#: documents with replica-prefixed tokens (lexically disjoint replicas),
#: events with id-offset users/events (distinct-user cardinality grows
#: linearly, per-group row count grows linearly — the q74/q28 scale
#: axes), embeddings with id-offset duplicated vectors (k-means
#: centroids invariant under duplication; encode/top-k legs grow
#: linearly — the q118 scale axis).  r14 addition for the heavy-plan
#: pack; r13's ×1→×8 cells predate events/embeddings replication and
#: are only comparable for documents-family queries.
REPLICATED = ("documents", "events", "embeddings")


def build_replicated_dir(spark, sf_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t not in REPLICATED:
            dst = table_path(out_dir, t)
            if not os.path.exists(dst):
                os.symlink(table_path(sf_dir, t), dst)
    _replicate_events(spark, sf_dir, out_dir, k)
    _replicate_embeddings(spark, sf_dir, out_dir, k)
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(docs)
            continue
        tag = F.lit(f"r{r}")
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * _REPLICA_STRIDE))
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(F.split("text", " "), lambda t: F.concat(tag, t)),
                ),
            )
            .withColumn("n_chars", F.length("text"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    n_parts = max(spark.sparkContext.defaultParallelism, k)
    out.repartition(n_parts).write.mode("overwrite").parquet(
        table_path(out_dir, "documents")
    )


def _replicate_events(spark, sf_dir: str, out_dir: str, k: int) -> None:
    ev = spark.read.parquet(table_path(sf_dir, "events"))
    parts = [ev]
    for r in range(1, k):
        off = F.lit(r * _REPLICA_STRIDE)
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + off).withColumn(
                "user_id", F.col("user_id") + off
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    n_parts = max(spark.sparkContext.defaultParallelism, k)
    out.repartition(n_parts).write.mode("overwrite").parquet(
        table_path(out_dir, "events")
    )


def _replicate_embeddings(spark, sf_dir: str, out_dir: str, k: int) -> None:
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    parts = [emb]
    for r in range(1, k):
        # replicas must be VALUE-distinct, not just id-distinct — the r14
        # q37 lesson (char-disjoint document replicas) applied to vectors.
        # Byte-identical replicas put cos(orig, replica) exactly at 1.0,
        # a trunc4 knife edge where Spark's sequential fold and DuckDB's
        # list_sum differ by an ulp and round to different sides
        # (measured: the K=4 oracle sweep's q41 hash mismatch).  A
        # deterministic per-replica nudge on one rotating dimension keeps
        # every sim strictly inside a bucket; it also stops replica pairs
        # from being trivially easy for the ANN/dedup rungs.
        dim = r % 64
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * _REPLICA_STRIDE))
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x + F.when(i == F.lit(dim), F.lit(float(r) / 128.0))
                        .otherwise(F.lit(0.0))
                        .cast("float")
                    ).cast("float"),
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(table_path(out_dir, "embeddings"))


def run_cold(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _run_isolated(sf_dir: str, ks: list[int]) -> None:
    """--isolate: one SUBPROCESS (own Spark session, own replicated dir)
    per K, exponents fitted over the merged clean cells.

    WHY (r15, measured): a cell that runs after other cells in the same
    session reads inflated — the q129 ×32 cell measured 13.4 s as a
    session's first cell and 30.3 s as its second (identical code and
    data; accumulated heap garbage and session state, not plan cost).
    Multi-K same-session sweeps are fine for ORDER-of-magnitude screens
    (a K² term still shows), but exponents within ~2× of linear need
    per-cell isolation — this mode is that protocol, automated."""
    import subprocess

    merged: dict[str, dict[str, float]] = {}
    failed: list[int] = []
    for k in ks:
        out = tempfile.mktemp(prefix=f"scale_iso_{k}x_", suffix=".json")
        env = dict(os.environ, SPARK_GRAFT_SCALE_OUT=out)
        # crash-proof per the file's own discipline: one child OOMing at
        # the biggest K must not discard the cells already merged — keep
        # what was measured and report the lost rung (r15 review finding)
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, str(k)],
            env=env, stdout=sys.stderr,
        ).returncode
        if rc != 0 or not os.path.exists(out):
            print(f"[isolate] K={k} child failed (rc={rc}); cells kept so far "
                  f"stay in the merged output", file=sys.stderr)
            failed.append(k)
            continue
        with open(out) as fh:
            cells = json.load(fh)["results"]
        os.unlink(out)
        for name, row in cells.items():
            merged.setdefault(name, {}).update(row)
    ks = [k for k in ks if k not in failed]
    if not ks:
        raise SystemExit("[isolate] every child K failed — nothing measured")
    kmin, kmax = min(ks), max(ks)
    for row in merged.values():
        if kmax > kmin and f"t_{kmax}x" in row and f"t_{kmin}x" in row:
            growth = row[f"t_{kmax}x"] / max(row[f"t_{kmin}x"], 1e-9)
            row["x_growth"] = round(growth, 2)
            row["eff"] = round((kmax / kmin) / growth, 2)
            row["exp"] = round(math.log(max(growth, 1e-9)) / math.log(kmax / kmin), 2)
    payload = json.dumps(
        {"sf_dir": sf_dir, "ks": ks, "failed_ks": failed, "isolated": True,
         "results": merged}
    )
    print(payload)
    out = os.environ.get("SPARK_GRAFT_SCALE_OUT")
    if out:
        with open(out, "w") as fh:
            fh.write(payload + "\n")


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--isolate"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    ks = [int(a) for a in argv[1:]] or [1, 8, 64]
    if "--isolate" in sys.argv[1:]:
        _run_isolated(sf_dir, ks)
        return
    # SPARK_GRAFT_SCALE_QUERIES=q141_nb_confusion,q145_lm_holdout_ppl
    # restricts the pack (for measuring late additions without replaying
    # the whole grid); default is every QUERIES entry.
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    queries = tuple(only.split(",")) if only else QUERIES + EXTRAS
    unknown = [q for q in queries if q not in QUERIES + EXTRAS]
    if unknown:
        raise SystemExit(f"not in the recorded pack: {unknown}")
    spark = get_spark("bench_scale")
    registry = load_registry()

    dirs: dict[int, str] = {}
    try:
        for k in ks:
            d = tempfile.mkdtemp(prefix=f"scale_{k}x_")
            build_replicated_dir(spark, sf_dir, d, k)
            dirs[k] = d
        for name in queries:  # plans + codegen warmup off the clock
            if name in EXTRAS:
                run_substring_stream_cell(spark, WARMUP_SF_DIR)
                continue
            registry[name].fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

        results: dict[str, dict[str, float]] = {}
        for name in queries:
            row: dict[str, float] = {}
            for k in ks:
                print(f"# {name} @ {k}x ...", file=sys.stderr, flush=True)
                if name in EXTRAS:
                    row[f"t_{k}x"] = run_substring_stream_cell(spark, dirs[k])
                else:
                    row[f"t_{k}x"] = run_cold(registry[name].fn, spark, dirs[k])
                # crash-proof: a cell that dies later (OOM on a bigger K)
                # must not erase the cells already measured (r14: the
                # first x32 heavy sweep lost 30 min of cells to q118's
                # flat-ADC OOM)
                print(f"# {name} @ {k}x = {row[f't_{k}x']}s", file=sys.stderr, flush=True)
            kmax = max(ks)
            growth = row[f"t_{kmax}x"] / max(row[f"t_{min(ks)}x"], 1e-9)
            row["x_growth"] = round(growth, 2)
            row["eff"] = round((kmax / min(ks)) / growth, 2)
            # growth exponent e with t ~ K^e over the swept span: e < 1
            # sub-linear, e = 1 linear, e > 1 the red flag (VERDICT r13
            # next-round #2 asks for the exponent per heavy plan);
            # undefined for a single-K invocation (span of zero decades)
            if kmax > min(ks):
                row["exp"] = round(
                    math.log(max(growth, 1e-9)) / math.log(kmax / min(ks)), 2
                )
            results[name] = row
        payload = json.dumps({"sf_dir": sf_dir, "ks": ks, "results": results})
        print(payload)
        out = os.environ.get("SPARK_GRAFT_SCALE_OUT")
        if out:  # sidecar copy — stdout also carries JVM gc noise
            with open(out, "w") as fh:
                fh.write(payload + "\n")
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
