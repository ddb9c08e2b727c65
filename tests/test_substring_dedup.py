"""q131 any-length exact substring dedup (Lee et al. 2022 ExactSubstr):
the shingle-coverage plan must equal an INDEPENDENT brute-force oracle
that literally enumerates repeated substrings of length >= L — proving
the covered-by-dup-L-window ⇔ inside-a-repeated-substring equivalence the
operator's docstring claims, not just re-running the same algorithm."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.operators.curation import substring_coverage


def _brute_coverage(corpus: dict[int, list[str]], L: int) -> dict[int, set[int]]:
    """Token positions inside ANY substring of length >= L that occurs at
    least twice in the corpus (distinct (doc, start) occurrences; within-
    doc repeats count).  Direct definition — O(everything), tiny inputs."""
    covered: dict[int, set[int]] = {i: set() for i in corpus}
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for d, toks in corpus.items():
        for i in range(len(toks)):
            for j in range(i + L, len(toks) + 1):
                occ.setdefault(tuple(toks[i:j]), []).append((d, i))
    for sub, places in occ.items():
        if len(places) >= 2:
            for d, i in places:
                covered[d].update(range(i, i + len(sub)))
    return covered


def _runs(pos: set[int]) -> int:
    return sum(1 for p in pos if p - 1 not in pos)


def _max_run(pos: set[int]) -> int:
    best = 0
    for p in pos:
        if p - 1 not in pos:  # run start
            q = p
            while q + 1 in pos:
                q += 1
            best = max(best, q - p + 1)
    return best


CORPORA = {
    # exactly-L shared substring across docs; L-1 share must NOT trigger
    "cross_doc": {
        1: "a b c d e f g h x y z".split(),
        2: "q r a b c d e f g h s".split(),
        3: "b c d e f g h unique1 unique2 unique3 unique4".split(),  # only 7 shared
    },
    # repeat WITHIN one doc (self-repetition counts, per the paper)
    "within_doc": {
        1: "p q r s t u v w k p q r s t u v w".split(),
        2: "totally different tokens here one two three four five".split(),
    },
    # two overlapping repeated regions must merge into one run
    "merge_runs": {
        1: "a b c d e f g h i j k l m n o p".split(),
        2: "a b c d e f g h Z Z Z Z Z Z Z Z".split(),
        3: "Y Y Y Y e f g h i j k l m n o p".split(),
    },
    # doc shorter than L: no windows, nothing covered
    "short_doc": {1: "a b c".split(), 2: "a b c".split()},
}


def test_substring_coverage_matches_brute_force(spark):
    L = 8
    for name, corpus in CORPORA.items():
        docs = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in corpus.items()],
            schema="doc_id LONG, text STRING",
        )
        got = {
            int(r["id"]): r
            for r in substring_coverage(
                docs, id_col="doc_id", text_col="text", min_tokens=L
            ).collect()
        }
        want = _brute_coverage(corpus, L)
        assert set(got) == set(corpus), name
        for d, toks in corpus.items():
            cov = want[d]
            r = got[d]
            assert r["n_tokens"] == len(toks), (name, d)
            assert r["n_covered"] == len(cov), (name, d)
            assert r["n_runs"] == _runs(cov), (name, d)
            assert r["max_run_len"] == _max_run(cov), (name, d)
            clean = " ".join(w for i, w in enumerate(toks) if i not in cov)
            assert r["clean_text"] == clean, (name, d)


def test_random_corpora_match_brute_force(spark):
    """Seeded random corpora with PLANTED duplications (copied slices of
    random length 4–20 spliced at random offsets, cross- and within-doc)
    — the adversarial shapes the handcrafted cases can't enumerate."""
    import random

    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        corpus: dict[int, list[str]] = {
            d: [rng.choice(vocab) for _ in range(rng.randint(1, 60))]
            for d in range(1, 7)
        }
        for _ in range(4):  # plant copies
            src = corpus[rng.randint(1, 6)]
            if len(src) < 4:
                continue
            i = rng.randrange(len(src) - 3)
            j = min(len(src), i + rng.randint(4, 20))
            dst = corpus[rng.randint(1, 6)]
            at = rng.randint(0, len(dst))
            dst[at:at] = src[i:j]
        docs = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in corpus.items()],
            schema="doc_id LONG, text STRING",
        )
        got = {
            int(r["id"]): r
            for r in substring_coverage(
                docs, id_col="doc_id", text_col="text", min_tokens=8
            ).collect()
        }
        want = _brute_coverage(corpus, 8)
        for d, toks in corpus.items():
            cov, r = want[d], got[d]
            assert r["n_covered"] == len(cov), (seed, d)
            assert r["n_runs"] == _runs(cov), (seed, d)
            assert r["max_run_len"] == _max_run(cov), (seed, d)
            clean = " ".join(w for i, w in enumerate(toks) if i not in cov)
            assert r["clean_text"] == clean, (seed, d)


def _kf_brute(corpus: dict[int, list[str]], L: int) -> dict[int, set[int]]:
    """Keep-first covered positions: occurrence (d, p) of an L-shingle is
    cut iff the same shingle occurs at a smaller (doc, position) key."""
    first: dict[tuple[str, ...], int] = {}
    for d in sorted(corpus):
        toks = corpus[d]
        for p in range(len(toks) - L + 1):
            key = d * 1_000_000 + p
            sh = tuple(toks[p : p + L])
            first.setdefault(sh, key)
    covered: dict[int, set[int]] = {i: set() for i in corpus}
    for d, toks in corpus.items():
        for p in range(len(toks) - L + 1):
            sh = tuple(toks[p : p + L])
            if d * 1_000_000 + p > first[sh]:
                covered[d].update(range(p, p + L))
    return covered


def test_keepfirst_matches_brute_force(spark):
    from briefly_spark.operators.curation import substring_dedup_keepfirst

    for name, corpus in CORPORA.items():
        docs = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in corpus.items()],
            schema="doc_id LONG, text STRING",
        )
        got = {
            int(r["id"]): r
            for r in substring_dedup_keepfirst(
                docs, id_col="doc_id", text_col="text", min_tokens=8
            ).collect()
        }
        want = _kf_brute(corpus, 8)
        for d, toks in corpus.items():
            cov, r = want[d], got[d]
            assert r["n_covered"] == len(cov), (name, d)
            assert r["n_runs"] == _runs(cov), (name, d)
            assert r["max_run_len"] == _max_run(cov), (name, d)
            clean = " ".join(w for i, w in enumerate(toks) if i not in cov)
            assert r["clean_text"] == clean, (name, d)
        # keep-first cuts a subset of remove-all's coverage
        ra = _brute_coverage(corpus, 8)
        assert all(want[d] <= ra[d] for d in corpus), name


def test_incremental_equals_oneshot_and_replays(spark):
    """Monotone batches folded through substring_dedup_incremental must
    reproduce the one-shot keep-first output exactly, and replaying a
    batch whose delta was already merged is byte-identical (own-claim
    recognition) — the span_dedup_incremental contract, for shingles."""
    from briefly_spark.operators.curation import (
        substring_dedup_incremental,
        substring_dedup_keepfirst,
    )

    corpus = {**CORPORA["merge_runs"], **{10 + k: v for k, v in CORPORA["within_doc"].items()}}
    full = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()],
        schema="doc_id LONG, text STRING",
    )
    want = {
        int(r["id"]): tuple(r)
        for r in substring_dedup_keepfirst(
            docs=full, id_col="doc_id", text_col="text", min_tokens=8
        ).collect()
    }
    registry = spark.createDataFrame([], "h string, first_key long")
    got: dict[int, tuple] = {}
    batches = [[1, 2], [3, 11], [12]]
    for ids in batches:
        batch = full.filter(F.col("doc_id").isin(ids))
        clean, delta = substring_dedup_incremental(
            batch, registry, id_col="doc_id", text_col="text", min_tokens=8
        )
        rows = clean.collect()
        got.update({int(r["id"]): tuple(r) for r in rows})
        # replay the SAME batch with its claims already merged: identical
        merged = registry.unionByName(delta).groupBy("h").agg(
            F.min("first_key").alias("first_key")
        )
        merged = spark.createDataFrame(merged.collect(), schema=merged.schema)
        replay, _ = substring_dedup_incremental(
            batch, merged, id_col="doc_id", text_col="text", min_tokens=8
        )
        assert sorted(tuple(r) for r in replay.collect()) == sorted(
            tuple(r) for r in rows
        )
        registry = merged
    assert got == want


def test_registry_compact_is_trim_equivalent(spark):
    """claims_registry_compact (VERDICT r09 next-round #6): an inflated
    append-only registry — per-batch delta blocks unioned WITHOUT the
    keyed merge, including a replayed batch's duplicate block — compacts
    to exactly the keyed-merged registry, and trimming the next batch
    against the compacted registry is byte-identical to trimming against
    the clean one (which itself equals the one-shot keep-first — the
    existing incremental pin).  Compaction is also idempotent."""
    from briefly_spark.operators.curation import (
        claims_registry_compact,
        substring_dedup_incremental,
    )

    corpus = {**CORPORA["merge_runs"], **{10 + k: v for k, v in CORPORA["within_doc"].items()}}
    full = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()],
        schema="doc_id LONG, text STRING",
    )
    clean_reg = spark.createDataFrame([], "h string, first_key long")
    blocks = []  # append-only deployment: raw delta blocks, never merged
    batches = [[1, 2], [3, 11]]
    for ids in batches:
        batch = full.filter(F.col("doc_id").isin(ids))
        _, delta = substring_dedup_incremental(
            batch, clean_reg, id_col="doc_id", text_col="text", min_tokens=8
        )
        delta = spark.createDataFrame(delta.collect(), schema=delta.schema)
        blocks.append(delta)
        merged = clean_reg.unionByName(delta).groupBy("h").agg(
            F.min("first_key").alias("first_key")
        )
        clean_reg = spark.createDataFrame(merged.collect(), schema=merged.schema)
    # inflate: all blocks appended, batch 2's block delivered twice (replay)
    inflated = blocks[0]
    for b in blocks[1:] + [blocks[1]]:
        inflated = inflated.unionByName(b)
    assert inflated.count() > clean_reg.count()  # duplicates really exist
    compact = claims_registry_compact(inflated)
    assert sorted(map(tuple, compact.collect())) == sorted(
        map(tuple, clean_reg.collect())
    )
    # idempotent
    assert sorted(map(tuple, claims_registry_compact(compact).collect())) == sorted(
        map(tuple, compact.collect())
    )
    # trim equivalence on the NEXT batch
    nxt = full.filter(F.col("doc_id").isin([12]))
    want, _ = substring_dedup_incremental(
        nxt, clean_reg, id_col="doc_id", text_col="text", min_tokens=8
    )
    got, _ = substring_dedup_incremental(
        nxt, compact, id_col="doc_id", text_col="text", min_tokens=8
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_merge_runs_is_one_run(spark):
    """The merge_runs corpus's doc 1 shares its first 8 tokens with doc 2
    and its last 12 with doc 3; the two covered intervals overlap and must
    report as ONE maximal repeated region covering the entire doc."""
    corpus = CORPORA["merge_runs"]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()],
        schema="doc_id LONG, text STRING",
    )
    out = {
        int(r["id"]): r
        for r in substring_coverage(
            docs, id_col="doc_id", text_col="text", min_tokens=8
        ).collect()
    }
    assert out[1]["n_runs"] == 1
    assert out[1]["n_covered"] == 16
    assert out[1]["clean_text"] == ""


def test_decontaminate_incremental_equals_oneshot_and_monotone(spark):
    """Folding train batches through contamination_registry_delta then
    decontaminating must equal the one-shot report against the unioned
    train corpus; the per-doc covered count is MONOTONE in the registry;
    re-merging a batch's delta is a no-op (set-union idempotence)."""
    from briefly_spark.operators.curation import (
        contamination_registry_delta,
        decontaminate_incremental,
    )

    train = {**CORPORA["merge_runs"], **{10 + k: v for k, v in CORPORA["within_doc"].items()}}
    # eval docs: one sharing a run with train doc 1, one clean, one empty-ish
    eval_docs = {
        100: train[1][:12] + ["uniqueevaltoken%d" % i for i in range(6)],
        101: ["cleanevaltoken%d" % i for i in range(20)],
        102: ["tiny"],
    }
    train_df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in train.items()], schema="doc_id LONG, text STRING"
    )
    eval_df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in eval_docs.items()], schema="doc_id LONG, text STRING"
    )

    full_reg = contamination_registry_delta(
        train_df, id_col="doc_id", text_col="text", min_tokens=8
    )
    want = {
        int(r["id"]): tuple(r)
        for r in decontaminate_incremental(
            eval_df, full_reg, id_col="doc_id", text_col="text", min_tokens=8
        ).collect()
    }

    registry = spark.createDataFrame([], "h string")
    prev_covered = {d: 0 for d in eval_docs}
    for ids in ([1, 2], [3, 11], [12]):
        batch = train_df.filter(F.col("doc_id").isin(ids))
        delta = contamination_registry_delta(
            batch, id_col="doc_id", text_col="text", min_tokens=8
        )
        merged = registry.unionByName(delta).distinct()
        # replay idempotence: merging the same delta again changes nothing
        assert merged.unionByName(delta).distinct().count() == merged.count()
        registry = spark.createDataFrame(merged.collect(), schema=merged.schema)
        rep = decontaminate_incremental(
            eval_df, registry, id_col="doc_id", text_col="text", min_tokens=8
        )
        for r in rep.collect():
            cov = r["n_covered"] or 0
            assert cov >= prev_covered[int(r["id"])]  # monotone
            prev_covered[int(r["id"])] = cov

    got = {
        int(r["id"]): tuple(r)
        for r in decontaminate_incremental(
            eval_df, registry, id_col="doc_id", text_col="text", min_tokens=8
        ).collect()
    }
    assert got == want
    assert (prev_covered[100] > 0) and prev_covered[101] == 0 and prev_covered[102] == 0


def test_bucketed_registry_probe_is_exchange_free_on_registry_side(spark, tmp_path):
    """K6 applied to X101's continuous-ingest hot path: with the shingle
    registry stored hash-bucketed on ``h`` (the claim key), the per-batch
    probe join reads the registry WITHOUT an exchange — the registry,
    which grows with the corpus, never re-shuffles; only the bounded
    batch side does.  Functional parity with the plain-path registry is
    asserted on the same probe."""
    import pyspark.sql.functions as SF

    from briefly_spark.storage import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh_breg"))
    reg = spark.range(4000).select(
        SF.md5(SF.col("id").cast("string")).alias("h"),
        (SF.col("id") * 7).alias("first_key"),
    )
    wh.write_bucketed(reg, "sub_registry_b", ["h"], buckets=8)
    bucketed = wh.read_catalog("sub_registry_b")
    batch = spark.range(100, 220).select(
        SF.md5(SF.col("id").cast("string")).alias("h"),
        (SF.col("id") * 1000).alias("bkey"),
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force the SMJ path: at real scale neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        probed = batch.join(
            bucketed.select("h", SF.col("first_key").alias("reg_key")), "h", "left"
        )
        rows = probed.collect()
        plan = probed._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        shuffles = [
            l for l in final.splitlines()
            if "Exchange" in l and "BroadcastExchange" not in l
        ]
        assert len(shuffles) == 1, final   # batch side only
        assert "Bucketed: true" in final, final  # registry scan kept its layout
        # parity with the plain (unbucketed) registry
        want = {
            tuple(r)
            for r in batch.join(
                reg.select("h", SF.col("first_key").alias("reg_key")), "h", "left"
            ).collect()
        }
        assert {tuple(r) for r in rows} == want and len(want) == 120
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS sub_registry_b")
