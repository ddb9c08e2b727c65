"""X145 incremental near-dup admission registry — pure-Python simulator
equivalence (identical md5 minhash/banding arithmetic) over multi-batch
corpora with cross-batch near-dups, chains, exact dups and shingle-less
docs; crash-replay verdict stability; registry compaction invariance;
the streamed form vs the fold; and checkpoint re-run no-op."""

from __future__ import annotations

import hashlib
import random
import re

from briefly_spark.operators.dedup import (
    neardup_incremental,
    neardup_registry_compact,
)

N, K, BANDS, MIN_AGREE = 3, 8, 4, 6


# -- the independent reference: same arithmetic, no Spark --------------------
def _shingles(text: str) -> list[str]:
    words = re.split(r"\s+", text)
    return list(
        dict.fromkeys(
            " ".join(words[i : i + N]) for i in range(len(words) - N + 1)
        )
    )


def _sig(sh: list[str]) -> list[str]:
    hh = [hashlib.md5(s.encode()).hexdigest() for s in sh]
    return [min(h[4 * i : 4 * i + 4] for h in hh) for i in range(K)]


def _bkeys(sg: list[str]) -> list[str]:
    rows = K // BANDS
    return [
        hashlib.md5("|".join(sg[b * rows + r] for r in range(rows)).encode()).hexdigest()
        for b in range(BANDS)
    ]


def _simulate(batches):
    """Arrival-order admission with min-dominates batch semantics —
    the operator's documented contract, derived independently."""
    hist_bands: dict[tuple[int, str], set[int]] = {}
    hist_sigs: dict[int, list[str]] = {}
    clean: list[int] = []
    rejects: dict[int, tuple[int, str]] = {}
    for batch in batches:
        info = {}
        for i, t in batch:
            sh = _shingles(t)
            if sh:
                sg = _sig(sh)
                info[i] = (sg, _bkeys(sg))
        for i, _t in sorted(batch):
            cands = []
            if i in info:
                sg, keys = info[i]
                hit = set()
                for b, key in enumerate(keys):
                    hit |= hist_bands.get((b, key), set())
                for o in sorted(hit):
                    if o != i and sum(x == y for x, y in zip(sg, hist_sigs[o])) >= MIN_AGREE:
                        cands.append((o, "history"))
                for j, _tj in batch:
                    if j < i and j in info:
                        sgj, keysj = info[j]
                        if any(a == b2 for a, b2 in zip(keysj, keys)) and (
                            sum(x == y for x, y in zip(sg, sgj)) >= MIN_AGREE
                        ):
                            cands.append((j, "batch"))
            if cands:
                rejects[i] = min(cands)
            else:
                clean.append(i)
                if i in info:
                    sg, keys = info[i]
                    hist_sigs[i] = sg
                    for b, key in enumerate(keys):
                        hist_bands.setdefault((b, key), set()).add(i)
    return sorted(clean), rejects


def _corpus():
    """Three batches with exact dups, near-dups (1-word mutations),
    cross-batch dups, a chain (C ~ B ~ A), and shingle-less shorts."""
    random.seed(13)
    vocab = [f"w{j}" for j in range(30)]
    base = [" ".join(random.choice(vocab) for _ in range(12)) for _ in range(8)]

    def mutate(t, pos):
        w = t.split()
        w[pos] = "MUT" + str(pos)
        return " ".join(w)

    b0 = [(0, base[0]), (1, base[1]), (2, base[0]), (3, "tiny doc"), (4, base[2])]
    b1 = [
        (10, mutate(base[0], 5)),       # near-dup of history 0
        (11, base[3]),
        (12, mutate(base[3], 2)),       # near-dup of 11 (same batch, min-dominates)
        (13, base[4]),
        (14, ""),                        # shingle-less
    ]
    b2 = [
        (20, mutate(mutate(base[3], 2), 7)),  # chain: close to 12 (rejected), maybe not to 11
        (21, base[5]),
        (22, base[4]),                   # exact dup of history 13
        (23, mutate(base[5], 0)),        # near-dup of 21 (same batch)
    ]
    return [b0, b1, b2]


def _run_batches(spark, batches, wh_dir):
    """Fold batches through neardup_incremental with in-memory registries."""
    band_reg = spark.createDataFrame([], "batch_id long, band int, key string, id long")
    sig_reg = spark.createDataFrame([], "batch_id long, id long, sig array<string>")
    admitted_ids: list[int] = []
    verdicts: dict[int, tuple[int, str]] = {}
    for bi, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "id long, text string")
        adm, bd, sd, rej = neardup_incremental(
            df, band_reg, sig_reg, id_col="id", text_col="text",
            batch_id=bi, n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
        )
        admitted_ids += [r["id"] for r in adm.select("id").collect()]
        verdicts.update(
            {r["id"]: (r["dup_of"], r["source"]) for r in rej.collect()}
        )
        band_reg = band_reg.unionByName(bd).localCheckpoint(eager=True)
        sig_reg = sig_reg.unionByName(sd).localCheckpoint(eager=True)
    return sorted(admitted_ids), verdicts, band_reg, sig_reg


def test_matches_pure_python_simulator(spark):
    batches = _corpus()
    got_clean, got_rej, _, _ = _run_batches(spark, batches, None)
    want_clean, want_rej = _simulate(batches)
    assert got_clean == want_clean
    assert got_rej == want_rej
    # the corpus actually exercises every reject source and the admit path
    assert {s for _, s in got_rej.values()} == {"history", "batch"}
    assert 14 in got_clean  # shingle-less admitted
    assert got_rej[22] == (13, "history")  # cross-batch exact dup


def test_persist_materialization_matches_local_checkpoint(spark):
    """ADVICE r14: the materialization boundary is configurable —
    'persist' (MEMORY_AND_DISK, lineage KEPT, executor-loss recomputes)
    must produce byte-identical verdicts to the 'local_checkpoint'
    default (non-replicated blocks, executor-loss fails the job)."""
    import pytest

    batches = _corpus()
    band_reg = spark.createDataFrame([], "batch_id long, band int, key string, id long")
    sig_reg = spark.createDataFrame([], "batch_id long, id long, sig array<string>")
    df = spark.createDataFrame(batches[0], "id long, text string")
    outs = {}
    for mode in ("local_checkpoint", "persist"):
        handles: list = []
        adm, bd, sd, rej = neardup_incremental(
            df, band_reg, sig_reg, id_col="id", text_col="text",
            batch_id=0, n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
            materialize=mode, persisted_out=handles,
        )
        outs[mode] = (
            sorted(r["id"] for r in adm.collect()),
            sorted(map(tuple, rej.collect())),
            sorted(map(tuple, bd.collect())),
            sorted(map(tuple, sd.collect())),
        )
        # cache-release contract (review r14: an EXPLICIT out-param, not
        # an attribute a re-bind would silently drop): persist mode hands
        # back its persisted internals for the caller to release; the
        # default mode has nothing to release
        if mode == "persist":
            assert len(handles) == 3  # signed, banded, rejects
            assert all(h.storageLevel.useMemory for h in handles)
            for h in handles:
                h.unpersist()
            assert not any(h.storageLevel.useMemory for h in handles)
        else:
            assert handles == []
    assert outs["persist"] == outs["local_checkpoint"]
    with pytest.raises(ValueError, match="materialize"):
        neardup_incremental(
            df, band_reg, sig_reg, id_col="id", text_col="text",
            batch_id=0, materialize="checkpointish",
        )


def test_crash_replay_verdicts_are_stable(spark):
    """Replaying a batch AFTER its registry block landed (the foreachBatch
    at-least-once window) must reproduce byte-identical verdicts."""
    batches = _corpus()
    _, _, band_reg, sig_reg = _run_batches(spark, batches[:2], None)
    df = spark.createDataFrame(batches[1], "id long, text string")
    # batch 1's block is ALREADY in the registries (crash after merge):
    adm2, _, _, rej2 = neardup_incremental(
        df, band_reg, sig_reg, id_col="id", text_col="text",
        batch_id=1, n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
    )
    # recompute the original (pre-merge) verdicts for comparison
    band_pre = band_reg.filter("batch_id = 0")
    sig_pre = sig_reg.filter("batch_id = 0")
    adm1, _, _, rej1 = neardup_incremental(
        df, band_pre, sig_pre, id_col="id", text_col="text",
        batch_id=1, n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
    )
    assert sorted(map(tuple, rej2.collect())) == sorted(map(tuple, rej1.collect()))
    assert sorted(r["id"] for r in adm2.collect()) == sorted(
        r["id"] for r in adm1.collect()
    )


def test_compaction_preserves_admission(spark):
    """Compacted registries admit a later batch identically."""
    batches = _corpus()
    _, _, band_reg, sig_reg = _run_batches(spark, batches[:2], None)
    cb, cs = neardup_registry_compact(band_reg, sig_reg)
    assert {r["batch_id"] for r in cb.select("batch_id").distinct().collect()} == {-1}
    df = spark.createDataFrame(batches[2], "id long, text string")
    out_full = neardup_incremental(
        df, band_reg, sig_reg, id_col="id", text_col="text", batch_id=2,
        n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
    )
    out_comp = neardup_incremental(
        df, cb, cs, id_col="id", text_col="text", batch_id=2,
        n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
    )
    for a, c in zip(out_full[:1] + out_full[3:], out_comp[:1] + out_comp[3:]):
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))


def test_stream_matches_fold_and_rerun_is_noop(spark, tmp_path):
    import time

    from briefly_spark.storage import Warehouse
    from briefly_spark.streaming import neardup_stream
    from briefly_spark.streaming.incremental import read_parquet_stream

    batches = _corpus()
    src = tmp_path / "nd_batches"
    src.mkdir()
    for j, batch in enumerate(batches):
        spark.createDataFrame(batch, "id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{j}"))
        time.sleep(1.1)  # file source orders micro-batches by mod time
    wh = Warehouse(spark, str(tmp_path / "wh_nd"))
    # NO pre-seeded tables (ADVICE r12 #4): first use must read the absent
    # registries as empty frames and create every table on first merge
    ckpt = str(tmp_path / "nd_ckpt")
    run = lambda: neardup_stream(  # noqa: E731
        read_parquet_stream(spark, str(src) + "/*/", max_files_per_trigger=1),
        wh, clean_table="clean", band_table="bands", sig_table="sigs",
        rejects_table="rejects", checkpoint=ckpt, id_col="id", text_col="text",
        n=N, k=K, bands=BANDS, min_agree=MIN_AGREE,
    )
    run()
    want_clean, want_rej = _simulate(batches)
    assert sorted(r["id"] for r in wh.read("clean").collect()) == want_clean
    assert {
        r["id"]: (r["dup_of"], r["source"]) for r in wh.read("rejects").collect()
    } == want_rej
    state = {
        t: sorted(map(str, wh.read(t).collect()))
        for t in ("clean", "bands", "sigs", "rejects")
    }
    run()  # nothing new
    assert {
        t: sorted(map(str, wh.read(t).collect()))
        for t in ("clean", "bands", "sigs", "rejects")
    } == state


def test_rejects_k_beyond_md5_slice_budget(spark):
    """k > 8 would slice past the 32-hex md5 digest (empty-string tail
    components inflate agreement and collapse band keys) — refused."""
    import pytest

    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    empty_b = spark.createDataFrame([], "batch_id long, band int, key string, id long")
    empty_s = spark.createDataFrame([], "batch_id long, id long, sig array<string>")
    with pytest.raises(ValueError, match="k <= 8"):
        neardup_incremental(
            df, empty_b, empty_s, id_col="id", text_col="text",
            batch_id=0, k=16, bands=4, min_agree=12,
        )


def test_rejects_persist_without_out_param(spark):
    """ADVICE r15 pin: materialize='persist' with persisted_out=None would
    silently discard the persisted handles — a guaranteed cache leak per
    call on a long drain.  The pairing is refused, not documented."""
    import pytest

    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    empty_b = spark.createDataFrame([], "batch_id long, band int, key string, id long")
    empty_s = spark.createDataFrame([], "batch_id long, id long, sig array<string>")
    with pytest.raises(ValueError, match="persisted_out"):
        neardup_incremental(
            df, empty_b, empty_s, id_col="id", text_col="text",
            batch_id=0, materialize="persist",
        )
