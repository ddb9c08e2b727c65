"""Corpus-curation operators beyond near-dup detection: exact duplicate-span
removal, importance-resampling weights, and semantic (embedding-cluster)
dedup — the three remaining stages of a large-scale LLM training-data
pipeline that :mod:`operators.dedup` (candidate generation) and
:mod:`operators.textstats` (quality rules) do not cover.

- :func:`span_dedup` — keep-first exact duplicate-span removal, the
  fixed-window approximation of suffix-array exact-substring dedup
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better").  Unlike :func:`operators.textstats.remove_boilerplate_lines`
  (which removes *every* copy of corpus-frequent lines), this keeps exactly
  ONE occurrence of each repeated span and trims the rest.
- :func:`dsir_log_weights` — hashed-n-gram importance weights
  (Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling"): per-document log-likelihood ratio between a target
  distribution and the raw corpus distribution over hashed bigram features.
  Every score is fixed-point integer arithmetic on top of the
  bit-reproducible :func:`numerics.det_ln_sql`, so weights hash-match any
  IEEE engine.
- :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023): coarse-cluster the
  embedding space, then drop all but one member of every intra-cluster
  group whose pairwise cosine exceeds a threshold.  Clustering bounds the
  quadratic verify step to within-cell pairs (the same cost argument as
  IVF ANN, operators/similarity.py:238).
- :func:`span_dedup_incremental` — the ingestion form of span dedup: new
  batches trim against a persisted span registry (one equi-join, no corpus
  re-scan), with replay-safe own-claim recognition; streaming twin in
  :func:`streaming.incremental.span_dedup_stream`.

Scale notes: every shuffle here is an equi-join or partial-aggregable
groupBy on a bounded or hashed key — span keys (hot boilerplate spans are
min-aggregated map-side, never windowed), B hashed feature buckets
(feature table is broadcast-sized by construction regardless of corpus
size), and cell ids (cell population bounds the pair join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from briefly_spark.functions.vectors import dot, l2_norm
from briefly_spark.numerics import RATIO_SCALE, det_ln_items
from briefly_spark.operators.textstats import _hash16

#: widx stride for the (doc, window) -> single orderable bigint encoding;
#: bounded because a window index counts W-token windows within one doc.
_WIDX_STRIDE = 1_000_000


# ---------------------------------------------------------------------------
# exact duplicate-span removal (keep-first)
# ---------------------------------------------------------------------------
def span_array(words: Column, span_tokens: int = 8) -> Column:
    """Non-overlapping ``span_tokens``-token windows of a token-ARRAY
    column as an array of strings (last window may be shorter).

    Takes the materialized token array, not the text: ``words`` is
    referenced once per window inside the lambda, and interpreted lambdas
    have no CSE — passing the raw ``split`` expression would re-tokenize
    the document once per window (the :func:`operators.dedup.word_ngrams`
    caveat, O(tokens²))."""
    n_wins = F.ceil(F.size(words) / F.lit(span_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_wins - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * span_tokens + 1, span_tokens)
        ),
    )


def span_dedup(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
) -> DataFrame:
    """Keep-first exact duplicate-span removal over the whole corpus.

    Every distinct span text survives exactly once — at its earliest
    occurrence by ``(id, window index)`` — and is trimmed from every later
    occurrence; documents reassemble from their surviving spans in original
    order.  Documents whose every span was seen earlier (exact duplicates
    of earlier content) are dropped entirely, which is precisely the
    exact-dedup behavior as a degenerate case.  ``id_col`` must be numeric
    (the first-occurrence key is the bigint ``id·1e6 + widx``).

    Returns ``(id, n_spans, n_kept, clean_text)``.

    Scale shape: span-ize is map-only; first-occurrence is a partial-
    aggregable ``min`` groupBy on the span text (a boilerplate span in
    every document combines map-side — no hot window partition, the q48
    hazard); the keep decision is a self-equi-join on the span key which
    AQE skew-splits if one span dominates; reassembly is one groupBy on
    doc id with in-aggregate struct sort."""
    spans = _exploded_spans(docs, id_col, text_col, span_tokens)
    firsts = spans.groupBy("span").agg(F.min("okey").alias("first_key"))
    kept = (
        spans.join(firsts, "span")
        .filter(F.col("okey") == F.col("first_key"))
        .select("id", "widx", "span", "n_spans")
    )
    return _reassemble(kept)


def _exploded_spans(
    docs: DataFrame, id_col: str, text_col: str, span_tokens: int
) -> DataFrame:
    # Two staged projections so split and span-ize each run ONCE per row:
    # the token array materializes first (lambda references an attribute),
    # then the span array materializes before being both sized and exploded.
    staged = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("toks")
    ).select("id", span_array(F.col("toks"), span_tokens).alias("spans"))
    return staged.select(
        "id",
        F.size("spans").alias("n_spans"),
        F.posexplode("spans").alias("widx", "span"),
    ).withColumn("okey", F.col("id") * _WIDX_STRIDE + F.col("widx"))


def _reassemble(kept: DataFrame) -> DataFrame:
    return kept.groupBy("id").agg(
        F.min("n_spans").alias("n_spans"),
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("clean_text"),
    )


def span_dedup_incremental(
    new_docs: DataFrame,
    registry: DataFrame,
    *,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Incremental keep-first span dedup against a persisted span registry
    — the 100 TB ingestion shape: a new batch must be trimmed against
    everything already accepted WITHOUT re-scanning the corpus.

    ``registry`` holds the already-claimed spans as ``(span, first_key)``
    rows — at scale a Warehouse table keyed on span, so the lookup is one
    equi-join against a bucketed layout.  Returns ``(clean,
    registry_delta)``:

    - ``clean`` — :func:`span_dedup` output shape for the batch, with
      spans claimed by earlier batches (registry) AND spans claimed
      earlier within this batch both trimmed;
    - ``registry_delta`` — ``(span, first_key)`` for every span this batch
      claims; merge it into the registry before the next batch
      (``Warehouse.merge_upsert`` on span).

    The claim probe honors OWN claims: a span already in the registry is
    still claimable when its recorded ``first_key`` belongs to this batch.
    That makes a batch REPLAY idempotent — re-running a batch whose delta
    was already merged (the streaming foreachBatch crash-replay window)
    reproduces byte-identical output instead of seeing its own spans as
    foreign and trimming everything.

    Equivalence contract (pinned in tests): when batch ids are monotone —
    every id in batch *k* precedes every id in batch *k+1* — sequentially
    folding batches through this function produces EXACTLY the per-doc
    output of the one-shot :func:`span_dedup` over the union.

    Scale shape: batch-local first-occurrence is the same partial-agg
    min-groupBy; the registry probe is an equi-join driven by the (small)
    batch side; the registry is only ever appended to."""
    spans = _exploded_spans(new_docs, id_col, text_col, span_tokens)
    batch_firsts = spans.groupBy("span").agg(F.min("okey").alias("first_key"))
    probed = batch_firsts.join(
        registry.select("span", F.col("first_key").alias("reg_key")),
        "span",
        "left",
    )
    claims = probed.filter(
        F.col("reg_key").isNull() | (F.col("reg_key") == F.col("first_key"))
    ).select("span", "first_key")
    kept = (
        spans.join(claims, "span")
        .filter(F.col("okey") == F.col("first_key"))
        .select("id", "widx", "span", "n_spans")
    )
    return _reassemble(kept), claims


# ---------------------------------------------------------------------------
# any-length exact duplicate-substring coverage (Lee et al. 2022 ExactSubstr)
# ---------------------------------------------------------------------------
def substring_coverage(
    docs: DataFrame, *, id_col: str, text_col: str, min_tokens: int = 8
) -> DataFrame:
    """ANY-length exact duplicate-substring detection (Lee et al. 2022's
    suffix-array ExactSubstr pass; VERDICT r08 next-round #5) as a pure
    DataFrame plan — no suffix array, no Python loop.

    Equivalence (why no suffix array is needed): a token position is
    inside some corpus-repeated substring of length >= L  ⇔  it is
    covered by at least one repeated OVERLAPPING L-token window.  (⇐: a
    repeated L-window IS a repeated substring of length L.  ⇒: every
    L-window of a repeated substring of length M >= L repeats wherever
    the substring does.)  So the REMOVAL set of the suffix-array method —
    the union of all repeated-substring spans — is computed exactly by:
    hash every overlapping L-shingle, keep shingles with corpus-wide
    occurrence count >= 2 (within-doc repeats count, as in the paper),
    and merge each doc's covered intervals [p, p+L-1].  What the
    fixed-window :func:`span_dedup` approximates, this computes exactly;
    unlike keep-first span dedup it removes EVERY occurrence (the
    paper's ExactSubstrDedup cuts all copies; keep-one is a documented
    variant there too).

    Returns one row per input doc: ``(id, n_tokens, n_dup_windows,
    n_runs, n_covered, max_run_len, clean_text)`` — ``n_runs`` the number
    of maximal repeated substrings (merged intervals), ``n_covered`` the
    tokens they span, ``max_run_len`` the longest repeated substring in
    tokens (the contamination-triage signal: a 500-token max run is a
    wholesale copy, an 8-token one is a boilerplate phrase), and
    ``clean_text`` the surviving tokens in original order.

    Scale shape: shingle-ize is map-only (md5 of each window — 32-char
    keys, the heavy window text never shuffles); the duplicate test is
    ONE partial-aggregable count groupBy on the hash (hot boilerplate
    shingles combine map-side — no hot window partition); the interval
    merge is a per-doc running-max window over DUP STARTS ONLY (sparse —
    bounded by doc length, partitioned by id); the rebuild is the q83
    reassembly groupBy.  Nothing quadratic, nothing driver-side."""
    L = min_tokens
    toks, staged, sh = _substring_windows(docs, id_col, text_col, L)
    dup = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    ds = sh.join(dup, "h", "leftsemi").select("id", "p")  # dup window starts
    return _coverage_from_starts(toks, staged, ds, L)


def _substring_windows(docs: DataFrame, id_col: str, text_col: str, L: int):
    """(toks, staged, sh): token arrays, staged window starts, and the
    exploded (id, p, h) overlapping-L-shingle frame (md5 keys — the
    window text itself never leaves the projection)."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("t")
    )
    # staged projections (no CSE in interpreted lambdas — span_array rule)
    staged = toks.select(
        "id",
        "t",
        F.when(F.size("t") >= L, F.sequence(F.lit(0), F.size("t") - L))
        .otherwise(F.array().cast("array<int>"))
        .alias("starts"),
    )
    hashed = staged.select(
        "id",
        "t",
        F.transform(
            "starts", lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, L)))
        ).alias("hs"),
    )
    sh = hashed.select("id", F.posexplode("hs").alias("p", "h"))
    return toks, staged, sh


def _coverage_from_starts(
    toks: DataFrame, staged: DataFrame, ds: DataFrame, L: int
) -> DataFrame:
    """Per-doc coverage stats + cleaned text from a (id, p) frame of
    covered window starts: interval-merge window over the SPARSE starts,
    run-id grouping for max_run_len, covered-position anti-join rebuild."""
    from pyspark.sql.window import Window

    prev_end = F.max(F.col("p") + (L - 1)).over(
        Window.partitionBy("id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dsx = ds.withColumn("prev_end", prev_end)
    new_run = F.col("prev_end").isNull() | (F.col("prev_end") < F.col("p") - 1)
    contrib = (F.col("p") + (L - 1)) - F.greatest(
        F.coalesce(F.col("prev_end"), F.lit(-1)), F.col("p") - 1
    )
    # run_id (running count of run starts) groups each doc's dup starts
    # into maximal merged intervals; run length = span of the interval
    run_id = F.sum(new_run.cast("long")).over(
        Window.partitionBy("id").orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = (
        dsx.withColumn("run_id", run_id)
        .groupBy("id", "run_id")
        .agg((F.max("p") + (L - 1) - F.min("p") + 1).cast("long").alias("run_len"))
    )
    maxrun = runs.groupBy("id").agg(F.max("run_len").alias("max_run_len"))
    stats = (
        dsx.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_windows"),
            F.sum(new_run.cast("long")).cast("long").alias("n_runs"),
            F.sum(contrib).cast("long").alias("n_covered"),
        )
        .join(maxrun, "id")
    )
    covered = ds.select(
        "id", F.explode(F.sequence(F.col("p"), F.col("p") + (L - 1))).alias("tp")
    ).distinct()
    tokpos = staged.select("id", F.posexplode("t").alias("tp", "w"))
    clean = (
        tokpos.join(covered, ["id", "tp"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tp", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("clean_text")
        )
    )
    base = toks.select("id", F.size("t").cast("long").alias("n_tokens"))
    return (
        base.join(stats, "id", "left")
        .join(clean, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce(F.col("n_runs"), F.lit(0)).cast("long").alias("n_runs"),
            F.coalesce(F.col("n_covered"), F.lit(0)).cast("long").alias("n_covered"),
            F.coalesce(F.col("max_run_len"), F.lit(0)).cast("long").alias("max_run_len"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def substring_dedup_keepfirst(
    docs: DataFrame, *, id_col: str, text_col: str, min_tokens: int = 8
) -> DataFrame:
    """KEEP-FIRST any-length substring dedup — the information-preserving
    variant of :func:`substring_coverage` (Lee et al. 2022 discuss both;
    keep-one retains exactly one copy of every repeated region): a window
    occurrence is cut iff an occurrence of the same L-shingle exists at a
    strictly smaller (id, position) key — so the EARLIEST occurrence of
    every repeated substring survives and every later copy is removed.
    Equivalently: cut(o) ⇔ min_okey(h) < okey(o) — no global count
    needed, which is precisely what makes this form INCREMENTAL
    (:func:`substring_dedup_incremental`) without retroactive updates:
    under monotone batch ids, "seen at a smaller key" ≡ "seen in an
    earlier batch or earlier in this batch".

    Same per-doc surface as substring_coverage; ``n_dup_windows`` counts
    CUT window occurrences (first occurrences are not cut).

    Scale shape: identical to substring_coverage except the dup test is a
    partial-aggregable min-groupBy (boilerplate shingles combine
    map-side) + one equi-join instead of a count filter."""
    L = min_tokens
    toks, staged, sh = _substring_windows(docs, id_col, text_col, L)
    sh = sh.withColumn("okey", F.col("id") * _WIDX_STRIDE + F.col("p"))
    firsts = sh.groupBy("h").agg(F.min("okey").alias("first_key"))
    ds = (
        sh.join(firsts, "h")
        .filter(F.col("okey") > F.col("first_key"))
        .select("id", "p")
    )
    return _coverage_from_starts(toks, staged, ds, L)


def substring_dedup_incremental(
    new_docs: DataFrame,
    registry: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Incremental keep-first substring dedup against a persisted SHINGLE
    registry — the ingestion form of :func:`substring_dedup_keepfirst`,
    mirroring :func:`span_dedup_incremental`'s contract: ``registry``
    holds ``(h, first_key)`` for every shingle hash already claimed;
    returns ``(clean, registry_delta)`` where ``clean`` is the
    keep-first per-doc surface for the batch and ``registry_delta`` the
    ``(h, first_key)`` claims to merge before the next batch.

    Own-claim recognition makes batch REPLAY idempotent: a shingle whose
    registry first_key equals this batch's own min key is treated as
    unclaimed (it IS this batch's claim from the crashed prior run), so
    re-running reproduces byte-identical output.

    Equivalence contract (pytest-pinned): with monotone batch ids,
    sequentially folding batches reproduces EXACTLY the one-shot
    :func:`substring_dedup_keepfirst` over the union — cut(o) ⇔ an
    occurrence at a smaller key exists, and under monotone ids that
    earlier occurrence is either in the registry or earlier in this
    batch; nothing is ever retroactively cut.

    Scale shape: batch-local min-groupBy + ONE equi-join against the
    registry driven by the (bounded) batch side; the registry only ever
    gains keys."""
    L = min_tokens
    toks, staged, sh = _substring_windows(new_docs, id_col, text_col, L)
    sh = sh.withColumn("okey", F.col("id") * _WIDX_STRIDE + F.col("p"))
    batch_firsts = sh.groupBy("h").agg(F.min("okey").alias("bkey"))
    probed = batch_firsts.join(
        registry.select("h", F.col("first_key").alias("reg_key")), "h", "left"
    )
    # effective first key per shingle: the registry's claim unless it is
    # our own (replay) or absent — then this batch's earliest occurrence
    eff = probed.select(
        "h",
        F.when(
            F.col("reg_key").isNull() | (F.col("reg_key") == F.col("bkey")),
            F.col("bkey"),
        )
        .otherwise(F.least(F.col("reg_key"), F.col("bkey")))
        .alias("eff_key"),
        F.col("reg_key").isNull().alias("unclaimed"),
        (F.col("reg_key") == F.col("bkey")).alias("own"),
        "bkey",
    )
    ds = (
        sh.join(eff.select("h", "eff_key"), "h")
        .filter(F.col("okey") > F.col("eff_key"))
        .select("id", "p")
    )
    delta = eff.filter(F.col("unclaimed") | F.coalesce(F.col("own"), F.lit(False))).select(
        "h", F.col("bkey").alias("first_key")
    )
    return _coverage_from_starts(toks, staged, ds, L), delta


def claims_registry_compact(registry: DataFrame, *, key: str = "h") -> DataFrame:
    """Exact compaction for a long-lived keep-first claims registry — the
    bound-keeping step for continuous ingest (VERDICT r09 next-round #6),
    mirroring :func:`~briefly_spark.operators.classifier.
    nb_registry_compact`'s contract for the other long-lived registry.

    Works for both claim-registry shapes: the shingle registry
    ``(h, first_key)`` of :func:`substring_dedup_incremental` (default
    ``key="h"``) and the span registry ``(span, first_key)`` of
    :func:`span_dedup_incremental` (``key="span"``).

    What it compacts: the registries are keyed-merged in the reference
    deployment (one row per claimed key), but an append-only deployment —
    a log-structured sink, a crash-replayed block that raced its merge, a
    registry rebuilt by unioning per-batch delta files — accumulates
    duplicate key rows.  Compaction re-derives the canonical registry:
    ``groupBy(key).min(first_key)``.  MIN is the exact survivor because
    keep-first semantics cut every occurrence at ``okey > first claim``;
    any later duplicate claim row is by construction a larger okey and
    has no effect once removed — trimming any future batch against the
    compacted registry is byte-identical to trimming against the
    uncompacted one (pytest-pinned, like NB's model-equivalence pin).

    Safety caveat (same as NB): compaction forgets NON-MIN duplicate
    claims, which own-claim replay recognition might still match on.
    Only compact batches whose replay window has passed — the streaming
    checkpoint guarantees a committed micro-batch never replays, so
    compacting committed state is safe.  Pair with ``Warehouse.compact``
    for the file-level bound (many small merge outputs → few files)."""
    return registry.groupBy(key).agg(
        F.min("first_key").cast("long").alias("first_key")
    )


def contamination_registry_delta(
    train_docs: DataFrame, *, id_col: str, text_col: str, min_tokens: int = 8
) -> DataFrame:
    """DISTINCT L-shingle hashes of a train batch — the ``(h)`` rows to
    merge (``unionByName → distinct``) into a contamination registry.
    Merging the same batch twice is a no-op by construction (set union),
    so train-side ingestion is replay-idempotent with no key arithmetic
    at all — contamination is symmetric membership, unlike keep-first's
    ordered claims."""
    _t, _s, sh = _substring_windows(train_docs, id_col, text_col, min_tokens)
    return sh.select("h").distinct()


def decontaminate_incremental(
    eval_docs: DataFrame,
    registry: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
) -> DataFrame:
    """Per-eval-doc substring-contamination surface against a train-shingle
    registry — the ingestion form of the one-shot train↔eval overlap
    report (q135; Lee et al. 2022 §6.2 at substring granularity): every
    eval window whose L-shingle hash appears in the registry is a shared
    region; the output is :func:`_coverage_from_starts`'s per-doc surface
    (shared-window/run counts, covered tokens, longest run, cleaned
    text).

    Equivalence contract (pytest-pinned): with the registry built by
    folding train batches through :func:`contamination_registry_delta`,
    the report over any eval frame equals the one-shot computation
    against the unioned train corpus — and it is MONOTONE: a growing
    registry never decreases any eval doc's covered-token count, so
    decontamination decisions are safe to act on early (a doc flagged
    contaminated stays contaminated).

    Scale shape: the eval batch's shingles left-semi join the registry
    (md5 keys only — window text never shuffles); coverage is the sparse
    interval merge over eval docs alone."""
    toks, staged, sh = _substring_windows(eval_docs, id_col, text_col, min_tokens)
    ds = sh.join(registry.select("h"), "h", "leftsemi").select("id", "p")
    return _coverage_from_starts(toks, staged, ds, min_tokens)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------
def bigram_strings(words: Column) -> Column:
    """Adjacent token pairs of a token-ARRAY column as strings (with
    multiplicity).  Fewer than two tokens yields an empty array.

    Takes the materialized token array (same O(tokens²) re-tokenization
    caveat as :func:`span_array`), and returns STRINGS, not hashed ids:
    the md5-nibble hash runs in a flat projection AFTER the explode, where
    whole-stage codegen CSEs the four nibble references into one md5 per
    row — inside this interpreted lambda it would run four times per
    bigram."""
    idx = F.when(
        F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )




def _dsir_score_items(n_buckets: int, dialect: str) -> list[str]:
    """The four staged det_ln legs of the DSIR log-ratio plus the combined
    integer score, as lateral-alias SELECT items ending in
    ``… AS score_fp``.  One generator for both dialects — identical op
    order, so floor(det_ln·1e4) is the same integer in every engine; the
    staged form (numerics.det_ln_items) keeps the emitted SQL ~10× smaller
    than the inline det_ln expansion with bit-identical results."""
    legs = [
        ("ct + 1", "__l_ct"),
        (f"r_total + {n_buckets}", "__l_rt"),
        ("cr + 1", "__l_cr"),
        (f"t_total + {n_buckets}", "__l_tt"),
    ]
    items: list[str] = []
    for expr, out in legs:
        items.extend(det_ln_items(expr, out, dialect))
    fp = lambda out: f"floor({out} * {RATIO_SCALE})"  # noqa: E731
    items.append(
        f"CAST(((({fp('__l_ct')} + {fp('__l_rt')}) - {fp('__l_cr')})"
        f" - {fp('__l_tt')}) AS BIGINT) AS score_fp"
    )
    return items


def dsir_log_weights(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights: per-document log-likelihood ratio between
    the ``target`` sub-corpus and the raw corpus over hashed bigram
    features, add-one smoothed:

        w(doc) = Σ_occurrences [ ln p_t(f) − ln p_r(f) ]
        p_t(f) = (ct_f + 1) / (T + B),   p_r(f) = (cr_f + 1) / (R + B)

    Every log is fixed-pointed to an integer BEFORE any sum (four separate
    ``floor(det_ln·1e4)`` terms — no integer-overflowing products, counts
    up to 2^63 are safe), so the per-doc weight is an exact integer sum,
    order-independent and engine-independent.  Returns
    ``(id, n_bigrams, weight_fp)`` — ``weight_fp / 1e4`` is the log-ratio
    in nats; documents with fewer than two tokens are absent.

    Scale shape: one partial-aggregable groupBy on the feature id builds
    the feature table (≤ ``n_buckets`` rows however large the corpus — it
    broadcasts by construction, and is persisted because totals and the
    score projection both consume it); totals fold to one broadcast row;
    the per-doc pass is an explode + broadcast join + one groupBy on doc
    id.  The token stream is deliberately exploded TWICE (table build +
    scoring pass): at corpus scale, caching the exploded frame costs more
    than recomputing a map-only lineage."""
    feats = (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.col(text_col), " ").alias("toks"),
            target.cast("long").alias("is_t"),
        )
        .select(
            "id", F.explode(bigram_strings(F.col("toks"))).alias("bg"), "is_t"
        )
        .select("id", (_hash16(F.col("bg")) % n_buckets).alias("f"), "is_t")
    )
    # ≤ n_buckets rows, consumed by totals AND scored: without the persist
    # the corpus-sized explode+hash lineage re-executes per consumer
    table = (
        feats.groupBy("f")
        .agg(F.count(F.lit(1)).alias("cr"), F.sum("is_t").alias("ct"))
        .persist()
    )
    totals = table.agg(
        F.sum("cr").alias("r_total"), F.sum("ct").alias("t_total")
    )
    scored = (
        table.crossJoin(F.broadcast(totals))
        .selectExpr("f", *_dsir_score_items(n_buckets, "spark"))
        .select("f", "score_fp")
    )
    return (
        feats.join(F.broadcast(scored), "f")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("score_fp").alias("weight_fp"),
        )
    )


def sql_dsir_weights(
    docs_sql: str, target_pred: str, n_buckets: int = 4096
) -> str:
    """DuckDB mirror of :func:`dsir_log_weights` — identical hash, identical
    det_ln rounding sequence, identical fixed-point discipline.
    ``docs_sql`` must yield (id, text); ``target_pred`` is a boolean SQL
    predicate over those columns."""
    from briefly_spark.queries.textstats import _sql_hash16  # shared spelling

    bigram = "t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]"
    return f"""
WITH src AS ({docs_sql}),
toks AS (
  SELECT id, ({target_pred}) AS is_t, string_split(text, ' ') AS t FROM src
),
feats AS (
  SELECT id, CAST(is_t AS BIGINT) AS is_t,
         {_sql_hash16(bigram)} % {n_buckets} AS f
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
),
tab AS (
  SELECT f, count(*) AS cr, sum(is_t) AS ct FROM feats GROUP BY f
),
tot AS (
  SELECT sum(cr) AS r_total, sum(ct) AS t_total FROM tab
),
scored AS (
  SELECT f, {', '.join(_dsir_score_items(n_buckets, 'duckdb'))}
  FROM tab CROSS JOIN tot
)
SELECT feats.id AS id, count(*) AS n_bigrams,
       -- CAST: DuckDB widens sum(BIGINT) to HUGEINT, which fetches as
       -- Decimal/float64 through Arrow/pandas and breaks the value-hash
       -- against Spark's long — every hashed surface must be BIGINT.
       CAST(sum(score_fp) AS BIGINT) AS weight_fp
FROM feats JOIN scored ON feats.f = scored.f
GROUP BY feats.id
"""


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup over embedding clusters
# ---------------------------------------------------------------------------
def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    threshold: float = 0.99,
) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest coarse centroid,
    then inside each cell mark as duplicate every member that has a
    lower-id cell-mate with cosine ≥ ``threshold`` (keep-lowest-id, the
    deterministic form of SemDeDup's keep-one-per-group).

    Centroids are the ``n_cells`` corpus vectors with lexicographically
    smallest ``md5(id)`` — the same byte-reproducible seeded sample as the
    IVF oracle path (operators/similarity.py:238); swap in
    ``kmeans_centroids`` for better-shaped cells off the oracle surface.

    Returns ``(id, cell_id, is_dup)`` for every corpus row.

    Scale shape: assignment is a broadcast cross join against ``n_cells``
    rows + a partial-aggregable per-id max(struct) (combines map-side);
    the verify join is quadratic ONLY within a cell, which is the knob
    SemDeDup tunes (more cells → smaller cells); the dup set rides an
    id-only left join."""
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("n", l2_norm(F.col("v")))
    cent = (
        c.withColumn("ck", F.md5(F.col("id").cast("string")))
        .orderBy("ck")
        .limit(n_cells)
        .select(
            F.col("id").alias("cell_id"),
            F.col("v").alias("cv"),
            F.col("n").alias("cvn"),
        )
    )
    ccos = F.when(
        (F.col("n") > 0) & (F.col("cvn") > 0),
        dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cvn")),
    ).otherwise(F.lit(0.0))
    # Nearest-centroid assignment as a partial-aggregable min(struct):
    # greatest ccos (negated first key), ties to the SMALLEST cell_id —
    # the cell_id rides RAW as the second key, so the rule holds for any
    # orderable id type (review r12: the old max(struct) negated cell_id,
    # which casts a STRING id to double → NULL → ties silently resolved
    # to the LARGEST id).  Same winner as a row_number window ordered
    # (ccos DESC, cell_id ASC), but it combines map-side — at corpus
    # scale the shuffle carries one row per id, not n_cells rows per id.
    best = F.min(
        F.struct(
            (-F.col("ccos")).alias("negccos"),
            F.col("cell_id"), F.col("v"), F.col("n"),
        )
    ).alias("b")
    # Staged head slice + tail norm for the Cauchy–Schwarz prune (the q34
    # pattern, queries/dedup.py): dot(a,b) ≤ dot(a.h,b.h) + a.tn·b.tn, so
    # any pair provably below the threshold dies on an 8-dim fold instead
    # of the full one.  The final cos formula is untouched (same fold,
    # same operand order) — oracle hashes cannot move.
    head = 8
    tail = F.when(
        F.size(F.col("v")) > head,
        F.slice(F.col("v"), head + 1, F.greatest(F.size(F.col("v")) - head, F.lit(1))),
    ).otherwise(F.array().cast("array<double>"))
    assigned = (
        c.join(F.broadcast(cent), how="cross")
        .withColumn("ccos", ccos)
        .groupBy("id")
        .agg(best)
        .select(
            "id", F.col("b.cell_id").alias("cell_id"),
            F.col("b.v").alias("v"), F.col("b.n").alias("n"),
        )
        .withColumn("h", F.slice(F.col("v"), 1, head))
        .withColumn("tn", l2_norm(tail))
        # consumed THREE times below (both pair-join sides + the output
        # join): without a persist the broadcast-cross-join + argmax
        # lineage re-executes per consumer (the dedup.py CC persist
        # rationale; MEMORY_AND_DISK, sized like the corpus itself)
        .persist()
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cs_bound = dot(F.col("a.h"), F.col("b.h")) + F.col("a.tn") * F.col("b.tn")
    pair_cos = F.when(
        (F.col("a.n") > 0) & (F.col("b.n") > 0),
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")),
    ).otherwise(F.lit(0.0))
    dups = (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(cs_bound >= F.lit(threshold) * F.col("a.n") * F.col("b.n"))
        .filter(pair_cos >= F.lit(threshold))
        .select(F.col("b.id").alias("id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )
    return (
        assigned.join(dups, "id", "left")
        .select(
            "id",
            "cell_id",
            F.coalesce(F.col("dup"), F.lit(0)).cast("int").alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic Lloyd's k-means — bounded-round centroid refinement
# ---------------------------------------------------------------------------
def kmeans_refine(
    vectors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    qscale: int = 2**20,
) -> DataFrame:
    """Bounded-round Lloyd's k-means in INTEGER fixed-point — the
    engine-exact counterpart of ``spark.ml`` KMeans
    (operators/similarity.py:kmeans_centroids, seeded but
    engine-specific): refines :func:`semantic_dedup` / IVF-style coarse
    cells with actual centroid updates while staying on the oracle
    surface.

    Determinism: coordinates quantize to ``floor(x · 2²⁰)`` (float→double
    is exact and a power-of-two multiply only shifts the exponent, so the
    quantization is bit-exact in any engine); assignment minimizes the
    INTEGER squared L2 distance with ties to the smallest cell id; the
    centroid update is a per-dimension integer-sum floor-divided by the
    member count.  No float ever enters an aggregation.

    Init: the ``k`` vectors with smallest id seed the cells (cell id =
    seed's id).  A cell that loses every member disappears — identically
    in both engines.  Returns the final assignment
    ``(id, cell, sq_dist)``.

    Scale shape, per round: assignment is map-only (broadcast of k
    centroid rows, partial-aggregable min(struct) — no per-id sort
    shuffle), and the update shuffle carries only (cell, dim) partial
    sums — k·d groups after map-side combine, independent of corpus
    size.  Rounds are a fixed small count; the quantized corpus is
    persisted once.
    """
    qv = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(qscale))).cast("long"),
        ).alias("q"),
    ).persist()
    cent = qv.orderBy("id").limit(k).select(
        F.col("id").alias("cell"), F.col("q").alias("cv")
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("q"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def assign(centroids: DataFrame) -> DataFrame:
        scored = qv.crossJoin(F.broadcast(centroids)).select(
            "id", "q", sq_dist.alias("sq_dist"), "cell"
        )
        best = scored.groupBy("id").agg(
            F.min(F.struct("sq_dist", "cell")).alias("best"),
            F.first("q").alias("q"),
        )
        return best.select(
            "id", "q", F.col("best.cell").alias("cell"),
            F.col("best.sq_dist").alias("sq_dist"),
        )

    for _ in range(iters):
        assigned = assign(cent)
        dims = assigned.select(
            "cell", F.posexplode("q").alias("dim", "val")
        )
        sums = dims.groupBy("cell", "dim").agg(
            F.sum("val").alias("s"), F.count(F.lit(1)).alias("cnt")
        )
        cent = (
            sums.select("cell", "dim", F.expr("s div cnt").alias("cval"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                    lambda st: st["cval"],
                ).alias("cv")
            )
        )
    return assign(cent).select("id", "cell", "sq_dist")
