"""Text-analysis operators for corpus curation — language-ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's text surface (SURVEY §2.8 — clean/slugify/
chunk) with the analysis pass a 100 TB training-data pipeline runs before
filtering: every operator is a pure native Column expression (whole-stage
codegen, zero UDFs, zero shuffles), so the analysis pass is a single map
stage over the corpus scan with full pushdown.

Engine portability: anything hash-based uses md5 hex strings, and any
tie-break is an explicit deterministic CASE priority — Spark and DuckDB
produce byte-identical results (the oracle harness hash-compares them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small high-frequency lexicons for the stopword-overlap language heuristic.
# Deliberately tiny: the operator contract is the *heuristic*, swappable for
# real per-language tables at scale (broadcast-joined lexicon DataFrame).
LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "que", "los", "una", "por", "con", "para"),
    "fr": ("le", "les", "des", "est", "pas", "une", "dans", "pour"),
}

# BPE-ish pre-tokenization: letter runs | digit runs | single punctuation.
BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Non-empty whitespace tokens."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def word_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Token count under a BPE-style pre-tokenizer (letter runs, digit
    runs, punctuation marks) — the standard proxy for LLM token cost when
    the real tokenizer isn't on the cluster."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT), 0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """|distinct tokens ∩ lexicon| / |distinct tokens|."""
    toks = F.array_distinct(tokens(col))
    lex = F.array(*[F.lit(w) for w in LEXICONS[lang]])
    return F.when(
        F.size(toks) > 0,
        F.size(F.array_intersect(toks, lex)).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-overlap score (deterministic heuristic)."""
    return {lang: stopword_ratio(col, lang) for lang in LEXICONS}


def language_id(col: Column) -> Column:
    """Predicted language: argmax of stopword-overlap scores with a fixed
    alphabetical priority on ties, 'und' (undetermined) when no lexicon
    hits.  Expressed as a CASE chain so any engine evaluates it
    identically — no struct-ordering or argmax portability traps."""
    s = language_scores(col)
    langs = sorted(LEXICONS)  # de, en, es, fr — priority order on ties
    best: Column = F.lit(langs[0])
    best_score: Column = s[langs[0]]
    for lang in langs[1:]:
        gt = s[lang] > best_score
        best = F.when(gt, F.lit(lang)).otherwise(best)
        best_score = F.when(gt, s[lang]).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    n_punct = n - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(0.0))


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    n_digit = n - F.length(F.regexp_replace(col, r"[0-9]", ""))
    return F.when(n > 0, n_digit.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document quality in [0, 10]: rewards reasonable length,
    natural word lengths and stopword presence; penalizes punctuation/digit
    noise.  A deterministic rubric in the spirit of C4/Gopher heuristics —
    each component is clamped to [0,1] then weighted."""
    length_c = F.least(word_count(col).cast("double") / 50.0, F.lit(1.0))
    stop_c = F.least(stopword_ratio(col, "en") * 5.0, F.lit(1.0))
    wl = mean_word_len(col)
    wordlen_c = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    noise = punct_ratio(col) + digit_ratio(col)
    noise_c = F.greatest(F.lit(1.0) - noise * 4.0, F.lit(0.0))
    return (length_c * 3 + stop_c * 3 + wordlen_c * 2 + noise_c * 2).cast("double")


# ---------------------------------------------------------------------------
# fingerprinting (winnowing over a rolling hash)
# ---------------------------------------------------------------------------
def kgram_hashes(col: Column, k: int = 8) -> Column:
    """md5 hash of every character k-gram (the rolling-hash stream)."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(n >= k, F.transform(idx, lambda i: F.md5(F.substring(col, i, k)))).otherwise(
        F.array(F.md5(col))
    )


def window_minima(hashes: Column, w: int = 4) -> Column:
    """Per-window minima over a hash stream (the winnowing step).

    IMPORTANT: pass ``hashes`` as a *materialized column reference* (a
    separate ``select`` stage), never the raw k-gram expression — Spark's
    higher-order lambdas are interpreted without common-subexpression
    elimination, so an inlined stream expression would be recomputed once
    per window (O(n²) hashing)."""
    n = F.size(hashes)
    widx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    return F.when(
        n >= w, F.transform(widx, lambda i: F.array_min(F.slice(hashes, i, w)))
    ).otherwise(F.array(F.array_min(hashes)))


def winnow_fingerprint(col: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): the
    distinct set of per-window minima over the k-gram hash stream, as a
    sorted array.  Guarantees any shared substring of length ≥ k+w-1
    contributes a shared fingerprint — the standard near-dup/plagiarism
    sketch.  Pure array lambdas: identical output in Spark and DuckDB.

    Single-expression form — fine for tests/small inputs.  In query plans
    use the staged form (kgram_hashes → window_minima across separate
    projections, see queries/textstats.py q53) so each stage is evaluated
    once per row instead of once per window."""
    return F.array_sort(F.array_distinct(window_minima(kgram_hashes(col, k), w)))


# ---------------------------------------------------------------------------
# Gopher-style document-composition rules (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------
#: published Gopher bounds, used by :func:`gopher_keep`
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_WORDLEN_LO = 3.0
GOPHER_WORDLEN_HI = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.90
GOPHER_MAX_ELLIPSIS_FRAC = 0.30
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2


def doc_lines(col: Column) -> Column:
    """Non-empty lines."""
    return F.filter(F.split(col, r"\n"), lambda l: l != "")


def duplicate_line_fraction(col: Column) -> Column:
    """1 − |distinct lines| / |lines| — the Gopher repetition signal (the
    n-gram variants follow the same shape over shingle arrays)."""
    ls = doc_lines(col)
    return F.when(
        F.size(ls) > 0,
        F.lit(1.0) - F.size(F.array_distinct(ls)).cast("double") / F.size(ls),
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column) -> Column:
    """(# of '#' chars + # of '...' runs) per word — Gopher's symbol-noise
    rule.  '...' is counted by non-overlapping replace, identical
    left-to-right semantics in Spark and DuckDB."""
    n_hash = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    n_ell = (F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))) / 3
    wc = word_count(col)
    return F.when(wc > 0, (n_hash + n_ell).cast("double") / wc).otherwise(F.lit(0.0))


def bullet_line_fraction(col: Column) -> Column:
    """Fraction of lines starting with a bullet marker ('- ' or '* ')."""
    ls = doc_lines(col)
    bullets = F.filter(
        ls, lambda l: (F.substring(l, 1, 2) == "- ") | (F.substring(l, 1, 2) == "* ")
    )
    return F.when(
        F.size(ls) > 0, F.size(bullets).cast("double") / F.size(ls)
    ).otherwise(F.lit(0.0))


def ellipsis_line_fraction(col: Column) -> Column:
    """Fraction of lines ending in an ellipsis ('...')."""
    ls = doc_lines(col)
    ell = F.filter(ls, lambda l: F.substring(l, F.length(l) - 2, 3) == F.lit("..."))
    return F.when(
        F.size(ls) > 0, F.size(ell).cast("double") / F.size(ls)
    ).otherwise(F.lit(0.0))


def alpha_word_fraction(col: Column) -> Column:
    """Fraction of words containing at least one ASCII letter."""
    toks = tokens(col)
    alpha = F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    return F.when(
        F.size(toks) > 0, F.size(alpha).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """|distinct tokens ∩ lexicon| — Gopher requires ≥ 2 distinct hits."""
    lex = F.array(*[F.lit(w) for w in LEXICONS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(col)), lex))


def gopher_keep(col: Column) -> Column:
    """The Gopher quality gate as ONE boolean Column: word count, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction and stopword hits all within the published bounds.  Pure
    whole-stage-codegen — the 100 TB filter pass is a map stage."""
    wc = word_count(col)
    wl = mean_word_len(col)
    return (
        (wc >= GOPHER_MIN_WORDS)
        & (wc <= GOPHER_MAX_WORDS)
        & (wl >= GOPHER_WORDLEN_LO)
        & (wl <= GOPHER_WORDLEN_HI)
        & (symbol_word_ratio(col) < GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_line_fraction(col) < GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_line_fraction(col) < GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_word_fraction(col) > GOPHER_MIN_ALPHA_FRAC)
        & (stopword_hits(col) >= GOPHER_MIN_STOP_HITS)
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (C4/RefinedWeb-style cleaning)
# ---------------------------------------------------------------------------
#: (kind, pattern, placeholder) — patterns kept alternation-free so Java
#: regex (Spark) and RE2 (DuckDB) agree byte-for-byte on every match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (audit columns for the scrub pass)."""
    return {
        kind: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for kind, pat, _ in PII_PATTERNS
    }


def pii_scrub(col: Column) -> Column:
    """Redact PII with typed placeholders — chained native regexp_replace
    in PII_PATTERNS order (email first: its local part may contain digit
    runs the narrower patterns would otherwise split)."""
    out = col
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


# ---------------------------------------------------------------------------
# dataset assembly: split / mixture / packing
# ---------------------------------------------------------------------------
HEX = "0123456789abcdef"


def _hash16(id_col: Column) -> Column:
    """First 4 md5 hex digits of the id as an int in [0, 65536) — the same
    engine-portable nibble arithmetic as the embedding stubs (instr-based,
    byte-identical in Spark and DuckDB; no base-conversion builtins)."""
    h = F.md5(id_col.cast("string"))

    def nib(j: int) -> Column:
        return F.instr(F.lit(HEX), F.substring(h, j, 1)) - 1

    return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)


def hash_split(id_col: Column, val_pct: int = 5, test_pct: int = 5) -> Column:
    """Deterministic train/val/test assignment from a content-stable hash:
    bucket = hash16(id) mod 100.  Stable under reshuffles, re-partitioning
    and incremental appends — the property random splits lose at 100 TB
    (a re-run must not migrate rows between splits)."""
    bucket = _hash16(id_col) % 100
    return (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )


def mixture_accept(id_col: Column, rate: Column) -> Column:
    """Deterministic per-row acceptance for domain-mixture resampling:
    accept iff hash16(id)/65536 < rate.  Feeding per-domain target rates
    (a broadcast-joined weights table) reproduces any target mixture in
    expectation while staying reproducible row-for-row."""
    return _hash16(id_col).cast("double") / 65536.0 < rate


def stratified_sample(
    df: DataFrame,
    quotas: DataFrame,
    *,
    stratum_col: str,
    id_col: str,
    rank_col: str = "samp_rank",
) -> DataFrame:
    """Exact-quota stratified sampling — the deterministic-count complement
    to :func:`mixture_accept` (which hits a target mixture only in
    expectation): each stratum contributes exactly ``min(quota, |stratum|)``
    rows, selected by a content-stable pseudo-random order
    (``md5(id)``), so the sample is uniform within stratum yet
    byte-reproducible across runs, engines and repartitioning.

    ``quotas`` is a small (stratum, quota) spec — broadcast-joined, never
    shuffled.  Cost: ONE shuffle (the per-stratum ranking window); at
    100 TB the window is per-stratum and AQE handles stratum skew."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .join(F.broadcast(quotas), stratum_col)
        .filter(F.col(rank_col) <= F.col("quota"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    min_docs: int = 10,
) -> DataFrame:
    """C4/RefinedWeb-style line-level cleanup with cross-corpus boilerplate
    removal — the line-granularity complement to the document-granularity
    Gopher rules: (1) per-line filters keep only lines with ≥ ``min_words``
    words AND terminal punctuation (C4's sentence heuristics); (2) any
    surviving line occurring in ≥ ``min_docs`` distinct documents is
    corpus-wide boilerplate (cookie banners, subscribe prompts) and is
    removed everywhere; (3) kept lines reassemble in original order.

    Returns (id, clean_text, n_kept).  Scale shape: per-line filters are
    map-side; the cross-doc count shuffles ``md5(line)`` + doc id (never
    line text); the resulting boilerplate key set is tiny by construction
    (only lines repeated across ≥ min_docs docs) and broadcasts into a
    map-side anti-join; one final per-doc aggregation restores order via
    in-aggregate struct sort."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    rules = (F.size(tokens(F.col("line"))) >= min_words) & F.col("line").rlike(r"[.!?]$")
    cand = lines.filter(rules).withColumn("lk", F.md5("line"))
    boiler = (
        cand.groupBy("lk")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("lk")
    )
    kept = cand.join(F.broadcast(boiler), "lk", "left_anti")
    return kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget sequence packing: assign each document to a training
    sequence (bin) so every bin holds ~``budget`` tokens, preserving a
    deterministic order.  bin = floor((cumsum(tokens) − tokens) / budget)
    over a per-group running sum — the streaming-friendly approximation of
    greedy first-fit packing (bins can overflow by < one document, never
    underfill by more than one; exact bin packing is NP-hard and
    order-destroying).  One window per group — shuffle keyed on
    ``group_col``, no global sort, scales with group cardinality."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long")
    )


def pack_sequences_exact(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Exact token-budget packing WITH document spanning — the
    tokenizer-faithful upgrade of :func:`pack_sequences`: instead of
    assigning whole documents to bins (bins overflow by up to one
    document), documents are SLICED across sequence boundaries so every
    bin holds exactly ``budget`` tokens (except each group's last).  This
    is how training sequences are actually assembled: a document straddling
    a boundary contributes its head to one sequence and its tail to the
    next.

    Emits one row per (document × covered bin):
    (group, order, bin, offset, take) where ``offset`` is the first token
    of the slice within the document and ``take`` its length —
    ``sum(take) == tokens`` per document (no token lost or duplicated) and
    ``sum(take) == budget`` per non-final bin.

    Plan: the same single per-group running-sum window as
    :func:`pack_sequences`, then a bin-band explode
    (``sequence(start div B, (end-1) div B)``, the range_join banding
    pattern) — a document with T tokens emits ceil-ish T/budget slices, so
    output scales with corpus tokens / budget, never with pair counts.
    Zero-token documents emit nothing.  Bin indices use INTEGER division
    (``div``), not double ``/``+floor — double math silently corrupts bins
    once a group's cumulative token count passes 2^53 (same trap flagged
    in catalog.py).  All other input columns ride through unchanged, so a
    caller can carry the token ARRAY into the window and slice it
    downstream without re-scanning or re-joining the corpus (see q69)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("start")
    staged = df.filter(F.col(tokens_col) > 0).select("*", start)
    end = F.col("start") + F.col(tokens_col)
    b = F.lit(budget)
    spanned = staged.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"start div {budget}"),
                F.expr(f"(start + {tokens_col} - 1) div {budget}"),
            )
        ),
    )
    lo = F.greatest(F.col("start"), F.col("bin") * b)
    hi = F.least(end, (F.col("bin") + 1) * b)
    return spanned.select(
        *df.columns,
        "bin",
        (lo - F.col("start")).cast("long").alias("offset"),
        (hi - lo).cast("long").alias("take"),
    )


def word_ngrams(words: Column, n: int = 2) -> Column:
    """Word n-grams WITH duplicates (repetition counting needs multiplicity;
    the dedup shingler's distinct variant is ngrams_of_words).  Same
    descending-sequence guard: fewer than n words ⇒ empty array."""
    last = F.size(words) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)])  # noqa: E731
    return F.transform(idx, gram)


# ---------------------------------------------------------------------------
# X147 — leakage-safe cluster split + cross-split leakage audit
# ---------------------------------------------------------------------------
def cluster_split(
    assignments: DataFrame,
    *,
    id_col: str,
    cluster_col: str,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment at CLUSTER granularity: hash the cluster
    representative, not the document, so every member of a near-dup
    cluster lands in the same split — per-doc :func:`hash_split` lets a
    near-duplicate of a test document train the model (eval
    contamination the decontamination ops (q36/q97/q135) detect AFTER
    the fact; this prevents it at assignment time).

    ``assignments`` is (id_col, cluster_col) — the survivor-election /
    connected-components output (queries/dedup.py, operators/graph.py),
    with singleton docs carrying their own id as cluster.  Returns
    (id, cluster, split).  Same stability contract as hash_split: the
    split is a pure function of the cluster id, so re-partitioning,
    re-runs and incremental appends never migrate members — and a NEW
    member joining an old cluster inherits the cluster's split, which
    is exactly the leakage guarantee extended in time."""
    return assignments.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        hash_split(F.col(cluster_col), val_pct, test_pct).alias("split"),
    )


def split_leakage_report(
    splits: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Audit a split against a near-dup pair set: one row per ordered
    split pair (split_a ≤ split_b) with the count of near-dup pairs
    straddling it.  Leakage = any off-diagonal row; a cluster_split over
    the pair set's own components is leakage-free by construction
    (pytest-pinned), a per-doc hash_split measurably is not.

    ``splits`` is (id, split); ``pairs`` is (id_a, id_b).  Cost: two
    id equi-joins + one (splits²)-bounded aggregation."""
    s_a = splits.select(F.col("id").alias("id_a"), F.col("split").alias("sa"))
    s_b = splits.select(F.col("id").alias("id_b"), F.col("split").alias("sb"))
    return (
        pairs.join(s_a, "id_a")
        .join(s_b, "id_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaks", F.col("split_a") != F.col("split_b"))
    )
