"""Unigram-LM tokenizer training (SentencePiece's unigram model, Kudo
2018 "Subword Regularization", arXiv:1804.10959) — the second tokenizer-
training leg next to BPE (operators/bpe.py): BPE grows a vocabulary
bottom-up by merging, the unigram model starts from an over-complete
seed and PRUNES, segmenting by maximum likelihood at every step.  Real
pipelines train both and compare fertility (q126's metric) before
committing a vocabulary to a 100 TB tokenization run.

Reference parity: like bpe.py, this is the offline step behind the
pre-trained tokenizers the reference loads with its embedding models
(utils/embedding/embedding_utils.py); expressed Spark-first so the same
warehouse that curates the corpus trains its tokenizer.

Scale design — the corpus is touched exactly ONCE:

- The corpus collapses to the distinct-word frequency frame (bpe.word_freqs
  — one tokenize + groupBy shuffle, Heaps-bounded: ~10⁶–10⁷ rows at
  100 TB).  Everything after operates on that frame.
- Seeding explodes each word's substrings (≤ len·L per word) into ONE
  piece-count partial aggregation — key space is the piece space, never
  the corpus.
- Each EM round is one Arrow-batched ``mapInPandas`` Viterbi pass over
  the word frame (the vocabulary rides along as a closure broadcast —
  vocab-sized, thousands of entries) followed by one vocab-bounded
  piece-count aggregation.  Python is acceptable here for the same
  reason as the BPE argmax loop: it runs on the Heaps-bounded frame,
  not the corpus, and the per-word DP is O(len·L) with integer adds.
- Driver state is the vocabulary itself — (piece, count) for ≤ seed_size
  rows — the standard tokenizer-training shape (a 32k-piece vocab is
  kilobytes; contrast the corpus, which never leaves the executors).

Determinism — engine-exact end to end, so a future oracle can gate it:

- Hard (Viterbi) EM, not soft EM: expected counts are integer
  frequency sums over argmax segmentations — no float accumulation.
- Piece log-probabilities are integer micro-nats computed with
  :func:`briefly_spark.numerics.det_ln_py` (the bit-reproducible staged
  ln): ``s_fp(p) = floor((det_ln(count_p) − det_ln(total)) · 10⁶)``.
  DP sums are exact BIGINT adds, so the argmax is engine-independent.
- All ties are totally ordered: segmentation ties break on (fewer
  pieces, then longer final piece — i.e. smallest split point), prune
  ranking on (count DESC, piece ASC under binary UTF-8 order).
- Single-character pieces are never pruned, so every word stays
  segmentable (Kudo §3.2's character-coverage floor).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.numerics import det_ln_py

#: fixed-point scale for piece log-probabilities (micro-nats)
SCORE_SCALE = 1_000_000


def piece_scores_fp(counts: dict[str, int]) -> dict[str, int]:
    """Integer micro-nat log-probs from integer piece counts — the only
    place a logarithm appears, and it is the bit-reproducible det_ln on
    integers, floored once; every downstream DP add is exact."""
    total = sum(counts.values())
    ln_total = det_ln_py(total)
    return {
        p: math.floor((det_ln_py(c) - ln_total) * SCORE_SCALE)
        for p, c in counts.items()
    }


def viterbi_segment(
    word: str, scores: dict[str, int], max_piece_len: int
) -> list[str]:
    """Maximum-likelihood segmentation of one word under integer
    micro-nat piece scores — the pure-Python reference AND the kernel
    the Spark pass runs per word.  Ties: higher score, then fewer
    pieces, then longest final piece (smallest split point).  Assumes
    every single character scores (enforced by training: chars are
    never pruned); raises KeyError otherwise rather than guessing."""
    n = len(word)
    # dp[i] = (score, -npieces, -split) best over word[:i]; tuple compare
    # IS the tie-break order: score, fewer pieces, smaller split point
    # (= longest final piece).  Integer-only adds — engine-exact.
    dp: list[tuple[int, int, int] | None] = [None] * (n + 1)
    dp[0] = (0, 0, 0)
    for i in range(1, n + 1):
        best: tuple[int, int, int] | None = None
        for j in range(max(0, i - max_piece_len), i):
            prev = dp[j]
            if prev is None:
                continue
            s = scores.get(word[j:i])
            if s is None:
                continue
            cand = (prev[0] + s, prev[1] - 1, -j)
            if best is None or cand > best:
                best = cand
        dp[i] = best
    if dp[n] is None:
        raise KeyError(f"unsegmentable word {word!r} (pruned character?)")
    out: list[str] = []
    i = n
    while i > 0:
        j = -dp[i][2]
        out.append(word[j:i])
        i = j
    return out[::-1]


def seed_pieces(
    words: DataFrame,
    *,
    max_piece_len: int = 6,
    seed_size: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Over-complete seed vocabulary: every substring of length 1..L,
    frequency-weighted, top ``seed_size`` multi-char pieces by
    (count DESC, piece ASC) with count ≥ ``min_count`` — plus ALL single
    characters regardless of count or budget (the coverage floor).
    One explode + one partial aggregation over the word frame; the
    ranking window runs on the piece-count frame, bounded by the piece
    space, with a total deterministic order."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - i + 1)
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter((F.length("piece") > 1) & (F.col("count") >= min_count))
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def viterbi_counts(
    words: DataFrame, scores: dict[str, int], max_piece_len: int
) -> DataFrame:
    """One hard-EM E+M step: Viterbi-segment every distinct word (Arrow-
    batched pandas pass over the Heaps-bounded word frame, vocabulary as
    a closure broadcast) and aggregate frequency-weighted piece counts —
    the M-step groupBy is bounded by the vocabulary, combines map-side."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pieces: list[str] = []
            freqs: list[int] = []
            for word, freq in zip(b["word"], b["freq"]):
                for p in viterbi_segment(word, scores, max_piece_len):
                    pieces.append(p)
                    freqs.append(freq)
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    return (
        words.select("word", "freq")
        .mapInPandas(seg, schema="piece string, freq long")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )


def unigram_train(
    spark: SparkSession,
    words: DataFrame,
    *,
    vocab_size: int = 200,
    max_piece_len: int = 6,
    seed_size: int = 1000,
    min_count: int = 2,
    prune_frac: float = 0.75,
    max_rounds: int = 10,
) -> DataFrame:
    """Train the unigram vocabulary: seed → (Viterbi counts → prune the
    multi-char tail to ``prune_frac`` of its size) until the vocabulary
    fits ``vocab_size`` — Kudo's prune loop with hard-EM counts.  Single
    characters are never pruned and don't count against the budget
    decisions' ordering (they rank by count like everything else but are
    exempt from dropping).  Returns (piece, count, score_fp, is_char)
    where ``score_fp`` is the final integer micro-nat log-prob.

    Driver state per round: the vocabulary dict (≤ seed_size + alphabet
    entries).  Corpus reads: zero — only the persisted word frame."""
    seed = {r["piece"]: int(r["count"]) for r in seed_pieces(
        words,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        min_count=min_count,
    ).collect()}
    words = words.persist()
    words.count()
    vocab = dict(seed)
    try:
        for _ in range(max_rounds):
            scores = piece_scores_fp(vocab)
            counted = {
                r["piece"]: int(r["count"])
                for r in viterbi_counts(words, scores, max_piece_len).collect()
            }
            # chars keep their seed count as a floor if the round never used
            # them (they must stay scoreable); multi-char pieces live on
            # observed counts alone.
            chars = {p: counted.get(p, vocab[p]) for p in vocab if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in counted.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            budget = max(vocab_size - len(chars), 0)
            if len(multi) > budget:
                keep = max(budget, int(len(multi) * prune_frac))
                multi = multi[:keep]
            vocab = {**chars, **dict(multi)}
            if len(vocab) <= vocab_size or not multi:
                break
        scores = piece_scores_fp(vocab)
        return spark.createDataFrame(
            sorted(
                (p, c, scores[p], len(p) == 1) for p, c in vocab.items()
            ),
            schema="piece STRING, count BIGINT, score_fp BIGINT, is_char BOOLEAN",
        )
    finally:
        words.unpersist()


def sql_seed_pieces(
    table: str,
    text_col: str = "text",
    *,
    max_piece_len: int = 6,
    seed_size: int = 1000,
    min_count: int = 2,
) -> str:
    """DuckDB mirror of ``word_freqs → seed_pieces`` — the SQL-expressible
    half of unigram training (the Viterbi-EM rounds are not SQL; their
    pins are the brute-force/pure-Python tests).  Ready as a registry
    oracle for the r11 q148 gating; until then
    tests/test_unigram.py value-compares it with the Spark seed on the
    real testdata — the X116 self-hosted-gate pattern."""
    return rf"""WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower({text_col}), '\s+'),
                            x -> x <> '')) AS word
  FROM {table}
), wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word),
subs AS (
  SELECT substr(wf.word, CAST(i.i AS INT), CAST(l.l AS INT)) AS piece, wf.freq
  FROM wf,
       LATERAL (SELECT unnest(range(1, length(wf.word) + 1)) AS i) i,
       LATERAL (SELECT unnest(range(1, least({max_piece_len},
                       length(wf.word) - i.i + 1) + 1)) AS l) l
), pc AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS count FROM subs GROUP BY piece)
SELECT piece, count FROM pc WHERE length(piece) = 1
UNION ALL
SELECT piece, count FROM (
  SELECT piece, count FROM pc WHERE length(piece) > 1 AND count >= {min_count}
  ORDER BY count DESC, piece ASC LIMIT {seed_size})"""


def unigram_encode(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_piece_len: int = 6,
) -> DataFrame:
    """Per-document token statistics under a trained unigram vocabulary —
    (id, n_words, n_pieces, fertility_fp) with fertility = pieces/word at
    RATIO-scale fixed point, q126's surface for the other tokenizer.

    Shape: the corpus tokenizes and collapses to its distinct words; each
    distinct word segments ONCE (the q88/BPE discipline); per-doc stats
    come from one corpus-words equi-join back (AQE-splittable) + one
    per-doc aggregation."""
    scores = {
        r["piece"]: int(r["score_fp"]) for r in vocab.select("piece", "score_fp").collect()
    }

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "word": b["word"],
                    "n_pieces": [
                        len(viterbi_segment(w, scores, max_piece_len))
                        for w in b["word"]
                    ],
                }
            )

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    corpus_words = docs.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("word")
    )
    word_pieces = (
        corpus_words.select("word")
        .distinct()
        .mapInPandas(seg, schema="word string, n_pieces long")
    )
    return (
        corpus_words.join(word_pieces, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
        .select(
            "id",
            "n_words",
            "n_pieces",
            F.floor(F.col("n_pieces") * 10000 / F.col("n_words"))
            .cast("long")
            .alias("fertility_fp"),
        )
    )


def _hash_uniform(tag: str) -> float:
    """Deterministic uniform in [0, 1) from md5 — noise without an RNG
    stream, so any (word, seed, position) draws the same value on every
    executor, every run, every platform."""
    import hashlib

    return int(hashlib.md5(tag.encode()).hexdigest()[:13], 16) / float(16**13)


def sample_segmentation(
    word: str,
    scores: dict[str, int],
    max_piece_len: int,
    *,
    seed: int,
    alpha: float = 1.0,
) -> list[str]:
    """Subword-regularization sampling (Kudo 2018 §3): draw a segmentation
    with probability ∝ exp(α · score(seg)) by forward-filtering /
    backward-sampling over the word lattice.  α → ∞ degenerates to
    :func:`viterbi_segment`'s argmax; α = 0 is uniform over valid
    segmentations.  Deterministic: the only randomness is
    md5(seed, word, position) uniforms, so the same (word, seed) always
    samples the same segmentation — replayable data augmentation.

    The forward pass is float log-sum-exp (CPython IEEE ops — this is a
    training-data AUGMENTATION surface, pinned by distribution tests,
    not an oracle-hashed one; the exact integer surfaces stay with
    Viterbi).  Per-word cost O(len·L), same as Viterbi."""
    import math

    n = len(word)
    a = [float("-inf")] * (n + 1)  # forward log-mass of word[:i]
    a[0] = 0.0
    sc = {p: alpha * (s / float(SCORE_SCALE)) for p, s in scores.items()}
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_piece_len), i):
            s = sc.get(word[j:i])
            if s is None or a[j] == float("-inf"):
                continue
            terms.append(a[j] + s)
        if terms:
            m = max(terms)
            a[i] = m + math.log(sum(math.exp(t - m) for t in terms))
    if a[n] == float("-inf"):
        raise KeyError(f"unsegmentable word {word!r} (pruned character?)")
    out: list[str] = []
    i = n
    while i > 0:
        cands = []
        for j in range(max(0, i - max_piece_len), i):
            s = sc.get(word[j:i])
            if s is None or a[j] == float("-inf"):
                continue
            cands.append((j, math.exp(a[j] + s - a[i])))
        total = sum(w for _, w in cands)
        u = _hash_uniform(f"{seed}:{word}:{i}") * total
        acc = 0.0
        pick = cands[-1][0]
        for j, w in cands:
            acc += w
            if u < acc:
                pick = j
                break
        out.append(word[pick:i])
        i = pick
    return out[::-1]


def sampled_counts(
    words: DataFrame,
    scores: dict[str, int],
    max_piece_len: int,
    *,
    seed: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Frequency-weighted piece counts under SAMPLED segmentations — the
    augmentation twin of :func:`viterbi_counts` (one epoch = one seed;
    vary the seed per epoch to expose the model to alternative
    tokenizations of the same text).  Same shape: Arrow-batched pass over
    the Heaps-bounded word frame, vocab-bounded aggregation, and the
    hash-seeded noise makes the pass deterministic per (word, seed)
    regardless of partitioning."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pieces: list[str] = []
            freqs: list[int] = []
            for word, freq in zip(b["word"], b["freq"]):
                for p in sample_segmentation(
                    word, scores, max_piece_len, seed=seed, alpha=alpha
                ):
                    pieces.append(p)
                    freqs.append(freq)
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    return (
        words.select("word", "freq")
        .mapInPandas(seg, schema="piece string, freq long")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )
