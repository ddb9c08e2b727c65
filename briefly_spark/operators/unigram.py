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
    early_stop: bool = True,
) -> DataFrame:
    """Train the unigram vocabulary: seed → (Viterbi counts → prune the
    multi-char tail to ``prune_frac`` of its size) until the vocabulary
    fits ``vocab_size`` — Kudo's prune loop with hard-EM counts.  Single
    characters are never pruned and don't count against the budget
    decisions' ordering (they rank by count like everything else but are
    exempt from dropping).  Returns (piece, count, score_fp, is_char)
    where ``score_fp`` is the final integer micro-nat log-prob.

    ``early_stop=False`` runs EXACTLY ``max_rounds`` EM rounds with no
    data-dependent break — the mode the q148 oracle gates, so the
    unrolled SQL mirror (:func:`sql_unigram_em`) replays a statically
    known number of rounds.

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
            if early_stop and (len(vocab) <= vocab_size or not multi):
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


def _sql_viterbi_unroll(
    tag: str,
    words_cte: str,
    scores_cte: str,
    *,
    max_word_len: int,
    max_piece_len: int,
    with_pieces: bool,
) -> tuple[list[str], str]:
    """Statically unrolled Viterbi DP as DuckDB CTEs — the SQL twin of
    :func:`viterbi_segment`, one CTE per word position.

    ``d{tag}_i`` holds, per word of length >= i, the best path over
    word[:i] as a struct ``st`` (sc = integer micro-nat score, np = piece
    count, ps = piece list when ``with_pieces``).  Candidates at position
    i come from positions j in [i-L, i): one UNION ALL arm per j, joined
    against ``scores_cte`` on the connecting substring.  The argmax key
    replicates the Python tuple compare (score, -np, -j) exactly:
    ``key = sc*1024 - np*32 - j`` — integer score deltas are >= 1, so the
    *1024 separation dominates the np*32 + j tie terms (< 1024; requires
    max_word_len < 32, asserted).  Ties are impossible: j is distinct
    across arms and in the key's low bits.

    Returns (cte_definitions, final_cte_name) where the final CTE
    ``seg{tag}`` maps each word (length 1..max_word_len) to its best
    st."""
    assert max_word_len < 32, "key encoding packs np/j into 10 bits"
    ctes: list[str] = []
    zero_ps = ", 'ps': CAST([] AS VARCHAR[])" if with_pieces else ""
    ctes.append(
        f"d{tag}_0 AS MATERIALIZED (SELECT word, "
        f"{{'sc': CAST(0 AS BIGINT), 'np': CAST(0 AS BIGINT){zero_ps}}} AS st "
        f"FROM {words_cte})"
    )
    for i in range(1, max_word_len + 1):
        arms = []
        for j in range(max(0, i - max_piece_len), i):
            piece = f"substr(d.word, {j + 1}, {i - j})"
            ps = (
                f", 'ps': list_append(d.st.ps, {piece})" if with_pieces else ""
            )
            arms.append(
                f"SELECT d.word, "
                f"{{'sc': d.st.sc + p.s, 'np': d.st.np + 1{ps}}} AS cand, "
                f"(d.st.sc + p.s) * 1024 - (d.st.np + 1) * 32 - {j} AS key "
                f"FROM d{tag}_{j} d JOIN {scores_cte} p ON p.piece = {piece} "
                f"WHERE length(d.word) >= {i}"
            )
        union = "\n    UNION ALL\n    ".join(arms)
        ctes.append(
            f"d{tag}_{i} AS MATERIALIZED (\n"
            f"  SELECT word, max_by(cand, key) AS st FROM (\n    {union}\n"
            f"  ) GROUP BY word)"
        )
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT word, st FROM d{tag}_{i} WHERE length(word) = {i}"
        for i in range(1, max_word_len + 1)
    )
    ctes.append(f"seg{tag} AS MATERIALIZED (\n    {finals})")
    return ctes, f"seg{tag}"


def _sql_scores(tag: str, vocab_cte: str) -> list[str]:
    """CTEs computing integer micro-nat scores from a (piece, count)
    vocabulary CTE — the SQL twin of :func:`piece_scores_fp`, on the
    staged det_ln (numerics.det_ln_items, bit-identical across engines)."""
    from briefly_spark.numerics import det_ln_items

    ln_t = ", ".join(det_ln_items("t", "ln_t", "duckdb"))
    ln_c = ", ".join(det_ln_items("count", "ln_c", "duckdb"))
    return [
        f"tot{tag} AS MATERIALIZED (SELECT {ln_t} FROM "
        f"(SELECT CAST(sum(count) AS BIGINT) AS t FROM {vocab_cte}))",
        f"sc{tag} AS MATERIALIZED (SELECT piece, "
        f"CAST(floor((ln_c - (SELECT ln_t FROM tot{tag})) * 1000000.0) AS BIGINT)"
        f" AS s FROM (SELECT piece, {ln_c} FROM {vocab_cte}))",
    ]


def sql_unigram_em(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_size: int = 300,
    min_count: int = 2,
    vocab_size: int = 40,
    rounds: int = 3,
) -> str:
    """Full unrolled-EM DuckDB mirror of fixed-round unigram training +
    fertility encode — the q148 oracle (VERDICT r10 next-round #3).

    Replays, as ONE static SQL statement, exactly what the Spark side
    computes with ``unigram_train(..., early_stop=False)`` followed by
    ``unigram_encode(..., max_word_len=...)``:

      word freqs (length-capped) → seed (sql_seed_pieces logic) →
      rounds × (det_ln scores → unrolled-Viterbi counts → prune) →
      final scores → unrolled-Viterbi fertility per distinct word →
      per-document (n_words, n_pieces, fertility_fp)

    and emits both surfaces as one frame:
      part='piece': k=piece, v1=count, v2=score_fp, v3=is_char(0/1)
      part='doc':   k=doc_id, v1=n_words, v2=n_pieces, v3=fertility_fp

    Static-unroll requirements: a fixed round count (``early_stop=False``
    on the Spark side) and a fixed position bound (both sides drop words
    longer than ``max_word_len`` — the documented training cap).  Prune
    arithmetic is integer-exact in both engines: Python
    ``int(n * 0.75)`` == SQL ``(3*n)//4`` (0.75 is dyadic; the product is
    exact).  ``prune_frac`` is therefore fixed at 3/4 here."""
    w_cap = max_word_len
    parts: list[str] = [
        f"""WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                            x -> x <> '')) AS word
  FROM {table}
),
wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks
  WHERE length(word) <= {w_cap} GROUP BY word
),
subs AS (
  SELECT substr(wf.word, CAST(i.i AS INT), CAST(l.l AS INT)) AS piece, wf.freq
  FROM wf,
       LATERAL (SELECT unnest(range(1, length(wf.word) + 1)) AS i) i,
       LATERAL (SELECT unnest(range(1, least({max_piece_len},
                       length(wf.word) - i.i + 1) + 1)) AS l) l
),
pc AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS count FROM subs GROUP BY piece),
v0 AS MATERIALIZED (
  SELECT piece, count FROM pc WHERE length(piece) = 1
  UNION ALL
  SELECT piece, count FROM (
    SELECT piece, count FROM pc WHERE length(piece) > 1 AND count >= {min_count}
    ORDER BY count DESC, piece ASC LIMIT {seed_size}))"""
    ]
    for k in range(1, rounds + 1):
        parts.extend(_sql_scores(str(k), f"v{k - 1}"))
        dp, seg = _sql_viterbi_unroll(
            f"r{k}",
            "wf",
            f"sc{k}",
            max_word_len=w_cap,
            max_piece_len=max_piece_len,
            with_pieces=True,
        )
        parts.extend(dp)
        parts.append(
            f"""cnt{k} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS count
  FROM (SELECT unnest(s.st.ps) AS piece, w.freq
        FROM {seg} s JOIN wf w USING (word))
  GROUP BY piece)"""
        )
        parts.append(
            f"""ch{k} AS MATERIALIZED (
  SELECT v.piece, coalesce(c.count, v.count) AS count
  FROM v{k - 1} v LEFT JOIN cnt{k} c USING (piece)
  WHERE length(v.piece) = 1)"""
        )
        parts.append(
            f"mu{k} AS MATERIALIZED (SELECT piece, count FROM cnt{k} "
            f"WHERE length(piece) > 1)"
        )
        parts.append(
            f"""keep{k} AS MATERIALIZED (
  SELECT CASE WHEN nm > budget THEN greatest(budget, (3 * nm) // 4)
              ELSE nm END AS kp
  FROM (SELECT (SELECT count(*) FROM mu{k}) AS nm,
               greatest({vocab_size} - (SELECT count(*) FROM ch{k}), 0)
                 AS budget))"""
        )
        parts.append(
            f"""v{k} AS MATERIALIZED (
  SELECT piece, count FROM ch{k}
  UNION ALL
  SELECT piece, count FROM (
    SELECT piece, count,
           row_number() OVER (ORDER BY count DESC, piece ASC) AS rn
    FROM mu{k})
  WHERE rn <= (SELECT kp FROM keep{k}))"""
        )
    parts.extend(_sql_scores("F", f"v{rounds}"))
    dp, seg = _sql_viterbi_unroll(
        "F",
        "wf",
        "scF",
        max_word_len=w_cap,
        max_piece_len=max_piece_len,
        with_pieces=False,
    )
    parts.extend(dp)
    parts.append(
        f"""npw AS MATERIALIZED (
  SELECT word, st.np AS np FROM {seg})"""
    )
    parts.append(
        f"""dtoks AS (
  SELECT k, word FROM (
    SELECT {id_col} AS k,
           unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                              x -> x <> '')) AS word
    FROM {table})
  WHERE length(word) <= {w_cap}),
docagg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(np) AS BIGINT) AS n_pieces
  FROM dtoks JOIN npw USING (word) GROUP BY k)"""
    )
    body = f"""SELECT 'piece' AS part, v.piece AS k, v.count AS v1, s.s AS v2,
       CAST(CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END AS BIGINT) AS v3
FROM v{rounds} v JOIN scF s USING (piece)
UNION ALL
SELECT 'doc' AS part, CAST(k AS VARCHAR) AS k, n_words AS v1, n_pieces AS v2,
       CAST(floor(n_pieces * 10000 / n_words) AS BIGINT) AS v3
FROM docagg"""
    return ",\n".join(parts) + "\n" + body


def unigram_encode(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_piece_len: int = 6,
    max_word_len: int | None = None,
) -> DataFrame:
    """Per-document token statistics under a trained unigram vocabulary —
    (id, n_words, n_pieces, fertility_fp) with fertility = pieces/word at
    RATIO-scale fixed point, q126's surface for the other tokenizer.

    ``max_word_len`` drops tokens longer than the cap from BOTH the word
    frame and the per-doc counts — the same documented training cap the
    q148 oracle applies (a static Viterbi unroll needs a static position
    bound; SentencePiece applies the same kind of length cap).

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
    if max_word_len is not None:
        corpus_words = corpus_words.filter(F.length("word") <= max_word_len)
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
