"""Bounded-round byte-pair-encoding (BPE) vocabulary training — the
tokenizer-training leg of a training-data pipeline (Sennrich et al. 2016
merge rule, the scheme behind GPT-2/LLaMA-family tokenizers).

Reference parity: the reference repo ships pre-trained tokenizers with its
embedding models (utils/embedding/embedding_utils.py loads
sentence-transformers checkpoints whose BPE vocab was trained offline);
this module is the offline step expressed Spark-first, so the same
warehouse that curates the corpus can also train the tokenizer on it.

Scale design — everything after ONE corpus shuffle is vocabulary-sized:

- The corpus collapses first to the distinct-word frequency table (one
  tokenize + groupBy(word) shuffle — the identical discipline to the q88
  vocab build).  By Heaps' law that frame is ~10⁶–10⁷ rows at 100 TB,
  millions of times smaller than the corpus, and every BPE round operates
  on it alone.
- Each round = one pair-count partial aggregation over the word frame
  (map-side combinable, key space bounded by the live symbol vocabulary)
  + a TakeOrdered(1) for the argmax — the driver ever holds ONE row per
  round, like the k-means centroid collect (operators/graph.py).
- The merge application is a map-only string `replace` on the word frame;
  no UDF, no Python row loop.

Determinism — the whole pipeline is engine-exact, so the training run is
oracle-gated like any relational query:

- Words symbolize to a spaced string: ``' '`` + each char followed by two
  spaces + ``'</w> '`` (end-of-word marker).  Two-space separators with
  single-space pattern anchors make one standard leftmost
  non-overlapping ``replace(sym, ' a  b ', ' ab ')`` implement exactly
  the greedy left-to-right BPE merge — including back-to-back
  occurrences ("a b a b" → "ab ab"), which single-space separators would
  miss because the shared middle space can only be consumed once.
- Pair counts are integer sums; the argmax tie-breaks on
  (count DESC, lhs ASC, rhs ASC) under binary UTF-8 string order — both
  engines compare strings bytewise, so the chosen merge is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker symbol (its own token after the final character).
EOW = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table (word, freq) — lowercased whitespace
    tokens, the same tokenizer as the q88 vocab build."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def symbolize(words: DataFrame) -> DataFrame:
    """Add the spaced symbol string: ``' h  i  </w> '`` for word "hi".
    Single leading/trailing space, two spaces between symbols."""
    return words.withColumn(
        "sym",
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.col("word"), "(.)", "$1  "),
            F.lit(EOW + " "),
        ),
    )


def pair_counts(symframe: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts (lhs, rhs, c) over
    the current symbolization.  Partial-aggregates map-side; the key
    space is bounded by the live symbol vocabulary, never the corpus."""
    s = F.split(F.trim(F.col("sym")), "  ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("lhs"), F.element_at(s, i + 1).alias("rhs")
        ),
    )
    # guard: F.sequence descends when stop < start, so single-symbol rows
    # (impossible here — every word carries at least char + EOW) are
    # filtered rather than trusted.
    return (
        symframe.filter(F.size(s) >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").alias("c"))
    )


def apply_merge(symframe: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Map-only application of one merge rule: ``' a  b ' -> ' ab '``.
    Leftmost non-overlapping scan == greedy left-to-right BPE."""
    return symframe.withColumn(
        "sym",
        F.replace(
            F.col("sym"),
            F.lit(f" {lhs}  {rhs} "),
            F.lit(f" {lhs}{rhs} "),
        ),
    )


def bpe_train(
    spark: SparkSession, words: DataFrame, rounds: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Train ``rounds`` BPE merges over the (word, freq) frame.

    Returns (merges, symbolized): ``merges`` is the rounds-row frame
    (merge_rank, lhs, rhs, pair_freq) — the trained tokenizer — and
    ``symbolized`` the word frame under all merges (word, freq, sym),
    from which the wordpiece vocabulary reads off as the distinct
    symbols.  Driver state is ONE collected row per round.

    The initial symbolized frame is persisted only for the training loop
    and unpersisted HERE before returning (the caller never sees the
    cached handle — the returned ``symbolized`` is derived lineage, so a
    caller-side unpersist would silently leak the cache for the session);
    consuming ``symbolized`` afterwards replays the cheap map-only
    lineage."""
    base = symbolize(words).persist()
    base.count()  # materialize once; each round's lineage replays cheap map ops
    cur = base
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("c"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        merges.append((r, lhs, rhs, c))
        cur = apply_merge(cur, lhs, rhs)
    out = spark.createDataFrame(
        merges, schema="merge_rank BIGINT, lhs STRING, rhs STRING, pair_freq BIGINT"
    )
    base.unpersist()
    return out, cur


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder (test oracle): apply the merge list
    in order to one word, greedy left-to-right per merge."""
    syms = list(word) + [EOW]
    for lhs, rhs in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
