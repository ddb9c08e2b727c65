"""Deduplication operators for large-scale corpus curation.

Beyond the reference's key-based dedup (anti-join on url, SURVEY §2.3 P5),
a 100 TB training-data pipeline needs *content* dedup.  Five operators,
cheapest-first:

- :func:`exact_dedup`       — hash-groupBy on (normalized) content.
- :func:`minhash_signature` + :func:`lsh_candidate_pairs` — MinHash+LSH:
  shingle → k min-hashes → band → bucket join.  The only all-pairs-free
  near-dup path: candidate generation is a self-equi-join on band keys
  (shuffle on key, no O(n²)).
- :func:`simhash_bits`      — SimHash fingerprint as a native expression.
- :func:`jaccard`           — exact n-gram Jaccard verification for
  candidate pairs (the quadratic step, only ever applied *after* blocking).
- embedding cosine near-dup — see queries/dedup.py q34 (built from
  :mod:`briefly_spark.functions.vectors`).

Portability: hashes are md5 *hex strings* (identical in Spark and DuckDB);
MinHash takes the lexicographic min of ``md5(i || ':' || shingle)`` —
engine-independent, no integer-hash divergence.

Scale notes: signatures/fingerprints are pure per-row codegen (no UDF); the
LSH join shuffles on ``(band, key)`` — at 100 TB choose bands/rows so bucket
sizes stay bounded (b·r = k, threshold ≈ (1/b)^(1/r)); skewed buckets
(boilerplate docs) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (native)."""
    words = F.split(col, r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0)))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical content by md5, keep the minimum id as canonical
    (deterministic survivor policy — SURVEY §7.2 bans random choices).
    Returns (content_md5, keep_id, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col).alias("id"))
        .groupBy("content_md5")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """k-element signature: sig[i] = min over shingles of md5(i:shingle)
    (lexicographic min of hex strings — portable across engines)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """bands keys, each hashing `rows` consecutive signature elements."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws("|", *[F.element_at(sig, b * rows + r + 1) for r in range(rows)])
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame, id_col: str, shingle_col: str, *, k: int = 8, bands: int = 4
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) via banded MinHash.

    Plan shape: per-row signature (codegen) → posexplode to (band, key) →
    self-equi-join on (band, key) → distinct pairs.  The join is the only
    shuffle; no O(n²) stage exists anywhere."""
    rows = k // bands
    # Stage the signature in its own projection: higher-order lambdas have
    # no CSE, so inlining it into band_keys would recompute the k min-hash
    # passes once per band reference.
    signed = df.select(
        F.col(id_col).alias("id"),
        F.col(shingle_col).alias("shingles"),
        minhash_signature(F.col(shingle_col), k).alias("sig"),
    )
    banded = signed.select(
        "id",
        "shingles",
        F.posexplode(band_keys(F.col("sig"), bands, rows)).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("shingles_a"),
            F.col("b.shingles").alias("shingles_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → band-join candidates →
    exact-Jaccard verify ≥ threshold.  Returns (id_a, id_b, jac)."""
    from briefly_spark.numerics import trunc4

    shingled = df.select(F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("sh"))
    cands = lsh_candidate_pairs(shingled, "id", "sh", k=k, bands=bands)
    jac = jaccard(F.col("shingles_a"), F.col("shingles_b"))
    return (
        cands.withColumn("jac", trunc4(jac))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def token_hexvals(col: Column, bits: int = 32) -> Column:
    """Per-token md5 nibble values (array<array<int>>), the SimHash input.
    Materialize this in its own projection before :func:`simhash_from_hexvals`
    — lambdas have no CSE, so inlining it would re-hash every token once per
    fingerprint bit."""
    tokens = F.filter(F.split(col, r"\s+"), lambda w: w != "")
    return F.transform(
        tokens,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.lit(bits // 4)),
            lambda j: F.instr(F.lit(HEX), F.substring(F.md5(t), j, 1)) - 1,
        ),
    )


def simhash_from_hexvals(hexvals: Column, bits: int = 32) -> Column:
    """SimHash bit-string from materialized per-token nibble arrays:
    fingerprint bit = sign of the sum of per-token ±1 votes."""
    def bit_vote(b: Column) -> Column:
        hex_idx = F.floor(b / 4) + 1
        shift = F.pow(F.lit(2.0), F.lit(3) - b % 4)
        return F.aggregate(
            hexvals,
            F.lit(0),
            lambda acc, hv: acc
            + (2 * (F.floor(F.element_at(hv, hex_idx.cast("int")) / shift) % 2) - 1).cast("int"),
        )

    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda b: F.when(bit_vote(b) > 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


def simhash_bits(col: Column, bits: int = 32) -> Column:
    """Single-expression SimHash — convenience for tests/small inputs; in
    query plans stage :func:`token_hexvals` in its own projection first
    (see queries/dedup.py q32) to avoid per-bit re-hashing."""
    return simhash_from_hexvals(token_hexvals(col, bits), bits)
