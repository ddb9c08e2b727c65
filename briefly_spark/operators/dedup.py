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
    """Distinct word n-gram shingles of a text column (native).

    NOTE: ``col`` is referenced n+1 times inside the gram lambda; pass an
    already-materialized *array attribute* via :func:`with_shingles` in
    query plans — passing the raw split expression re-tokenizes the text
    once per n-gram element (interpreted lambdas have no CSE)."""
    words = F.split(col, r"\s+")
    return ngrams_of_words(words, n)


def ngrams_of_words(words: Column, n: int = 3) -> Column:
    # CAREFUL: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty —
    # a doc with fewer than n words must yield an empty index list, not an
    # out-of-bounds element_at crash.
    last = F.size(words) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def with_shingles(df: DataFrame, text_col: str, n: int = 3, out: str = "shingles") -> DataFrame:
    """Plan-safe shingling: tokenize ONCE into a staged column, then build
    n-grams off the attribute.  The words column is referenced n+1 times by
    the gram expression, which blocks CollapseProject from re-inlining the
    split — per-row cost drops from O(grams × tokenize) to O(tokenize)."""
    staged = df.withColumn("__words", F.split(F.col(text_col), r"\s+"))
    return staged.withColumn(out, ngrams_of_words(F.col("__words"), n)).drop("__words")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays.

    |A∪B| is computed as |A|+|B|−|A∩B| (exact for sets) instead of
    materializing ``array_union`` — on a quadratic verify stage the union
    allocation doubles per-pair cost for no information."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    block_cols: tuple[str, ...] = (),
    shingles_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted index — the scalable form
    of the quadratic baseline (replaces raw_articles.py:44-96's set-based
    dedup idea with content similarity).

    Instead of a blocked cartesian join with a per-pair
    ``array_intersect`` (O(pairs × |shingles|) array work on every pair,
    including the overwhelming majority sharing nothing), explode each
    document's *distinct* shingles into postings and equi-join postings on
    ``(shingle, *block_cols)``: only pairs that actually share a shingle
    are ever generated, ``|A∩B|`` falls out of a count aggregation (all
    whole-stage codegen, map-side partial agg), and
    ``|A∪B| = |A|+|B|−|A∩B|`` needs no union materialization.  At the
    100 TB design point the shuffle is on the shingle key — bounded by
    corpus token count, not doc-pair count; hot shingles (boilerplate) are
    the skew axis and split by AQE skew-join.

    Returns ``(id_a, id_b, jac)`` with ``jac >= threshold`` (untruncated;
    callers round for hash-stable output).
    """
    # size-ratio prune: jac ≤ min(sa,sb)/max(sa,sb), so pairs whose size
    # ratio is below the threshold can never qualify — drop them before the
    # count aggregation (exact, not approximate).
    ratio_prune = F.least(F.col("a.sz"), F.col("b.sz")) >= F.greatest(
        F.col("a.sz"), F.col("b.sz")
    ) * F.lit(threshold)
    inter = _blocked_pair_counts(
        df, id_col, text_col, n, block_cols, extra_cond=ratio_prune,
        shingles_col=shingles_col,
    )
    jac = F.col("inter").cast("double") / (F.col("sa") + F.col("sb") - F.col("inter"))
    return inter.select("id_a", "id_b", jac.alias("jac")).filter(F.col("jac") >= threshold)


def _blocked_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    block_cols: tuple[str, ...],
    extra_cond: Column | None = None,
    shingles_col: str | None = None,
) -> DataFrame:
    """Shared inverted-index pair scaffolding for the shingle-overlap
    family: explode distinct shingles into postings, equi-join on
    ``(shingle, *block_cols)`` with ``id_a < id_b`` (plus the caller's
    optional per-pair prune on ``a.sz``/``b.sz``), and count-aggregate the
    intersection.  Returns ``(id_a, id_b, inter, sa, sb)`` — the one spot
    tokenization/blocking changes must be made for BOTH Jaccard and
    containment scoring.

    ``shingles_col`` short-circuits the internal shingling with a caller
    -staged (typically persisted) shingle array — the sharing hook for
    queries running several shingle-space legs over one corpus (q122's
    three sections re-shingled the corpus once per leg without it)."""
    if shingles_col is not None:
        sh = df.withColumnRenamed(shingles_col, "shingles")
    else:
        sh = with_shingles(df, text_col, n)
    post = sh.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.size("shingles").alias("sz"),
        F.explode("shingles").alias("s"),
    )
    a, b = post.alias("a"), post.alias("b")
    cond = F.col("a.s") == F.col("b.s")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (F.col("a.id") < F.col("b.id"))
    if extra_cond is not None:
        cond = cond & extra_cond
    return (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("a.sz").alias("sa"),
            F.max("b.sz").alias("sb"),
        )
    )


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_fp: int = 8000,
    block_cols: tuple[str, ...] = (),
    shingles_col: str | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs — |A∩B|/|A| and |A∩B|/|B| —
    the subset-duplicate detector symmetric Jaccard misses: a short
    article wholly quoted inside a long roundup has containment ≈ 1 but
    Jaccard ≈ |A|/|B| ≈ 0 (Broder's resemblance-vs-containment
    distinction; the Lee et al. 2022 sub-document dedup motivation at
    document granularity).

    Same inverted-index discipline as :func:`ngram_jaccard_pairs` — only
    pairs sharing ≥1 shingle are generated, |A∩B| is a count aggregation
    on the (shingle, *block_cols) equi-join — but WITHOUT the size-ratio
    prune: that prune is Jaccard-specific and would drop exactly the
    asymmetric pairs this operator exists to find.  Containment is an
    integer fixed-point ``(inter · 10⁴) div |A|`` (no doubles anywhere),
    so the scores are engine-exact by construction.

    Returns ``(id_a, id_b, inter, sa, sb, cont_a_fp, cont_b_fp)`` with
    ``greatest(cont_a_fp, cont_b_fp) >= threshold_fp``.
    """
    inter = _blocked_pair_counts(
        df, id_col, text_col, n, block_cols, shingles_col=shingles_col
    )
    scored = inter.select(
        "id_a",
        "id_b",
        "inter",
        F.col("sa").cast("long").alias("sa"),
        F.col("sb").cast("long").alias("sb"),
        F.expr("(inter * 10000) div sa").alias("cont_a_fp"),
        F.expr("(inter * 10000) div sb").alias("cont_b_fp"),
    )
    return scored.filter(
        F.greatest(F.col("cont_a_fp"), F.col("cont_b_fp")) >= threshold_fp
    )


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
def minhash_signature(hashes: Column, k: int = 8) -> Column:
    """k-element signature over pre-hashed shingles: sig[i] = min over
    shingles of md5(shingle)[4i+1 .. 4i+4] — k independent 16-bit hash
    families from ONE digest per shingle (k·4 ≤ 32 hex chars), with
    lexicographic-min hex strings portable across engines.

    Lambda form for tests/small inputs ONLY.  In plans use
    :func:`minhash_signatures_exploded`: staged projections do NOT protect
    this expression — CollapseProject re-inlines single-reference aliases,
    after which the inner lambda re-evaluates the entire upstream chain
    (shingling + hashing) once per signature element.

    Empty-shingle divergence (VERIFIED): for a row whose shingle array is
    empty (an empty/whitespace-only document) this form emits a signature of
    k nulls — and because concat_ws skips nulls, band_keys turns that into
    the CONSTANT md5('') key, so all empty docs band together and emit
    candidate pairs.  The exploded form emits no row at all (explode of an
    empty array), so empty docs produce no pairs.  The exploded behavior is
    the intended semantics (nothing shingles ⇒ nothing to compare); filter
    size(shingles) == 0 upstream when using THIS form outside tests."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(hashes, lambda h: F.substring(h, i * 4 + 1, 4))),
    )


def minhash_signatures_exploded(
    df: DataFrame, id_col: str, shingle_col: str, k: int = 8
) -> DataFrame:
    """MinHash signatures via explode + grouped min — the plan-safe form.

    explode shingles → one md5 per shingle (CSE'd codegen projection) → k
    substring slices → groupBy(id) min per slice → re-assemble the
    signature array.  Pure whole-stage codegen with a map-side partial min,
    so the shuffle is O(ids × k), independent of shingle count — and no
    optimizer rule can turn it back into per-element re-evaluation.
    Returns (id, sig)."""
    ex = df.select(F.col(id_col).alias("id"), F.explode(F.col(shingle_col)).alias("s"))
    h = F.md5("s")
    slices = ex.select(
        "id", *[F.substring(h, i * 4 + 1, 4).alias(f"m{i}") for i in range(k)]
    )
    mins = slices.groupBy("id").agg(*[F.min(f"m{i}").alias(f"m{i}") for i in range(k)])
    return mins.select("id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


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
    # Signatures via explode + grouped min (plan-safe codegen; see
    # minhash_signatures_exploded).  Band join on (band, key, id) ONLY —
    # the shingle arrays must not ride through the ×bands explode and its
    # shuffle (at 100 TB that multiplies the shuffle payload by the feature
    # size); they're re-attached to the small candidate set afterwards by
    # two id-joins.
    signed = minhash_signatures_exploded(df, id_col, shingle_col, k)
    banded = signed.select(
        "id", F.posexplode(band_keys(F.col("sig"), bands, rows)).alias("band", "key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(F.col(id_col).alias("id"), F.col(shingle_col).alias("shingles"))
    return (
        cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .withColumnRenamed("shingles", "shingles_a")
        .join(sh.withColumnRenamed("id", "id_b"), "id_b")
        .withColumnRenamed("shingles", "shingles_b")
        .select("id_a", "id_b", "shingles_a", "shingles_b")
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

    shingled = with_shingles(
        df.select(F.col(id_col).alias("id"), F.col(text_col)), text_col, n, out="sh"
    ).select("id", "sh")
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


def simhash_exploded(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash via explode + grouped vote sums — the fast/scale path.

    The array-lambda form is interpreted (no codegen for higher-order
    functions); this form is pure whole-stage codegen: explode tokens →
    native nibble extraction (md5 CSE'd within the projection) → one
    partial-agg shuffle summing ``bits`` vote columns → bit-string
    assembly.  Identical output to :func:`simhash_bits` (documents with
    zero tokens are dropped rather than fingerprinted as all-zeros).
    Returns (id_col, simhash)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")).alias("tok"),
    )
    h = F.md5("tok")
    nib = [F.instr(F.lit(HEX), F.substring(h, j + 1, 1)) - 1 for j in range(bits // 4)]
    votes = toks.select(
        F.col(id_col),
        *[
            (2 * (F.floor(nib[b // 4] / float(2 ** (3 - b % 4))) % 2) - 1)
            .cast("long")
            .alias(f"v{b}")
            for b in range(bits)
        ],
    )
    sums = votes.groupBy(id_col).agg(*[F.sum(f"v{b}").alias(f"s{b}") for b in range(bits)])
    bitstr = F.concat(
        *[F.when(F.col(f"s{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)]
    )
    return sums.select(F.col(id_col), bitstr.alias("simhash"))


# ---------------------------------------------------------------------------
# cluster resolution — connected components over near-dup pairs
# ---------------------------------------------------------------------------
def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
    method: str = "min",
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: every node gets
    ``component`` = the smallest id reachable over the (undirected) edge
    set, so one deterministic survivor per cluster (``component == id``)
    and singletons label themselves.  This is the step a curation pipeline
    runs after :func:`minhash_dedup_pairs` — pairs alone can't answer
    "which copy do we keep" when duplicates chain A~B~C.

    Min-label propagation as an iterative DataFrame loop — the one operator
    class that is legitimately driver-looped: each round is ONE shuffle
    (labels join the symmetrized edges, per-node min aggregate) over data
    that never leaves the cluster; the driver sees only a scalar
    changed-count per round.  ``localCheckpoint`` truncates lineage every
    round so the plan stays O(1) deep instead of O(iters).

    Two propagation strategies, selected by ``method``:

    - ``"min"`` (default): min-label propagation, O(graph diameter) rounds.
      Near-dup graphs are unions of quasi-cliques (duplicates of one
      document all pair with each other), so the diameter is small and
      this converges in 2–3 rounds with the direct-neighbor seed below.
    - ``"star"``: alternating large-star/small-star edge contraction
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SoCC'14) — O(log n) rounds even on adversarial chain-shaped
      components where min-propagation needs O(n) rounds.  Same per-round
      cost shape (two groupBy-min shuffles over the edge set); the edge
      set itself shrinks toward stars, so late rounds are cheap.  Use at
      100 TB when component shape is unknown.

    Non-convergence within ``max_iters`` raises rather than returning
    silently-partial labels.

    Only edge-INCIDENT vertices ride the loop: in a deduplicated corpus the
    overwhelming majority of documents touch no near-dup pair, and pushing
    them through every round would multiply the per-round shuffle by
    |V|/|V_incident| for rows whose label never changes.  Singletons get
    their identity label by a final left join against ``nodes``."""
    if method not in ("min", "star"):
        raise ValueError(f"method must be 'min' or 'star', got {method!r}")
    if method == "star":
        converged = _star_contraction(edges, src_col, dst_col, max_iters)
    else:
        sym = edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        ).unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        # the edge set joins into EVERY round — materialize once or the whole
        # upstream pair-generation pipeline re-runs per iteration
        sym = sym.persist()
        # seed each vertex with min(self, direct neighbors) — one aggregation
        # that runs the first propagation round for free, so clique-shaped dup
        # clusters (the common case) converge on the confirmation round
        labels = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("lbl"))
        try:
            converged = _propagate_min(sym, labels, max_iters)
        finally:
            sym.unpersist()
    return (
        nodes.select(F.col(id_col).alias("u"))
        .join(converged, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce(F.col("lbl"), F.col("u")).alias("component"),
        )
    )


def _star_contraction(
    edges: DataFrame, src_col: str, dst_col: str, max_iters: int
) -> DataFrame:
    """Alternating large-star/small-star contraction to a star forest.

    Invariant maintained between rounds: ``e`` is the canonical edge set
    oriented hi→lo (``u > v``), distinct, no self-loops.  One round:

    - large-star (on the symmetrized set): every node ``u`` connects its
      STRICTLY LARGER neighbors to ``m = min(N(u) ∪ {u})`` — long chains
      halve because each node's big side re-attaches to its local min.
    - small-star (on hi→lo edges): every node ``u`` re-attaches itself and
      all its smaller neighbors to ``m = min(N(u))`` — flattens the
      two-level trees large-star leaves behind.

    Both emit edges ``(x, m)`` with ``x > m``, so orientation is preserved
    for free.  At the fixpoint the edge set is a star forest centered at
    component minimums; labels read off as ``min(v) per u``.  Convergence
    check is an anti-join count (new edges not in the old set) — rows
    only, never collected."""
    e = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iters):
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m(u) over the full neighborhood incl. self
        ls_min = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
        ls = (
            sym.join(ls_min, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges already hi→lo; m(u) = min smaller neighbor
        ss_min = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(ss_min, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(ss_min.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        n_new = ss.join(e, ["u", "v"], "left_anti").count()
        old = e
        e = ss
        if n_new == 0 and old.join(ss, ["u", "v"], "left_anti").isEmpty():
            return e.groupBy("u").agg(F.min("v").alias("lbl"))
    raise RuntimeError(
        f"star contraction did not converge in {max_iters} rounds "
        "(expected O(log n)); raise max_iters"
    )


def _propagate_min(sym: DataFrame, labels: DataFrame, max_iters: int) -> DataFrame:
    for _ in range(max_iters):
        nb_min = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("nlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("nlbl").alias("nmin"))
        )
        stepped = (
            labels.join(nb_min, "u", "left")
            .select(
                "u",
                "lbl",
                F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
            )
            .localCheckpoint()
        )
        n_changed = stepped.filter(F.col("new_lbl") < F.col("lbl")).count()
        labels = stepped.select("u", F.col("new_lbl").alias("lbl"))
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "the graph has a longer-than-expected chain — raise max_iters or "
        "use the large-star/small-star variant"
    )


# ---------------------------------------------------------------------------
# X145 — incremental near-dup admission against a MinHash band registry
# ---------------------------------------------------------------------------
def neardup_incremental(
    batch: DataFrame,
    band_registry: DataFrame,
    sig_registry: DataFrame,
    *,
    id_col: str,
    text_col: str,
    batch_id: int,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    min_agree: int = 6,
    materialize: str = "local_checkpoint",
    persisted_out: list | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Admit a micro-batch against the near-dup HISTORY without ever
    reprocessing it — the MinHash twin of the exact-substring claims
    registry (curation.py X101): the registry holds only the banded
    inverted index (batch_id, band, key, id) plus one signature row per
    admitted doc, so checking a new batch against 100 TB of absorbed
    corpus is a band-key equi-join + a candidate-bounded signature
    verify, never a scan of history.

    Semantics (deterministic, order-explicit):

    - a doc is rejected as ``history`` when it shares a band bucket with
      an ADMITTED doc from an earlier batch and their signatures agree on
      ≥ ``min_agree`` of ``k`` components (the MinHash Jaccard estimate,
      kept integer-exact as a component count);
    - a doc is rejected as ``batch`` when a SMALLER-id doc in the same
      batch verifies against it — min-dominates, regardless of the
      smaller doc's own fate (no transitive chains: this is the
      arrival-order contract, pinned against a pure-Python simulator);
    - ``dup_of`` is the minimum verified partner across both sources;
    - docs that produce no shingles (< n words) are admitted but NOT
      indexed — nothing shingles ⇒ nothing to compare (the documented
      empty-shingle semantics of minhash_signatures_exploded);
    - only ADMITTED docs' bands/signatures enter the registry.  That
      closes the crash-replay window: admitted docs never verify against
      each other (any verified pair would have rejected its larger id),
      so replaying a batch whose registry merge already landed reproduces
      byte-identical verdicts (the ``old_id != id`` self-guard plus
      group-replace on batch_id).

    Returns (admitted, band_delta, sig_delta, rejects): admitted keeps the
    batch's full schema; deltas carry ``batch_id`` for group-replace;
    rejects is (id, dup_of, source).

    ``materialize`` picks the boundary for the internally-reused frames
    (signatures / bands / rejects, each referenced by several join arms):

    - ``"local_checkpoint"`` (default): fastest — blocks are stored
      executor-side and lineage is TRUNCATED, so **any executor loss
      makes the run unrecoverable and fails the job** (ADVICE r13: the
      blocks are non-replicated).  Right for bounded batch/bench runs
      where a retry is cheap.
    - ``"persist"``: MEMORY_AND_DISK cache with lineage kept — an
      executor loss recomputes the lost partitions instead of failing.
      Right for production-style foreachBatch sinks (neardup_stream)
      and long multi-batch drains; costs lineage-tracking overhead and
      a re-analysis of the (cheap, batch-bounded) upstream plan on
      recompute.  Pass ``persisted_out`` (a list) to receive the
      persisted internals EXPLICITLY: unpersist them once the four
      returned frames are materialized/consumed — Spark's CacheManager
      holds cache entries until explicit unpersist, so skipping this
      leaks blocks per call on a long drain (neardup_stream releases
      them in a finally).  An out-param, not an attribute on a returned
      frame: any re-bind (.filter/.localCheckpoint) would silently drop
      an attribute and re-open the leak (review r14).
    """
    if materialize not in ("local_checkpoint", "persist"):
        raise ValueError(
            f"neardup_incremental: materialize must be 'local_checkpoint' "
            f"or 'persist', got {materialize!r}"
        )
    if materialize == "persist" and persisted_out is None:
        # ADVICE r14 #1: without the out-param the three persisted
        # handles are unreachable and every call on a long drain leaks
        # MEMORY_AND_DISK cache entries — the exact failure the
        # out-param exists to prevent.  Refuse the pairing outright.
        raise ValueError(
            "neardup_incremental: materialize='persist' requires "
            "persisted_out (a list) so the caller can unpersist the "
            "internal frames — omitting it leaks cache entries per call"
        )
    persisted: list[DataFrame] = []

    def _bound(df: DataFrame) -> DataFrame:
        """Materialization boundary per the ``materialize`` contract."""
        if materialize == "persist":
            from pyspark import StorageLevel

            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()  # eager, like localCheckpoint(eager=True)
            persisted.append(df)
            return df
        return df.localCheckpoint(eager=True)

    if not (0 < min_agree <= k) or k % bands or not (0 < k <= 8):
        # k ≤ 8: each signature component is 4 hex chars of ONE md5 digest
        # (k·4 ≤ 32) — beyond that the tail components are empty strings
        # for every doc, inflating agreement and collapsing band keys
        raise ValueError(
            f"neardup_incremental: need 0 < min_agree <= k <= 8 and bands | k, "
            f"got k={k}, bands={bands}, min_agree={min_agree}"
        )
    rows = k // bands
    shingled = with_shingles(
        batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        "__t",
        n,
    )
    # ``signed`` and ``banded`` are each referenced by several join arms
    # below (history verify, in-batch candidate self-join, the registry
    # deltas); without a materialization boundary every arm replays the
    # whole shingle→md5→minhash pipeline — measured 10× on q31's r13
    # admission graft, where the "batch" is corpus-sized.  Both frames
    # are batch-bounded (ids × k signature chars / ids × bands rows), so
    # the q128 localCheckpoint idiom applies: compute once, store blocks
    # executor-side, truncate lineage.
    signed = _bound(minhash_signatures_exploded(shingled, "id", "shingles", k))
    banded = _bound(
        signed.select(
            "id",
            F.posexplode(band_keys(F.col("sig"), bands, rows)).alias("band", "key"),
        )
    )

    def _agree(a, b):
        return F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v))

    hist_cand = (
        banded.join(
            band_registry.select(
                "band", "key", F.col("id").alias("old_id")
            ),
            ["band", "key"],
        )
        .filter(F.col("old_id") != F.col("id"))
        .select("id", "old_id")
        .distinct()
    )
    hist_ver = (
        hist_cand.join(signed, "id")
        .join(
            sig_registry.select(F.col("id").alias("old_id"), F.col("sig").alias("__os")),
            "old_id",
        )
        .filter(_agree(F.col("sig"), F.col("__os")) >= min_agree)
        .select("id", F.col("old_id").alias("dup_of"), F.lit("history").alias("source"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    batch_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("small_id"), F.col("b.id").alias("id"))
        .distinct()
    )
    batch_ver = (
        batch_cand.join(signed, "id")
        .join(
            signed.select(F.col("id").alias("small_id"), F.col("sig").alias("__ss")),
            "small_id",
        )
        .filter(_agree(F.col("sig"), F.col("__ss")) >= min_agree)
        .select("id", F.col("small_id").alias("dup_of"), F.lit("batch").alias("source"))
    )
    # rejects feeds three consumers (admitted anti-join, keep_ids
    # anti-join, the returned verdicts) — same materialization argument;
    # it is candidate-bounded, far smaller than the batch
    rejects = _bound(
        hist_ver.unionByName(batch_ver)
        .groupBy("id")
        .agg(F.min(F.struct("dup_of", "source")).alias("__r"))
        .select("id", F.col("__r.dup_of").alias("dup_of"), F.col("__r.source").alias("source"))
    )
    admitted = batch.join(
        rejects.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    keep_ids = signed.join(rejects, "id", "left_anti").select("id")
    band_delta = banded.join(keep_ids, "id").select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"), "band", "key", "id"
    )
    sig_delta = signed.join(keep_ids, "id").select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"), "id", "sig"
    )
    # cache-release handles (persist mode only; empty otherwise —
    # localCheckpoint blocks are reclaimed by the ContextCleaner on GC)
    if persisted_out is not None:
        persisted_out.extend(persisted)
    return admitted, band_delta, sig_delta, rejects


def neardup_registry_compact(
    band_registry: DataFrame, sig_registry: DataFrame, *, into_batch_id: int = -1
) -> tuple[DataFrame, DataFrame]:
    """Fold grown registries into ONE sentinel block — exact (each
    admitted id owns its rows in exactly one batch block, so the fold is
    a batch-dimension drop, not a merge).  Same caveat as the other
    registry compactors: only compact batches whose replay window has
    passed; the negative sentinel cannot collide with foreachBatch ids."""
    bands = band_registry.select("band", "key", "id").distinct().select(
        F.lit(int(into_batch_id)).cast("long").alias("batch_id"), "band", "key", "id"
    )
    sigs = sig_registry.select("id", "sig").distinct().select(
        F.lit(int(into_batch_id)).cast("long").alias("batch_id"), "id", "sig"
    )
    return bands, sigs
