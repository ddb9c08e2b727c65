"""Decision-support join pack — the heavy multi-join / disjunctive /
share-of-total shapes a warehouse engine must plan well (TPC-H Q7/Q18/
Q19/Q11 forms over the driver tables), plus a two-pass distributed
heavy-hitters operator.

These exercise the optimizer paths the simpler §2 queries don't: a
5-table join with two roles of the same dimension (q16), a
having-filtered aggregate semi-joined back to its fact (q17), an
OR-of-conjunctions join predicate that must still prune and push down
(q18), and a global share-of-total filter whose grand total collapses to
one broadcast row (q19).  Reference parity: these generalize the
work-list + hydration joins the reference chains per-article
(get_relevant_articles.py, sensors/article_sensors.py) into set-oriented
plans.

Numerics: money measures use the fixed-point cents pattern
(numerics.fixed_sum) so every aggregate is an exact integer sum —
order-independent and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from briefly_spark.catalog import load_table, spread
from briefly_spark.operators.search import tokens_of
from briefly_spark.queries import register


# --------------------------------------------------------------------------
# q16 — bilateral volume shipping (TPC-H Q7 shape): lineitem ⋈ supplier ⋈
# orders ⋈ customer ⋈ nation×2, the same dimension joined in two roles.
# --------------------------------------------------------------------------
@register(
    "q16_volume_shipping",
    covers=("J1", "A4", "A8"),
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       count(*) AS n_lines,
       CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
         AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey  = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, ship_year
""",
)
def q16_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join with nation in two roles (supplier's and customer's).
    Plan discipline at 100 TB: every dimension (supplier, customer,
    nation×2) broadcasts — the ONLY shuffle is lineitem ⋈ orders on the
    orderkey, and the disjunctive nation filter applies map-side after
    the broadcast joins, so the fact table is scanned once and never
    re-partitioned by a dimension key.  (customer outgrows broadcast
    eventually; then it shuffles on custkey while nation still
    broadcasts — the hint below is on the genuinely-bounded dims.)"""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(pair | rpair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            ).alias("revenue_cents"),
        )
        .withColumn("ship_year", F.col("ship_year").cast("long"))
    )


# --------------------------------------------------------------------------
# q17 — large-volume orders (TPC-H Q18 shape): HAVING aggregate, joined
# back to orders + customer for hydration.
# --------------------------------------------------------------------------
@register(
    "q17_large_volume_orders",
    covers=("J3", "A3", "J6"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
       total_qty
FROM big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey  = c_custkey
""",
)
def q17_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-filtered fact aggregate hydrated by its dimensions.  The
    aggregate runs FIRST (partial map-side sums, one orderkey shuffle)
    and only the tiny surviving set joins orders — at 100 TB the big-order
    set is broadcastable by construction (it shrinks with the threshold),
    so the orders scan is filtered by a broadcast semi-join rather than
    shuffled.  l_quantity is integral, so the HAVING sum is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey", F.col("qty").cast("long").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# q18 — disjunctive-predicate join (TPC-H Q19 shape): OR of brand/size/
# quantity conjunctions across the join.
# --------------------------------------------------------------------------
@register(
    "q18_disjunctive_revenue",
    covers=("P3", "P4", "J1", "A8"),
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
       AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#10' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 5  AND 35)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 10 AND 50)
""",
)
def q18_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjunctions across a join: the classic predicate-pushdown
    trap.  Catalyst splits the disjunction into the common join key plus
    single-side residuals — the part side prunes to the three brands
    BEFORE the join (a broadcast, since the brand filter makes it tiny)
    and the quantity residual evaluates map-side post-join.  Naive
    engines evaluate the whole OR as a join filter and can't push
    anything."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#10")
            & F.col("p_size").between(10, 30)
            & qty.between(5, 35)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & qty.between(10, 50)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            ).alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# q19 — revenue concentration (TPC-H Q11 shape): per-part revenue share
# against the grand total.
# --------------------------------------------------------------------------
@register(
    "q19_revenue_concentration",
    covers=("A8", "W1"),
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
           AS part_cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(part_cents) AS BIGINT) AS total_cents,
               count(*) AS n_parts FROM per_part)
SELECT l_partkey, part_cents
FROM per_part, tot
WHERE part_cents * n_parts * 5 > total_cents * 7
""",
)
def q19_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total filter: parts carrying more than 1.4× the mean
    revenue share (share·n_parts > 7/5, integer cross-multiplied — no
    division anywhere, so the cut is engine-exact).  The grand total is a
    second aggregate OVER the per-part frame (|parts| rows,
    dimension-sized — never a second fact scan) collapsed to ONE row and
    broadcast back; at 100 TB the fact is scanned once, shuffled once on
    partkey.  Overflow headroom: total_cents·7 stays under 2⁶³ until
    ~1.3e16 total cents; the left side multiplies per-PART cents (≪
    total) by n_parts·5, same order of magnitude.

    The total is a 1-row aggregate OVER the per-part frame broadcast back
    onto it — NOT an unpartitioned window, which would drag the whole
    part dimension through one task (the part dimension grows with the
    fact at TPC-H scale, unlike a vocab frame): Spark's ReuseExchange
    serves both consumers from the single partkey shuffle, so the fact is
    still scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        ).alias("part_cents")
    )
    tot = per_part.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_cents") * F.col("n_parts") * 5 > F.col("total_cents") * 7
        )
        .select("l_partkey", "part_cents")
    )


# --------------------------------------------------------------------------
# q28 — distributed heavy hitters: per-partition Misra–Gries candidates,
# exact second pass over the (bounded) candidate set only.
# --------------------------------------------------------------------------
from briefly_spark.operators.frequency import mg_partition as _mg_partition  # noqa: E402


@register(
    "q28_heavy_hitters",
    covers=("A3", "A4"),
    oracle="""
WITH t AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM documents
),
c AS (SELECT term, count(*) AS freq FROM t GROUP BY term),
n AS (SELECT count(*) AS total FROM t)
SELECT term, freq FROM c, n WHERE freq * 100 >= total
""",
)
def q28_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms with frequency ≥ N/100, found WITHOUT a full-vocabulary
    shuffle: per-partition Misra–Gries summaries (k = 2·100 counters,
    Arrow-batched) are unioned and their merged candidate set — bounded
    by k·n_partitions whatever the vocabulary size — is broadcast into a
    semi-join that restricts the exact counting pass to candidates only.
    The MG guarantee (k ≥ 2/φ) makes the candidate set a superset of
    every true heavy hitter, so the final output is EXACT and independent
    of partitioning; only the intermediate candidate set varies.  At
    100 TB this replaces a |vocab|-key shuffle with a fixed-size one.
    The exact threshold compare is integer (freq·100 ≥ N).  Two corpus
    scans total: the MG pass carries N out in per-partition sentinel
    rows, so no count-only third scan exists."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    terms = docs.select(F.explode(tokens_of(F.col("text"))).alias("term"))
    mg = terms.mapInPandas(_mg_partition, schema="term string, cnt long")
    # bounded summary (≤ (k+1)·n_partitions rows) consumed by two
    # branches — persist it so the corpus MG pass runs once, not twice
    mg = mg.persist()
    candidates = mg.filter(F.col("term").isNotNull()).select("term").distinct()
    total = mg.filter(F.col("term").isNull()).agg(F.sum("cnt").alias("total"))
    return (
        terms.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * 100 >= F.col("total"))
        .select("term", "freq")
    )


# --------------------------------------------------------------------------
# q100 — waiting-suppliers (TPC-H Q21 shape): correlated EXISTS + NOT
# EXISTS against the same fact, on the spark.sql surface.
# --------------------------------------------------------------------------
_Q100_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


@register("q100_waiting_suppliers", covers=("J2", "J3", "A4"), oracle=_Q100_SQL)
def q100_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS on the same fact table (TPC-H Q21:
    the sole returning supplier in multi-supplier finished orders) —
    written on the ``spark.sql`` surface with the SAME text as the DuckDB
    oracle, the declarative contract both engines must satisfy.  Catalyst
    decorrelates the subqueries into a left-semi and a left-anti join on
    the orderkey; all three lineitem legs share the orderkey, so at
    100 TB they co-locate on one shuffle partitioning (or zero exchanges
    off a K6 orderkey-bucketed layout), and the supplier dim broadcasts.
    Counting is per supplier NAME — a partial-agg rollup after the
    joins."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q100_SQL)


# --------------------------------------------------------------------------
# q107 — term-pair association mining (document-level PMI).
# --------------------------------------------------------------------------
def _pmi_items(dialect: str) -> list[str]:
    """Staged PMI fixed-point score as lateral-alias SELECT items ending in
    ``… AS pmi_fp``: floor((det_ln(c_ab·N) − det_ln(c_a·c_b))·10⁴) as
    BIGINT.  One generator for both dialects — identical op order, so the
    score is bit-exact cross-engine; the staged form
    (numerics.det_ln_items) replaces the former ~3.5 KB hand-expanded
    det_ln constants (the q107 oracle-parse hotspot) with ~0.4 KB."""
    from briefly_spark.numerics import det_ln_items

    return [
        *det_ln_items("c_ab * n_docs", "__l_joint", dialect),
        *det_ln_items("c_a * c_b", "__l_indep", dialect),
        "CAST(floor(((__l_joint - __l_indep) * 10000.0)) AS BIGINT) AS pmi_fp",
    ]


@register(
    "q107_term_pmi",
    covers=("J4", "A3"),
    oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                             w -> w <> '')) AS term
  FROM documents
),
df AS (SELECT term, count(*) AS c FROM dt GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dt),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, count(*) AS c_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY t1, t2
),
scored AS (
  SELECT t1, t2, c_ab, {', '.join(_pmi_items('duckdb'))}
  FROM pairs
  JOIN (SELECT term AS t1, c AS c_a FROM df) USING (t1)
  JOIN (SELECT term AS t2, c AS c_b FROM df) USING (t2)
  CROSS JOIN n
  WHERE c_ab >= 20
)
SELECT t1, t2, c_ab, pmi_fp FROM scored
""",
)
def q107_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level pointwise mutual information for term pairs — the
    association-mining signal behind collocation detection and topic
    seeds.  PMI = ln(P(a,b)/(P(a)P(b))) = det_ln(c_ab·N) − det_ln(c_a·c_b)
    — both log arguments are INTEGERS, so the bit-reproducible det_ln
    applies directly and the fixed-point score is engine-exact (the same
    trick as BM25's idf).  Join discipline: co-occurrence pairs come from
    a per-document self-join of the DISTINCT doc-term postings — fan-out
    is Σ_d |terms_d|², bounded by capping per-doc vocabulary (top-tf
    terms) at scale, never |vocab|² — and the df/N frames broadcast back.
    The c_ab ≥ 20 support floor is the standard noise cut."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    dt = docs.select(
        "doc_id", F.explode(tokens_of(F.col("text"))).alias("term")
    ).distinct()
    dt = dt.persist()
    df_counts = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n = dt.agg(F.count_distinct("doc_id").alias("n_docs"))
    a = dt.select("doc_id", F.col("term").alias("t1"))
    b = dt.select("doc_id", F.col("term").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 20)
    )
    return (
        pairs.join(
            F.broadcast(df_counts.select(F.col("term").alias("t1"), F.col("c").alias("c_a"))), "t1"
        )
        .join(
            F.broadcast(df_counts.select(F.col("term").alias("t2"), F.col("c").alias("c_b"))), "t2"
        )
        .crossJoin(F.broadcast(n))
        .selectExpr("t1", "t2", "c_ab", *_pmi_items("spark"))
        .select("t1", "t2", "c_ab", "pmi_fp")
    )


# --------------------------------------------------------------------------
# q108 — source-similarity matrix (vocabulary Jaccard between domains).
# --------------------------------------------------------------------------
@register(
    "q108_source_similarity",
    covers=("J4", "A4"),
    oracle="""
WITH st AS (
  SELECT DISTINCT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                             w -> w <> '')) AS term
  FROM documents
),
sz AS (SELECT source, count(*) AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY src_a, src_b
)
SELECT src_a, src_b, n_common,
       CAST(floor(n_common * 10000.0 / (za.n + zb.n - n_common)) AS BIGINT)
         AS jaccard_fp
FROM inter
JOIN (SELECT source AS src_a, n FROM sz) za USING (src_a)
JOIN (SELECT source AS src_b, n FROM sz) zb USING (src_b)
""",
)
def q108_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every pair of sources — the
    domain-similarity matrix that drives mixture design (which domains
    are redundant?) and transfer checks.  The corpus collapses FIRST to
    the distinct (source, term) frame — |sources|·|vocab| rows at most,
    dimension-sized however big the corpus — and sources meet through a
    term equi-join on that frame (the inverted-index discipline), so no
    document row ever enters the pair computation.  Fixed-point Jaccard
    via exact integer |A∩B| and |A|+|B|−|A∩B|."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    st = docs.select(
        "source", F.explode(tokens_of(F.col("text"))).alias("term")
    ).distinct()
    st = st.persist()
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = st.select(F.col("source").alias("src_a"), "term")
    b = st.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))), "src_a"
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))), "src_b"
        )
        .select(
            "src_a", "src_b", "n_common",
            F.floor(
                F.col("n_common") * 10000.0 / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).cast("long").alias("jaccard_fp"),
        )
    )


# --------------------------------------------------------------------------
# q110 — positive-balance prospects without orders (TPC-H Q22 shape).
# --------------------------------------------------------------------------
@register(
    "q110_balance_prospects",
    covers=("P2", "J2", "A3"),
    oracle="""
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
seg AS (
  SELECT c_mktsegment, count(*) AS n_pos,
         CAST(sum(bal_cents) AS BIGINT) AS sum_pos_cents
  FROM cust WHERE bal_cents > 0 GROUP BY c_mktsegment
)
SELECT c_mktsegment, count(*) AS n_cust,
       CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
FROM cust
JOIN seg USING (c_mktsegment)
WHERE bal_cents * n_pos > sum_pos_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def q110_balance_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with an above-segment-average positive
    balance and no URGENT orders on file, rolled up per segment.  Two
    decorrelations in one query: the correlated scalar AVG subquery
    collapses to a segment-keyed aggregate that BROADCASTS back (5 rows),
    and NOT EXISTS becomes a left-anti join on the custkey — never a
    per-row probe — with the priority predicate pushed INTO the anti
    join's build side, pruning it at the scan.
    The "above average" filter is cross-multiplied into integers
    (bal·n_pos > sum_pos, all cents) so no engine ever divides — the
    predicate, and therefore the surviving row set, is engine-exact where
    a float AVG comparison would flip on 1-ulp differences.  At 100 TB
    the anti-join shuffles on custkey (or goes exchange-free off a K6
    custkey-bucketed layout); everything else is map-side."""
    cust = spread(load_table(spark, sf_dir, "customer")).select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    seg = (
        cust.filter(F.col("bal_cents") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum("bal_cents").alias("sum_pos_cents"),
        )
    )
    orders = (
        spread(load_table(spark, sf_dir, "orders"))
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    prospects = (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return prospects.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("bal_cents").alias("sum_bal_cents"),
    )


# --------------------------------------------------------------------------
# q111 — per-nation top-balance suppliers (TPC-H Q2 argmax shape).
# --------------------------------------------------------------------------
@register(
    "q111_nation_top_supplier",
    covers=("J1", "W1"),
    oracle="""
SELECT n_name, s_name,
       CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
FROM supplier s
JOIN nation ON s_nationkey = n_nationkey
WHERE round(s_acctbal * 100) =
      (SELECT max(round(s2.s_acctbal * 100)) FROM supplier s2
       WHERE s2.s_nationkey = s.s_nationkey)
""",
)
def q111_nation_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-argmax shape: the supplier(s) holding each
    nation's maximum account balance (ties kept — the oracle is the
    correlated scalar MAX subquery verbatim).  Decorrelation: the
    subquery becomes a nationkey-keyed MAX aggregate (≤ |nation| rows)
    that BROADCASTS back into an equi-join + filter — one pass over
    supplier, no per-row subquery, no window over the fact.  Balances
    compare as integer cents, so the tie set is engine-exact."""
    sup = spread(load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    mx = sup.groupBy("s_nationkey").agg(F.max("bal_cents").alias("max_cents"))
    nation = spread(load_table(spark, sf_dir, "nation"))
    return (
        sup.join(F.broadcast(mx), "s_nationkey")
        .filter(F.col("bal_cents") == F.col("max_cents"))
        .join(
            F.broadcast(nation),
            sup.s_nationkey == nation.n_nationkey,
        )
        .select("n_name", "s_name", "bal_cents")
    )


# --------------------------------------------------------------------------
# q117 — corpus drift matrix: smoothed unigram KL divergence per source pair.
# --------------------------------------------------------------------------
def _kl_contrib_items(dialect: str) -> list[str]:
    """Staged per-row KL contribution as lateral-alias SELECT items ending
    in ``… AS contrib``: ca · (fp(ca) + fp(nb) − fp(cb) − fp(na)) with
    fp(x) = CAST(floor(det_ln(x)·10⁴) AS BIGINT).  One generator for both
    dialects — identical op order (numerics.det_ln_items), ~10× smaller
    SQL than the inline det_ln expansion with bit-identical results."""
    from briefly_spark.numerics import det_ln_items

    legs = [("ca", "__l_ca"), ("nb", "__l_nb"), ("cb", "__l_cb"), ("na", "__l_na")]
    items: list[str] = []
    for expr, out in legs:
        items.extend(det_ln_items(expr, out, dialect))
    fp = lambda o: f"CAST(floor(({o}) * 10000.0) AS BIGINT)"  # noqa: E731
    items.append(
        f"(ca * ((({fp('__l_ca')}) + ({fp('__l_nb')})"
        f" - ({fp('__l_cb')}) - ({fp('__l_na')})))) AS contrib"
    )
    return items


def _q117_oracle() -> str:
    return f"""
WITH st AS MATERIALIZED (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                      w -> w <> '')) AS term
    FROM documents)
  GROUP BY source, term
),
v AS (SELECT count(DISTINCT term) AS n_terms FROM st),
srcs AS (SELECT DISTINCT source FROM st),
dense AS MATERIALIZED (
  SELECT s.source, t.term, COALESCE(st.c, 0) + 1 AS c1
  FROM srcs s
  CROSS JOIN (SELECT DISTINCT term FROM st) t
  LEFT JOIN st ON st.source = s.source AND st.term = t.term
),
tot AS MATERIALIZED (
  SELECT source, CAST(sum(c1) AS BIGINT) AS n1 FROM dense GROUP BY source
)
,
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         a.c1 AS ca, b.c1 AS cb, ta.n1 AS na, tb.n1 AS nb,
         {', '.join(_kl_contrib_items('duckdb'))}
  FROM dense a
  JOIN dense b ON a.term = b.term AND a.source <> b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
)
SELECT src_a, src_b,
       (SELECT n_terms FROM v) AS n_terms,
       CAST(sum(contrib) AS BIGINT) AS kl_sum_fp
FROM pairs
GROUP BY src_a, src_b
"""


@register("q117_source_drift_kl", covers=("A4", "J4"), oracle=_q117_oracle())
def q117_source_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift matrix for mixture monitoring: add-1-smoothed
    unigram KL(A‖B) between every pair of sources.  The per-term
    contribution is c·(dln(cA') + dln(NB') − dln(cB') − dln(NA')) with
    EACH det_ln fixed-pointed separately before the integer-weighted
    sum — order-independent, engine-exact, and overflow-free by
    construction (no cA'·NB' products, whose 100 TB magnitudes would
    overflow BIGINT inside a single ln argument).  Plan: the corpus
    collapses once to the (source, term) count frame (q108 discipline);
    the smoothed dense frame is |vocab|·|sources| — bounded by dimensions,
    not the corpus — sources meet through a term equi-join on it, and
    totals broadcast back."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    st = (
        docs.select("source", F.explode(tokens_of(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    st = st.persist()
    terms = st.select("term").distinct()
    srcs = st.select("source").distinct()
    v = terms.agg(F.count(F.lit(1)).alias("n_terms"))
    dense = (
        srcs.crossJoin(terms)
        .join(st, ["source", "term"], "left")
        .select("source", "term", (F.coalesce("c", F.lit(0)) + 1).alias("c1"))
    )
    dense = dense.persist()
    tot = dense.groupBy("source").agg(F.sum("c1").alias("n1"))

    a = dense.select(F.col("source").alias("src_a"), "term", F.col("c1").alias("ca"))
    b = dense.select(F.col("source").alias("src_b"), "term", F.col("c1").alias("cb"))
    ta = tot.select(F.col("source").alias("src_a"), F.col("n1").alias("na"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n1").alias("nb"))
    return (
        a.join(b, "term")
        .filter(F.col("src_a") != F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .selectExpr("src_a", "src_b", *_kl_contrib_items("spark"))
        .groupBy("src_a", "src_b")
        .agg(F.sum("contrib").alias("kl_sum_fp"))
        .crossJoin(F.broadcast(v))
        .select("src_a", "src_b", "n_terms", "kl_sum_fp")
    )


# --------------------------------------------------------------------------
# q136 — Heaps'-law vocabulary-growth curve (corpus health / tokenizer
# sizing).  q137 — Zipf rank-frequency curve with piecewise log-log slopes.
# --------------------------------------------------------------------------
_HEAPS_B = 20  # corpus checkpoints (buckets over the doc_id range)


def _lnfp_sql(n_expr: str, out: str, dialect: str) -> list[str]:
    """Staged det_ln fixed-point items ending in ``… AS {out}`` (BIGINT,
    floor(ln·10⁴)) — the engine-exact log both q136/q137 surfaces use.
    Guarded upstream: callers pass ``greatest(n, 1)`` and NULL the output
    when the true argument is < 1."""
    from briefly_spark.numerics import det_ln_items

    return [
        *det_ln_items(n_expr, f"__{out}", dialect),
        f"CAST(floor(__{out} * 10000.0) AS BIGINT) AS {out}",
    ]


def _q136_oracle() -> str:
    ln_t = ",\n         ".join(_lnfp_sql("greatest(toks_cum, 1)", "ln_toks_raw", "duckdb"))
    ln_v = ",\n         ".join(_lnfp_sql("greatest(types_cum, 1)", "ln_types_raw", "duckdb"))
    return f"""
WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
base AS MATERIALIZED (
  SELECT (d.doc_id * {_HEAPS_B}) // (m.max_id + 1) AS bucket, d.text
  FROM documents d, mx m
),
bstat AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> ''))) AS BIGINT) AS n_toks
  FROM base GROUP BY bucket
),
firstb AS (
  SELECT term, min(bucket) AS fb FROM (
    SELECT bucket, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                      w -> w <> '')) AS term
    FROM base
  ) GROUP BY term
),
newt AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_types
         FROM firstb GROUP BY fb),
cum AS MATERIALIZED (
  SELECT b.bucket, b.n_docs, b.n_toks,
         coalesce(n.new_types, CAST(0 AS BIGINT)) AS new_types,
         CAST(sum(b.n_docs) OVER w AS BIGINT) AS docs_cum,
         CAST(sum(b.n_toks) OVER w AS BIGINT) AS toks_cum,
         CAST(sum(coalesce(n.new_types, 0)) OVER w AS BIGINT) AS types_cum
  FROM bstat b LEFT JOIN newt n USING (bucket)
  WINDOW w AS (ORDER BY b.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
fps AS MATERIALIZED (
  SELECT bucket, n_docs, n_toks, new_types, docs_cum, toks_cum, types_cum,
         {ln_t},
         {ln_v},
         CASE WHEN toks_cum >= 1 THEN ln_toks_raw END AS ln_toks_fp,
         CASE WHEN types_cum >= 1 THEN ln_types_raw END AS ln_types_fp
  FROM cum
)
SELECT bucket, n_docs, n_toks, new_types, docs_cum, toks_cum, types_cum,
       ln_toks_fp, ln_types_fp,
       CAST(CASE WHEN lag(ln_toks_fp) OVER (ORDER BY bucket) IS NOT NULL
                  AND ln_toks_fp > lag(ln_toks_fp) OVER (ORDER BY bucket)
            THEN ((ln_types_fp - lag(ln_types_fp) OVER (ORDER BY bucket)) * 10000)
                 // (ln_toks_fp - lag(ln_toks_fp) OVER (ORDER BY bucket))
       END AS BIGINT) AS beta_fp
FROM fps
"""


@register("q136_heaps_vocab_growth", covers=("A2", "A3"), oracle=_q136_oracle())
def q136_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (Heaps 1978): at 20
    deterministic corpus checkpoints (doc_id-range buckets — no global
    sort), the cumulative docs/tokens/distinct-types counts plus the
    LOCAL Heaps exponent between consecutive checkpoints,
    β = Δln V / Δln N as a 10⁴ fixed-point integer over the
    bit-reproducible det_ln.  This is the corpus-health report a
    tokenizer-sizing / dedup pipeline reads first: a β that stops
    falling flags boilerplate injection or OCR noise; V(N) directly
    sizes the BPE vocab (operators/bpe.py budgets off it).

    Plan shape at 100 TB: one (term) shuffle for first-occurrence
    (postings-shaped, partial-agg), a map-only per-bucket token tally,
    then every window/lag runs on the 20-row checkpoint frame —
    corpus-sized rows never reach an unpartitioned window
    (tools/plan_lint.py allowlist)."""
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    mx = docs.agg(F.max("doc_id").alias("max_id"))
    base = docs.crossJoin(F.broadcast(mx)).select(
        F.expr(f"(doc_id * {_HEAPS_B}) div (max_id + 1)").alias("bucket"),
        "text",
    )
    bstat = (
        base.select("bucket", F.size(tokens_of(F.col("text"))).alias("ntok"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_toks"),
        )
    )
    firstb = (
        base.select("bucket", F.explode(tokens_of(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.min("bucket").alias("fb"))
    )
    newt = firstb.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bstat.join(newt, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0).cast("long")))
        .select(
            "bucket", "n_docs", "n_toks", "new_types",
            F.sum("n_docs").over(w).cast("long").alias("docs_cum"),
            F.sum("n_toks").over(w).cast("long").alias("toks_cum"),
            F.sum("new_types").over(w).cast("long").alias("types_cum"),
        )
    )
    fps = cum.selectExpr(
        "bucket", "n_docs", "n_toks", "new_types",
        "docs_cum", "toks_cum", "types_cum",
        *_lnfp_sql("greatest(toks_cum, 1)", "ln_toks_raw", "spark"),
        *_lnfp_sql("greatest(types_cum, 1)", "ln_types_raw", "spark"),
    ).selectExpr(
        "bucket", "n_docs", "n_toks", "new_types",
        "docs_cum", "toks_cum", "types_cum",
        "CASE WHEN toks_cum >= 1 THEN ln_toks_raw END AS ln_toks_fp",
        "CASE WHEN types_cum >= 1 THEN ln_types_raw END AS ln_types_fp",
    )
    wl = Window.orderBy("bucket")
    return (
        fps.withColumn("__pt", F.lag("ln_toks_fp").over(wl))
        .withColumn("__pv", F.lag("ln_types_fp").over(wl))
        .withColumn(
            "beta_fp",
            F.expr(
                "CASE WHEN __pt IS NOT NULL AND ln_toks_fp > __pt"
                " THEN ((ln_types_fp - __pv) * 10000) div (ln_toks_fp - __pt) END"
            ).cast("long"),
        )
        .drop("__pt", "__pv")
    )


_ZIPF_K = 1024  # rank depth; checkpoints are the powers of two <= K


def _q137_oracle() -> str:
    ln_r = ",\n         ".join(_lnfp_sql("rk", "ln_rank_fp", "duckdb"))
    ln_c = ",\n         ".join(_lnfp_sql("c", "ln_count_fp", "duckdb"))
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS term
  FROM documents
),
cw AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
topk AS (SELECT term, c FROM cw ORDER BY c DESC, term LIMIT {_ZIPF_K}),
ranked AS MATERIALIZED (
  SELECT term, c,
         CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT) AS rk
  FROM topk
),
chk AS MATERIALIZED (SELECT rk, term, c FROM ranked WHERE (rk & (rk - 1)) = 0),
fps AS MATERIALIZED (
  SELECT rk, term, c,
         {ln_r},
         {ln_c}
  FROM chk
)
SELECT rk, term, c, ln_rank_fp, ln_count_fp,
       CAST(CASE WHEN lag(ln_rank_fp) OVER (ORDER BY rk) IS NOT NULL
            THEN ((lag(ln_count_fp) OVER (ORDER BY rk) - ln_count_fp) * 10000)
                 // (ln_rank_fp - lag(ln_rank_fp) OVER (ORDER BY rk))
       END AS BIGINT) AS slope_fp
FROM fps
"""


@register("q137_zipf_rank_curve", covers=("W1", "A3"), oracle=_q137_oracle())
def q137_zipf_rank_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency curve (Zipf 1949) at geometric rank
    checkpoints (1, 2, 4, … ≤ 1024) with the PIECEWISE log-log
    slope between consecutive checkpoints — the local Zipf exponent
    s = −Δln c / Δln r as a 10⁴ fixed-point integer.  Piecewise rather
    than one OLS slope: the per-segment view shows WHERE the power law
    breaks (head boilerplate flattens the top segments, a contaminated
    tail steepens the last ones), and every intermediate stays far from
    BIGINT overflow — an OLS over fp⁴ logs would need Σx·y products at
    10⁸ scale that overflow 2⁶³ at modest K.  All logs are the staged
    bit-reproducible det_ln; counts/ranks are exact integers.

    Plan shape at 100 TB: one (term) count shuffle (vocab-sized output,
    Heaps-bounded), TakeOrdered top-1024 to the
    limited frame, then rank/lag windows run on ≤1024 rows
    (tools/plan_lint.py allowlist, q88 precedent)."""
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    cw = (
        docs.select(F.explode(tokens_of(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    topk = cw.orderBy(F.desc("c"), "term").limit(_ZIPF_K)
    wr = Window.orderBy(F.desc("c"), "term")
    chk = (
        topk.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.expr("(rk & (rk - 1)) = 0"))
        .selectExpr(
            "rk", "term", "c",
            *_lnfp_sql("rk", "ln_rank_fp", "spark"),
            *_lnfp_sql("c", "ln_count_fp", "spark"),
        )
        .select("rk", "term", "c", "ln_rank_fp", "ln_count_fp")
    )
    wl = Window.orderBy("rk")
    return (
        chk.withColumn("__pr", F.lag("ln_rank_fp").over(wl))
        .withColumn("__pc", F.lag("ln_count_fp").over(wl))
        .withColumn(
            "slope_fp",
            F.expr(
                "CASE WHEN __pr IS NOT NULL"
                " THEN ((__pc - ln_count_fp) * 10000) div (ln_rank_fp - __pr) END"
            ).cast("long"),
        )
        .drop("__pr", "__pc")
    )


# --------------------------------------------------------------------------
# q146 — ROLLUP + grouping_id corpus inventory (the GROUPING SETS surface
# q13's CUBE doesn't pin: hierarchical subtotals with machine-readable
# aggregation level).
# --------------------------------------------------------------------------
@register(
    "q146_rollup_inventory",
    covers=("A2", "A3", "A8"),
    oracle="""
SELECT source, lang,
       CAST(GROUPING(source, lang) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP (source, lang)
""",
)
def q146_rollup_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inventory at every level of the source → lang hierarchy in
    ONE pass: per-(source, lang) cells, per-source subtotals, and the
    grand total, each row tagged by grouping_id (0 = leaf, 1 = source
    subtotal, 3 = grand total) so downstream consumers never confuse a
    subtotal NULL with a data NULL — the standard warehouse inventory
    report (q13 pins CUBE; this pins ROLLUP + GROUPING).

    Scale: rollup is ONE partial-aggregating shuffle (Spark expands the
    grouping sets map-side before the exchange, so the shuffle carries
    (#sets)× the leaf groups — here 3× a dimension-bounded frame), never
    one pass per level."""
    from briefly_spark.catalog import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.rollup("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "total_chars")
    )
