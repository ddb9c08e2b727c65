"""X147 leakage-safe cluster split — zero cross-split near-dup pairs by
construction (vs a measurable per-doc baseline on the same corpus), the
DuckDB mirror of the split arithmetic, append stability, and end-to-end
composition with the real near-dup machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from briefly_spark.operators.textstats import (
    cluster_split,
    hash_split,
    split_leakage_report,
)


def _clustered(spark, n_clusters=300, members=3):
    """(id, cluster): clusters of near-dup docs; ids interleave so a
    per-doc split scatters members."""
    rows = [
        (c * members + m, c * members)  # representative = min member id
        for c in range(n_clusters)
        for m in range(members)
    ]
    return spark.createDataFrame(rows, "id LONG, cluster LONG")


def _pairs_of(assign):
    """All within-cluster pairs — the near-dup pair set the split must
    never separate."""
    a = assign.select(F.col("id").alias("id_a"), "cluster")
    b = assign.select(F.col("id").alias("id_b"), "cluster")
    return a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )


def test_cluster_split_is_leakage_free_where_doc_split_is_not(spark):
    assign = _clustered(spark)
    pairs = _pairs_of(assign)
    good = cluster_split(assign, id_col="id", cluster_col="cluster")
    rep_good = split_leakage_report(good.select("id", "split"), pairs)
    assert rep_good.filter("leaks").count() == 0  # by construction
    # every member of a cluster shares the split
    assert (
        good.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    # the per-doc baseline on the SAME corpus measurably leaks
    doc = assign.select("id", hash_split(F.col("id")).alias("split"))
    rep_doc = split_leakage_report(doc, pairs)
    assert rep_doc.filter("leaks").count() > 0
    # all three splits are actually populated at these percentages
    assert {r["split"] for r in good.select("split").distinct().collect()} == {
        "train", "val", "test"
    }


def test_split_arithmetic_matches_duckdb(spark):
    """The cluster-hash bucket arithmetic is the engine-portable md5
    nibble form — mirror the assignment in DuckDB and value-compare."""
    import duckdb
    import pandas as pd

    assign = _clustered(spark, n_clusters=200)
    got = sorted(
        (r["id"], r["split"])
        for r in cluster_split(assign, id_col="id", cluster_col="cluster").collect()
    )
    pdf = assign.toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(pdf))
    hexd = "0123456789abcdef"
    nib = lambda j: f"(instr('{hexd}', substring(md5(CAST(cluster AS VARCHAR)), {j}, 1)) - 1)"  # noqa: E731
    bucket = f"(({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)}) % 100)"
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT id, CASE WHEN {bucket} < 5 THEN 'val' "
            f"WHEN {bucket} < 10 THEN 'test' ELSE 'train' END AS split FROM t"
        ).fetchall()
    )
    assert got == want


def test_append_stability_new_member_inherits_cluster_split(spark):
    base = _clustered(spark)
    before = {
        r["cluster"]: r["split"]
        for r in cluster_split(base, id_col="id", cluster_col="cluster")
        .select("cluster", "split")
        .distinct()
        .collect()
    }
    # a new doc joins an existing cluster; nothing migrates
    grown = base.unionByName(
        spark.createDataFrame([(10_000, 0), (10_001, 3)], "id LONG, cluster LONG")
    )
    after_rows = cluster_split(grown, id_col="id", cluster_col="cluster").collect()
    after = {}
    for r in after_rows:
        after.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(v) == 1 for v in after.values())
    assert {c: next(iter(v)) for c, v in after.items() if c in before} == before


def test_composes_with_real_neardup_clusters(spark, sf_dir):
    """End-to-end on real documents: exact-dup clusters → cluster split →
    zero leakage against the cluster's own pair set."""
    from briefly_spark.catalog import load_table
    from briefly_spark.operators.dedup import exact_dedup

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # sf0.001 has no exact dups: re-ingest a slice under new ids (the
    # mirrored-feed scenario) so real multi-member clusters exist
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    clusters = exact_dedup(docs, "text", "doc_id")  # (content_md5, keep_id, n)
    assign = (
        docs.select(F.md5("text").alias("content_md5"), F.col("doc_id").alias("id"))
        .join(clusters.select("content_md5", F.col("keep_id").alias("cluster")),
              "content_md5")
        .select("id", "cluster")
    )
    split = cluster_split(assign, id_col="id", cluster_col="cluster")
    rep = split_leakage_report(split.select("id", "split"), _pairs_of(assign))
    assert rep.filter("leaks").count() == 0
    assert rep.count() > 0  # the corpus has real dup clusters to audit
