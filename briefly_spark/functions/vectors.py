"""Vector column functions — cosine / dot / norm / mean-pool over
``array<float|double>`` columns, all native higher-order functions
(JVM-side, no UDF, no shuffle).

These power the similarity join (SURVEY §2.4 J4/J5), embedding mean-pool
(§2.5 A5) and the embedding near-dup operator.  The fold in :func:`dot` is
strictly sequential, so results are deterministic for a given element
order — combined with :func:`briefly_spark.numerics.trunc4` rounding this
makes cosine scores reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product as a sequential zip_with/aggregate fold.

    MEASURED, do not "optimize" into an unrolled ``a[0]·b[0]+a[1]·b[1]+…``
    chain: on a plain parquet scan + sum the unrolled form is ~2.4× faster
    (it participates in whole-stage codegen), but inside the post-join
    projection of a pair join — where every hot call site here lives — a
    64-term expression tree is ~3.5× SLOWER (sf0.1, local[32]; generated
    method exceeds what codegen splitting/JIT handle in that context).
    The fold's left-to-right order also pins IEEE reproducibility."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (the
    reference's zero-vector placeholders must not poison ranking —
    SURVEY §7.2)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    """Unit-normalize so downstream similarity is a plain dot product —
    normalize once, rank many (the 100 TB pattern)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def mean_pool(df: DataFrame, key_cols: list[str], vec_col: str, out_col: str = "vector") -> DataFrame:
    """Element-wise mean of per-group vectors (ref: np.mean(axis=0) over
    chunk embeddings, embedded_articles.py:153-167).

    Implemented as posexplode → avg per (key, dim) → re-assemble sorted by
    dim: two narrow shuffles on (key, dim) / (key), no UDF, scales linearly
    with rows × dims and never materializes a group in memory."""
    exploded = df.select(*key_cols, F.posexplode(as_double(F.col(vec_col))).alias("dim", "val"))
    per_dim = exploded.groupBy(*key_cols, "dim").agg(F.avg("val").alias("avg_val"))
    return (
        per_dim.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "avg_val"))).alias("pairs"))
        .select(*key_cols, F.transform(F.col("pairs"), lambda p: p.avg_val).alias(out_col))
    )
