"""Similarity search over embedding columns (array<float>).

North-star operator set (beyond reference surface):
- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
- ``lsh_topk``: random-hyperplane LSH bucketed approximate top-k — the
  scale path: candidates come from an equi-join on the hyperplane sign
  bucket, so each query touches a bucket, not the full corpus.

Scale design: the query side is expected to be small (broadcast); the
corpus side streams.  Dot products are computed with built-in
``aggregate``/``zip_with`` array expressions — JVM-side, codegen'd, no
Python in the hot path.  At 100 TB the corpus is pre-bucketed on disk so
bucket pruning replaces the scan (IVF-style), which the LSH variant models.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_PRIME = 2147483647


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right sum of element products (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus — a broadcast nested-loop join
    (no shuffle of the corpus), then a per-query top-k window.  Norms are
    computed once per side before the join.  Ranking uses the rounded
    similarity with a neighbor-id tie-break so results are deterministic.
    """
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnorm", l2_norm(F.col("qvec")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-pattern bucket id from deterministic pseudo-random hyperplanes.

    Plane p's component j is derived from xxhash64(p, j) mapped to [-1, 1] —
    fully deterministic, no stored model, computable at read time on any
    executor.
    """
    def plane_dot(p: int) -> Column:
        coeffs = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.lit(p), j), F.lit(2001)) - F.lit(1000)
            ).cast("double")
            / F.lit(1000.0),
        )
        return dot(vec, coeffs)

    bits = [
        F.when(plane_dot(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def lsh_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    The corpus join key is the bucket id — at scale the corpus is written
    partitioned by bucket so this is partition pruning (IVF-style probe),
    and recall is tuned by lowering n_planes or probing neighbor buckets.
    """
    dim = 64
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("cvec"), n_planes, dim))
    c = c.withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("qvec"), n_planes, dim))
    q = q.withColumn("qnorm", l2_norm(F.col("qvec")))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


__all__ = [
    "brute_force_topk",
    "cosine",
    "dot",
    "hyperplane_bucket",
    "l2_norm",
    "lsh_topk",
]
