"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

- **brute force** (the correctness baseline): broadcast the (small) query set
  against the corpus; cosine via ``zip_with`` + ``aggregate`` — sequential
  left-fold per row, JVM-side, deterministic summation order.
- **bucketed ANN** (the scale path): deterministic sign-bucket LSH — each
  vector hashed to a bucket by the signs of its dot products with fixed
  pseudo-random hyperplanes (derived arithmetically from (dim, plane) indices,
  no RNG state); search touches only the query's bucket. Recall < 1 by
  design; the bucket fn is engine-portable so results are reproducible.

At 10^12 scale the corpus side stays partitioned; only queries broadcast.
Top-k uses a window over (similarity DESC, id ASC) — total order, no float
ties in ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: ``query_id, neighbor_id, rank``.

    ``queries`` must be small (it is broadcast); self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _plane_component(d: Column, p: int) -> Column:
    """Deterministic pseudo-random hyperplane component for (dim d, plane p):
    ((d*31 + p*17) % 7) - 3 ∈ [-3, 3]. Pure arithmetic — portable."""
    return ((d * 31 + F.lit(p * 17)) % 7 - 3).cast("double")


def lsh_bucket(vec: Column, n_planes: int = 4) -> Column:
    """Sign-bucket id: concat of sign bits of <vec, plane_p> for p in 0..n-1."""
    dim_idx = F.sequence(F.lit(1), F.size(vec))

    def _term(p: int):
        return lambda x, d: x.cast("double") * _plane_component(d, p)

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, dim_idx, _term(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket: ``query_id, neighbor_id, rank``.

    The corpus is scanned once with its bucket computed inline; the join key
    is the bucket, so comparisons drop by ~2^n_planes vs brute force.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(F.col(vec_col), n_planes).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), n_planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
