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


def quantized_lsh_bucket(vec: Column, n_planes: int = 4, scale: int = 1000) -> Column:
    """Sign-bucket id over integer-quantized vectors — same plane family as
    ``lsh_bucket`` but the projection is exact int64 arithmetic (no float
    summation-order sign flips near 0), so the bucket decision is
    engine-portable and SQL-oracle-replicable bit for bit."""
    from data_validator_guard_spark.operators.dedup import _int_lsh_bits, _quantize

    return _int_lsh_bits(_quantize(vec, scale), n_planes)


def _probe_buckets(bucket: Column, n_planes: int, multiprobe: bool) -> Column:
    """Array of buckets to search for a query: its own bucket plus (when
    ``multiprobe``) every bucket at Hamming distance 1 — the standard
    multi-probe LSH trick. A near-neighbor differs from the query in few
    sign bits, so probing 1-bit flips recovers most of the recall a single
    probe loses, at (n_planes+1)× the candidate volume on the QUERY side
    only (the corpus keeps exactly one bucket per vector, so the big side's
    shuffle/storage is unchanged)."""
    if not multiprobe:
        return F.array(bucket)
    flips = [
        F.concat(
            F.substring(bucket, 1, p),
            F.when(F.substring(bucket, p + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
            F.substring(bucket, p + 2, n_planes - p - 1),
        )
        for p in range(n_planes)
    ]
    return F.array(bucket, *flips)


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket(s): ``query_id, neighbor_id,
    rank``.

    The corpus is scanned once with its bucket computed inline; the join key
    is the bucket, so comparisons drop by ~2^n_planes/(n_planes+1) vs brute
    force. The bucket is the integer-quantized sign bucket (portable); the
    within-bucket ranking is exact cosine over the original vectors. With
    ``multiprobe`` (default) each query also searches the n_planes buckets
    one bit-flip away — a corpus vector lives in exactly one bucket and the
    probe buckets are distinct, so a (query, neighbor) pair joins at most
    once (no dedup pass needed).
    """
    qb = quantized_lsh_bucket(F.col(vec_col), n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_probe_buckets(qb, n_planes, multiprobe)).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        quantized_lsh_bucket(F.col(vec_col), n_planes).alias("__bucket"),
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


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Recall harness for ANN results vs the exact baseline.

    ``exact``/``approx``: (query_id, neighbor_id, rank) frames. Returns one
    row per query: ``query_id, n_hits, n_exact, recall`` with
    recall = n_hits / n_exact (one IEEE division of two exact integers —
    reproducible across engines). This converts the ANN path's unavoidable
    recall < 1 into a MEASURED, assertable number instead of an unchecked
    output (pytest pins a floor; the oracle reproduces the whole harness).
    """
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        totals.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )
