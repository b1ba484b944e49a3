"""Similarity search over an embedding column (array<float>).

- ``bruteforce_topk``: exact cosine top-k. Distributed as per-partition
  top-k (Catalyst TakeOrderedAndProject) — no global sort of all rows.
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH. Hyperplanes
  are derived deterministically from xxhash64 so both the plan and the
  results are reproducible without shipping a random matrix.

No Python UDFs: dot products are zip_with/aggregate higher-order
functions executing in the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, z: acc + z * z))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def bruteforce_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    sort+limit lets Catalyst plan TakeOrderedAndProject: each partition
    keeps a k-heap and only k rows per partition reach the driver-side
    merge — this is the pattern that survives 100 TB.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def _hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """sign(v · h_p) where h_p[j] ∈ {−1,+1} derives from xxhash64(p, j).

    A deterministic pseudo-random hyperplane: no broadcast matrix, and
    every executor computes the same planes locally.
    """
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.xxhash64(F.concat_ws(":", F.lit(str(plane_id)), j.cast("string")))
            .bitwiseAND(F.lit(1))
            == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return F.when(_dot(vec, signs) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^num_planes))."""
    bucket = F.lit(0)
    for p in range(num_planes):
        bucket = bucket + F.shiftleft(_hyperplane_sign(vec, p, dim), p)
    return bucket


def with_lsh_buckets(
    df: DataFrame, vec_col: str = "embedding", num_planes: int = 4, dim: int = 64
) -> DataFrame:
    return df.withColumn(
        "lsh_bucket", lsh_bucket(F.col(vec_col).cast("array<double>"), num_planes, dim)
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket, then exact cosine.

    At 100 TB the table would be written bucketed/partitioned by
    ``lsh_bucket`` so this prunes to 1/2^planes of the data before any
    scoring; multi-probe (flipping the weakest plane) trades recall for
    scan cost.
    """
    q = [float(x) for x in query_vec]
    # compute the query's bucket with a 1-row DataFrame through the same
    # expression, so driver and executors can never disagree
    spark = df.sparkSession
    qdf = spark.range(1).select(F.array(*[F.lit(x) for x in q]).alias("qv"))
    qbucket = qdf.select(lsh_bucket(F.col("qv"), num_planes, dim).alias("b")).first()["b"]

    bucketed = with_lsh_buckets(df, vec_col, num_planes, dim)
    cand = bucketed.filter(F.col("lsh_bucket") == qbucket)
    return bruteforce_topk(cand, q, k, vec_col, id_col)
