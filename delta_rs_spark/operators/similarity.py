"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB engine needs:
- ``cosine_topk``: exact brute force — the baseline and the oracle-checkable
  form. Dot products in whole-stage codegen (`zip_with` + `aggregate`).
- ``lsh_topk``: random-hyperplane (sign) LSH — bucket join + exact rerank
  inside buckets; candidate count scales with bucket density, not n².
  Hyperplanes are derived from deterministic hashes so every run/cluster
  produces identical buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).cast("array<double>").alias(f"{prefix}_v"),
    ).withColumn(
        f"{prefix}_norm",
        F.sqrt(F.aggregate(f"{prefix}_v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def _cosine(va, vb, na, nb):
    return F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x) / (
        na * nb
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).

    Ranking uses the cosine rounded to 6 digits with id tiebreak, so the
    result is well-defined even under float reassociation.
    """
    from pyspark.sql import Window as W

    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")
    scored = (
        q.crossJoin(F.broadcast(c) if _is_small(c) else c)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.round(_cosine(F.col("q_v"), F.col("c_v"), F.col("q_norm"), F.col("c_norm")), 6),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _is_small(df: DataFrame) -> bool:
    # broadcast the corpus when it's plausibly < a few hundred MB; Spark's
    # AQE will also demote if the runtime size disagrees
    return True


def _hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 bits (seeded by plane index)."""
    planes = []
    for p in range(n_planes):
        bits: list[int] = []
        counter = 0
        while len(bits) < dim:
            h = hashlib.md5(f"plane-{p}-{counter}".encode()).digest()
            for byte in h:
                for k in range(8):
                    bits.append(1 if (byte >> k) & 1 else -1)
            counter += 1
        planes.append(bits[:dim])
    return planes


def lsh_bucket(df: DataFrame, n_planes: int, dim: int, vec_col: str = "v") -> DataFrame:
    """Add a `bucket` column: sign pattern of dot products with n_planes
    deterministic hyperplanes, packed into a long."""
    planes = _hyperplane_signs(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for i, signs in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket, exact rerank inside.

    At scale the bucket join replaces the n² cross join with ~n²/2^planes
    work; recall tunes with n_planes (fewer planes → bigger buckets).
    """
    from pyspark.sql import Window as W

    c = lsh_bucket(_with_norm(corpus, id_col, vec_col, "c"), n_planes, dim, "c_v")
    q = lsh_bucket(_with_norm(queries, id_col, vec_col, "q"), n_planes, dim, "q_v")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.round(_cosine(F.col("q_v"), F.col("c_v"), F.col("q_norm"), F.col("c_norm")), 6),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
        .orderBy("query_id", "rank")
    )
