"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting and map-side partial aggregation cover most skew
automatically; the two cases they don't are (a) COUNT(DISTINCT) under a
low-cardinality/hot grouping key — distinct sets can't partially aggregate,
so every value of a hot key lands on one reducer — and (b) joins against a
build side AQE can't split. Both are solved by salting, exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    alias: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-proof.

    Values are bucketed by ``xxhash64(value) % n_buckets`` — buckets hold
    *disjoint* value sets, so per-bucket distinct counts are additive and the
    hot key's work spreads across ``n_buckets`` reducers. Two shuffles of
    pre-aggregated data replace one shuffle that sends every row of the hot
    key to a single task. Null values are ignored (SQL COUNT(DISTINCT)
    semantics).
    """
    alias = alias or f"{value_col}_distinct"
    keys = list(keys)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, F.pmod(F.xxhash64(value_col), F.lit(n_buckets)).alias("_salt"))
        .agg(F.count_distinct(value_col).alias("_partial"))
        .groupBy(*keys)
        .agg(F.sum("_partial").alias(alias))
    )


def salt_join_key(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> tuple[DataFrame, DataFrame]:
    """Prepare a skew-proof equi-join: facts get a random-but-deterministic
    salt in [0, n_salts); the (small) dim side is replicated n_salts times.
    Join on ``[key, salt_col]`` afterwards — the hot key's rows spread over
    n_salts reducers instead of one.

    The fact salt derives from xxhash64 of the whole row's monotonically
    increasing id surrogate — deterministic across retries (no rand()).
    """
    salted_facts = facts.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    replicated_dim = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts, replicated_dim
