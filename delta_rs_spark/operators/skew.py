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
    key to a single task. Null VALUES are ignored (SQL COUNT(DISTINCT)
    semantics) but a key whose values are ALL null still appears with
    count 0, exactly like a plain groupBy().agg(count_distinct()).
    """
    alias = alias or f"{value_col}_distinct"
    keys = list(keys)
    # count_distinct ignores nulls itself, so null-valued rows contribute
    # _partial = 0 instead of being pre-filtered away (a pre-filter would
    # DROP keys with only-null values from the result entirely)
    return (
        df.groupBy(
            *keys, F.pmod(F.xxhash64(value_col), F.lit(n_buckets)).alias("_salt")
        )
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

    The fact salt is ``xxhash64`` over the row's CONTENT (every column) —
    genuinely deterministic across task retries and repartitioning, unlike
    ``rand()`` or ``monotonically_increasing_id()`` (whose value depends on
    the partition layout at execution time: a re-executed map task after a
    shuffle-fetch failure would re-salt its rows differently and duplicate/
    drop them). Identical duplicate rows share a salt — acceptable, since
    true full-row duplicates are rare and the salt only balances load.
    """
    salted_facts = facts.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts)),
    )
    replicated_dim = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts, replicated_dim
