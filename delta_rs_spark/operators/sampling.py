"""Deterministic sampling and dataset splitting for training pipelines.

Seeded `df.sample` draws differ per partitioning and engine; these operators
hash a stable id instead — `md5(id)`'s first 8 hex digits as a uniform
integer in [0, 2^32) — so the same row lands in the same split/sample on
every run, any cluster size, and any engine that can md5 (the DuckDB
oracles compute the identical bucket). Pure codegen: no UDFs, no shuffles —
splitting a 100 TB corpus is a narrow map.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(id_col: str | Column, salt: str = "") -> Column:
    """Uniform integer in [0, 2^32) from md5 of the id (+ optional salt to
    derive independent hash draws from the same ids)."""
    raw = F.concat(F.col(id_col).cast("string"), F.lit(salt)) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(raw), 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — reproducible everywhere,
    and a row's membership never changes as the corpus grows."""
    return df.filter(hash_bucket(id_col, salt) < int(fraction * _BUCKETS))


def split_column(
    id_col: str,
    weights: Sequence[float],
    names: Sequence[str],
    salt: str = "",
) -> Column:
    """A `split` label column assigning each row to one of `names` with the
    given proportions (cumulative hash-range partitioning)."""
    if len(weights) != len(names):
        raise ValueError("weights and names must have the same length")
    total = float(sum(weights))
    bucket = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w / total
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (F.lit(names[0]) if expr is None else expr.otherwise(names[-1])).alias("split")


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
) -> DataFrame:
    """Attach a deterministic `split` column; filter on it for each set.
    Disjoint and exhaustive by construction."""
    return df.withColumn("split", split_column(id_col, weights, names, salt))
