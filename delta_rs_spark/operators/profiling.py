"""Data-profiling operators: fixed-width numeric histograms and per-column
statistical profiles.

Ingest-time profiling is how a 100 TB pipeline decides partition boundaries,
detects schema drift, and spots corrupt feeds before they poison training
data. Both operators are single-pass `pyspark.sql.functions` aggregations —
map-side partial aggregation does nearly all the work, the shuffle carries
only per-bin / per-column partials.

Exactness: bin assignment is ``least(floor((x - lo) / width), n_bins - 1)``
— two IEEE-754 double operations and a floor, which round identically in any
engine, so the histogram is bit-for-bit reproducible (no sampling, unlike
``approx_percentile``-based equi-height histograms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi).

    Rows below ``lo`` clamp into bin 0, rows at/above ``hi`` into the last
    bin (standard overflow-bin convention); NULLs are dropped. Output:
    (bin, bin_lo, bin_hi, n) for non-empty bins.
    """
    width = (hi - lo) / n_bins
    x = F.col(value_col)
    bin_ = F.greatest(
        F.lit(0),
        F.least(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(n_bins - 1)),
    ).cast("int")
    return (
        df.filter(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: count / nulls / exact distinct / min / max (doubles).

    All columns profile in a single job: per-column aggregates run in one
    wide aggregation (one scan), then unpivot driver-side expression-wise —
    no per-column scans, no collect. Exact ``count_distinct`` shuffles one
    hash set per column; for trillion-row profiling swap in
    ``approx_count_distinct`` (HLL) — the one-line trade documented here
    rather than silently made.
    """
    aggs = []
    for c in cols:
        x = F.col(c)
        aggs += [
            F.count(x).alias(f"{c}__count"),
            F.sum(F.when(x.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(x).alias(f"{c}__ndv"),
            F.min(x).cast("double").alias(f"{c}__min"),
            F.max(x).cast("double").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__count").alias("n_rows"),
            F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{c}__ndv").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
