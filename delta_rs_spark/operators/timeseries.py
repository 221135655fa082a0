"""Time-series operators: as-of join, bucketed range (interval) join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The classic distributed
formulation used here: union both sides with a side marker, one window pass
per (key, time) order carrying the most recent right-side row forward
(`last(..., ignorenulls=True)`), then keep only left rows. Cost is a single
shuffle on the join key — never a range-join blowup, no per-key driver loops —
so it scales to arbitrarily many rows per key and arbitrarily many keys.

For point-in-interval joins with no equi key Spark falls back to
BroadcastNestedLoopJoin — O(points × intervals). ``range_join`` turns that
into an equi-join by time bucketing: intervals explode to the few buckets
they overlap, points hash to one bucket, the join runs on the bucket key and
an exact predicate filters inside. Shuffle is O(points + intervals ×
avg_buckets_per_interval).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: attach, to every left row, the most recent right
    row with ``right.on <= left.on`` (per ``by`` group). Left rows with no
    prior right row keep nulls.

    The right row travels as ONE struct through the window (not per-column
    `last` calls), so a right row with null attributes never blends with an
    older row's values. ``right_cols`` limits the carried right-side columns
    (default: all except the keys); each arrives as ``<col><suffix>`` plus
    ``<on><suffix>`` for the matched time. ``tolerance`` (a Column interval,
    e.g. ``F.expr("INTERVAL 5 MINUTES")``) nulls matches older than
    ``left.on - tolerance``.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    r_struct = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in right_cols])
    rhs = right.select(
        *by, F.col(on), F.lit(0).alias("_side"), r_struct.alias("_r")
    )
    left_payload = [c for c in left.columns if c != on and c not in by]
    lhs = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rhs.schema["_r"].dataType).alias("_r"),
        *left_payload,
    )
    rhs = rhs.select(
        *by,
        F.col(on),
        "_side",
        "_r",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )

    # right rows sort before left rows at equal timestamps, so an exact-time
    # right row is visible to the left row (ties match, as in DuckDB ASOF)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = lhs.unionByName(rhs).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    match = F.col("_m")
    if tolerance is not None:
        match = F.when(F.col("_m")[on] >= F.col(on) - tolerance, F.col("_m"))
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *by,
            F.col(on),
            *left_payload,
            match[on].alias(f"{on}{suffix}"),
            *[match[c].alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner join of points to every interval with ``start <= point < end``.

    Both sides are keyed by coarse time buckets of ``bucket_width`` (seconds
    for timestamp columns — values are compared on their epoch-seconds cast):
    an interval lands in every bucket it overlaps (``sequence`` explode, no
    driver loop), a point in exactly one, so each matching pair meets in
    exactly one bucket — no dedup pass needed. Pick ``bucket_width`` near the
    typical interval length: each interval then explodes to ~2 buckets and
    the equi-join replaces the nested-loop cross product.

    Output: all point columns + all interval columns.
    """
    def _num(df: DataFrame, name: str):
        # TIMESTAMP_NTZ/date have no direct numeric cast; route through
        # TIMESTAMP (epoch seconds). Same conversion on both sides keeps
        # bucket keys consistent regardless of session timezone.
        t = df.schema[name].dataType.typeName()
        c = F.col(name)
        if t in ("timestamp", "timestamp_ntz", "date"):
            return c.cast("timestamp").cast("double")
        return c.cast("double")

    p_num = _num(points, on)
    s_num = _num(intervals, start_col)
    e_num = _num(intervals, end_col)
    w = float(bucket_width)

    pts = points.withColumn("_bucket", F.floor(p_num / w))
    # half-open interval: the end bucket is floor((end - epsilon)/w); using
    # floor(end/w) costs at most one extra empty bucket and stays exact
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s_num / w), F.floor(e_num / w))),
    )
    return (
        pts.join(ivs, "_bucket")
        .filter((F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col)))
        .drop("_bucket")
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    start_ts: str,
    end_ts: str,
) -> DataFrame:
    """Regularize an irregular series to a fixed grid with
    last-observation-carried-forward — the gap-filling primitive of
    hypertable-style rollups (sensor feeds, metrics, market data).

    Construction: a per-key time spine (``sequence`` over the window —
    generated, not scanned), left join against each bucket's last
    observation, then one ``last(value, ignorenulls=True)`` window to carry
    values forward. Scale shape: the spine is |keys| × |buckets| rows of
    three columns; the only shuffles are the bucket aggregation and the
    per-key window — both partitioned by key, so a million-key 100 TB feed
    spreads evenly and no executor ever materializes more than its keys'
    spines. The LOCF window is ordered by the grid timestamp with an
    unbounded-preceding frame, which Spark evaluates in one pass per key.
    """
    lo = F.to_timestamp(F.lit(start_ts))
    hi = F.to_timestamp(F.lit(end_ts))
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")

    keys = df.select(F.col(key_col).alias("key")).distinct()
    spine = keys.select(
        "key", F.explode(F.sequence(lo, hi, step)).alias("bucket_ts")
    )

    # buckets anchor at START_TS, not the Unix epoch: the spine below is
    # sequence(start, end, step), so an epoch-aligned floor would miss every
    # spine timestamp whenever start % step != 0 (incl. via session-timezone
    # offsets) and the join would silently return all-NULLs
    lo_s = F.unix_timestamp(lo)
    bucket = F.timestamp_seconds(
        lo_s
        + F.floor(
            (F.unix_timestamp(F.col(ts_col)) - lo_s) / step_seconds
        ).cast("long")
        * step_seconds
    )
    last_per_bucket = (
        df.filter((F.col(ts_col) >= lo) & (F.col(ts_col) <= hi))
        .withColumn("bucket_ts", bucket)
        .groupBy(F.col(key_col).alias("key"), "bucket_ts")
        # struct ordering makes the "last" observation deterministic even
        # when two observations share a timestamp inside one bucket
        .agg(
            F.max_by(
                value_col, F.struct(F.col(ts_col), F.col(value_col))
            ).alias("_obs")
        )
    )

    w = (
        W.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(last_per_bucket, ["key", "bucket_ts"], "left")
        .withColumn("value", F.last("_obs", ignorenulls=True).over(w))
        .select(
            F.col("key").alias(key_col),
            "bucket_ts",
            "value",
            F.col("_obs").isNotNull().alias("observed"),
        )
    )
