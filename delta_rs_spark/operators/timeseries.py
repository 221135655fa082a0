"""Time-series operators: as-of join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The classic distributed
formulation used here: union both sides with a side marker, one window pass
per (key, time) order carrying the most recent right-side row forward
(`last(..., ignorenulls=True)`), then keep only left rows. Cost is a single
shuffle on the join key — never a range-join blowup, no per-key driver loops —
so it scales to arbitrarily many rows per key and arbitrarily many keys.
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
