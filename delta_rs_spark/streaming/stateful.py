"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no continuous-query engine; its streaming story is log
tailing + txn watermarks (SURVEY §1.4). On the Spark side that composes with
arbitrary keyed state: this module shows the canonical shape — per-key
running aggregates whose state survives across micro-batches — as an
Arrow-batched `applyInPandasWithState` operator over any stream (including
the `delta_stream` log-tail source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key cumulative (count, sum) maintained in keyed state.

    Emits one updated row per key per micro-batch; the state store carries
    the totals between batches, so a key's output is cumulative over the
    whole stream, not per-batch. Partitioned by the grouping key — state
    shards across executors like any keyed stream.

    Integral value columns accumulate in exact LONG arithmetic (the total
    is then batch-order-invariant — what the certified query relies on);
    fractional columns accumulate as DOUBLE.
    """
    import pandas as pd

    from pyspark.sql import types as T

    # key type follows the input stream (string keys, int keys, ...); the
    # value column must be numeric — fail at build time, not mid-batch
    key_field = stream.schema[key_col]
    value_type = stream.schema[value_col].dataType
    if not isinstance(value_type, T.NumericType):
        raise TypeError(
            f"running_totals value_col {value_col!r} must be numeric, "
            f"got {value_type.simpleString()}"
        )
    integral = isinstance(value_type, T.IntegralType)
    total_type = T.LongType() if integral else T.DoubleType()
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", total_type),
        ]
    )
    state_schema = f"n LONG, total {'LONG' if integral else 'DOUBLE'}"
    cast = int if integral else float
    zero = cast(0)

    def update(key, pdfs, state: GroupState):
        (n, total) = state.get if state.exists else (0, zero)
        for pdf in pdfs:
            n += len(pdf)
            total += cast(pdf[value_col].fillna(zero).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
