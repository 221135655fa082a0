"""Generated columns (public Delta writer feature ``generatedColumns``).

A column whose value is always ``<expression>`` over the row's other
columns. The expression is stored in the field's metadata under
``delta.generationExpression`` (the public schema convention), so any
conformant reader sees the contract. Writer obligations (enforced here):

- a write that OMITS the column gets it computed;
- a write that PROVIDES the column is validated — every row must equal the
  expression (null-safe), else the write fails;
- UPDATE / MERGE rewrites recompute the column after assignments, and an
  explicit assignment to a generated column is rejected.

Protocol floor: minWriterVersion 4 (legacy) or the ``generatedColumns``
writer feature at version 7. The reference (delta-rs v0) predates the
feature; implemented from the public Delta protocol spec.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEN_META = "delta.generationExpression"
FEATURE_NAME = "generatedColumns"
MIN_WRITER = 4


class GeneratedColumnError(Exception):
    pass


def expressions(schema: T.StructType) -> dict[str, str]:
    """column name → generation expression (top-level fields)."""
    out = {}
    for f in schema.fields:
        expr = (f.metadata or {}).get(GEN_META)
        if expr:
            out[f.name] = str(expr)
    return out


def annotate_schema(
    df: DataFrame, generated: dict[str, str]
) -> tuple[DataFrame, T.StructType]:
    """CREATE-time: attach generation expressions to the schema metadata,
    computing any generated column absent from the incoming frame (its type
    comes from the expression) and VALIDATING any the frame provides — the
    invariant the metadata advertises must hold from version 0, not only
    for appends. Returns (frame incl. generated columns, annotated
    schema)."""
    to_validate = []
    for name, expr in generated.items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr))
        else:
            to_validate.append((name, expr))
    if to_validate:
        _validate(df, to_validate)
    fields = []
    for f in df.schema.fields:
        meta = dict(f.metadata or {})
        if f.name in generated:
            meta[GEN_META] = generated[f.name]
        fields.append(T.StructField(f.name, f.dataType, f.nullable, meta))
    return df, T.StructType(fields)


def _validate(df: DataFrame, to_validate: list[tuple[str, str]]) -> None:
    """One combined scan counting rows violating each provided generated
    column's expression; raises naming every violation."""
    aggs = [
        F.sum(
            F.when(~F.col(name).eqNullSafe(F.expr(expr)), 1).otherwise(0)
        ).alias(name)
        for name, expr in to_validate
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {
        name: int(row[name])
        for name, _ in to_validate
        if row[name] and row[name] > 0
    }
    if bad:
        parts = ", ".join(
            f"{n} != ({dict(to_validate)[n]}): {c} rows" for n, c in bad.items()
        )
        raise GeneratedColumnError(f"generated-column violation(s): {parts}")


def apply_on_write(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Append path: compute omitted generated columns (cast to the DECLARED
    type — the expression's natural type can be narrower, e.g. after a
    type widening); validate provided ones row-exactly."""
    gen = expressions(schema)
    if not gen:
        return df
    types = {f.name: f.dataType for f in schema.fields}
    to_validate = []
    for name, expr in gen.items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr).cast(types[name]))
        else:
            to_validate.append((name, expr))
    if to_validate:
        # the validation agg executes the incoming plan once and the staged
        # write executes it again — cache so an expensive upstream query
        # is not computed twice (LRU-evicted; bounded by the append size)
        df = df.cache()
        _validate(df, to_validate)
    return df


def recompute(df: DataFrame, schema: T.StructType) -> DataFrame:
    """DML rewrite path: overwrite every generated column from its
    expression — correct by definition, no validation scan needed."""
    for name, expr in expressions(schema).items():
        if name in df.columns:
            df = df.withColumn(name, F.expr(expr).cast(dict(
                (f.name, f.dataType) for f in schema.fields
            )[name]))
    return df


def reject_assignments(assignments: dict, schema: T.StructType) -> None:
    gen = expressions(schema)
    bad = sorted(set(assignments) & set(gen))
    if bad:
        raise GeneratedColumnError(
            f"cannot assign generated column(s) {bad}; their values are "
            "always computed from the generation expression"
        )
