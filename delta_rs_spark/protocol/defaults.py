"""Column DEFAULT values (public Delta writer feature ``allowColumnDefaults``).

A column may declare a DEFAULT expression; a write that OMITS the column
gets the default computed per row at write time (unlike generated columns,
a provided value always wins — defaults never validate or overwrite).

The expression is stored in the field's metadata under the public Spark/Delta
convention: ``CURRENT_DEFAULT`` holds the SQL text applied to FUTURE inserts,
``EXISTS_DEFAULT`` the (literal-folded) value assumed for rows written before
the default existed. This engine keeps writes full-width (omitted columns are
materialized at write time), so EXISTS_DEFAULT is recorded for foreign
readers but never needed by our own scan path.

Protocol floor: the ``allowColumnDefaults`` writer feature at version 7.
The reference (delta-rs v0) predates the feature; implemented from the
public Delta protocol spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CURRENT_DEFAULT = "CURRENT_DEFAULT"
EXISTS_DEFAULT = "EXISTS_DEFAULT"
FEATURE_NAME = "allowColumnDefaults"


class ColumnDefaultError(Exception):
    pass


def defaults(schema: T.StructType) -> dict[str, str]:
    """column name → DEFAULT expression SQL (top-level fields)."""
    out: dict[str, str] = {}
    for f in schema.fields:
        expr = (f.metadata or {}).get(CURRENT_DEFAULT)
        if expr is not None:
            out[f.name] = str(expr)
    return out


def _sql_literal(v) -> str:
    """A value rendered as a SQL literal (what EXISTS_DEFAULT must hold)."""
    import datetime as _dt
    import decimal as _decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    return "'" + str(v).replace("'", "''") + "'"


def annotate_schema(
    column_defaults: dict[str, str],
    base_schema: T.StructType,
    df_columns: list[str],
    spark=None,
) -> T.StructType:
    """CREATE-time: attach DEFAULT expressions to the schema metadata.

    ``CURRENT_DEFAULT`` keeps the expression (future inserts re-evaluate
    it). ``EXISTS_DEFAULT`` is the value readers assume for rows written
    before the column existed — per the public convention it must be the
    expression's DDL-TIME result folded to a LITERAL (storing the raw
    expression would make e.g. ``current_timestamp()`` re-evaluate on
    every scan, returning different values for the same stored rows);
    folding needs ``spark`` — without a session the raw expression is kept
    (correct only for constant expressions)."""
    known = {f.name for f in base_schema.fields}
    missing = sorted(set(column_defaults) - known - set(df_columns))
    if missing:
        raise ColumnDefaultError(
            f"DEFAULT declared for unknown column(s) {missing}; defaults "
            "attach to columns of the declared schema"
        )
    folded: dict[str, str] = {}
    if spark is not None and column_defaults:
        exprs = ", ".join(
            f"({e}) AS _d{i}" for i, e in enumerate(column_defaults.values())
        )
        row = spark.sql(f"SELECT {exprs}").collect()[0]
        for i, name in enumerate(column_defaults):
            folded[name] = _sql_literal(row[f"_d{i}"])
    fields = []
    for f in base_schema.fields:
        meta = dict(f.metadata or {})
        if f.name in column_defaults:
            meta[CURRENT_DEFAULT] = column_defaults[f.name]
            meta[EXISTS_DEFAULT] = folded.get(f.name, column_defaults[f.name])
        fields.append(T.StructField(f.name, f.dataType, f.nullable, meta))
    return T.StructType(fields)


def apply_on_write(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Materialize omitted DEFAULT columns; provided columns pass through
    untouched (a default is a fallback, not a constraint)."""
    for name, expr in defaults(schema).items():
        if name not in df.columns:
            dtype = {f.name: f.dataType for f in schema.fields}[name]
            df = df.withColumn(name, F.expr(expr).cast(dtype))
    return df
