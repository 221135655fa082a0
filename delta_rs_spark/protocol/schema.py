"""Delta ``schemaString`` ⇄ Spark ``StructType``.

The Delta schema JSON vocabulary (struct/array/map + primitive names —
reference ``rust/src/schema.rs:120-147``) is the *same* vocabulary Spark uses
for ``StructType.jsonValue()``, so conversion is nearly free. The one
deliberate divergence: Delta ``timestamp`` maps to Spark ``TimestampType``
(µs); we do NOT copy the reference's ns quirk (``rust/src/delta_arrow.rs:96-99``).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# Delta primitive names == Spark JSON type names for this whole set:
# string long integer short byte float double boolean binary date timestamp
# decimal(p,s). struct/array/map containers share field layout too.


def schema_string_to_spark(schema_string: str) -> T.StructType:
    """Delta metaData.schemaString → Spark StructType."""
    return T.StructType.fromJson(json.loads(schema_string))


def spark_to_schema_string(schema: T.StructType) -> str:
    """Spark StructType → Delta schemaString (compact JSON)."""
    return json.dumps(_spark_json_to_delta(schema.jsonValue()), separators=(",", ":"))


def _spark_json_to_delta(node: Any) -> Any:
    """Normalize Spark's jsonValue to the Delta vocabulary.

    They coincide for every supported type, including ``timestamp_ntz``
    (public ``timestampNtz`` table feature — whether a table may USE it is
    gated in ``writer._normalize_timestamps``, not here) and ``variant``.
    Spellings Delta has no word for (``void``/``udt``/...) fail loudly.
    """
    if isinstance(node, str):
        if node in {
            "string", "long", "integer", "short", "byte", "float", "double",
            "boolean", "binary", "date", "timestamp", "timestamp_ntz",
            "variant",
        } or node.startswith("decimal("):
            # timestamp_ntz is the public timestampNtz table feature
            # (reader 3 / writer 7); the writer only emits it when the
            # table opts in — otherwise NTZ is cast to TIMESTAMP up front.
            # variant is the public variantType feature (reader 3 /
            # writer 7), always carried by the commit that introduces it
            return node
        raise ValueError(f"type {node!r} not representable in the Delta v0 schema model")
    if isinstance(node, dict):
        t = node.get("type")
        if t == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "name": f["name"],
                        "type": _spark_json_to_delta(f["type"]),
                        "nullable": f.get("nullable", True),
                        "metadata": f.get("metadata", {}),
                    }
                    for f in node["fields"]
                ],
            }
        if t == "array":
            return {
                "type": "array",
                "elementType": _spark_json_to_delta(node["elementType"]),
                "containsNull": node.get("containsNull", True),
            }
        if t == "map":
            return {
                "type": "map",
                "keyType": _spark_json_to_delta(node["keyType"]),
                "valueType": _spark_json_to_delta(node["valueType"]),
                "valueContainsNull": node.get("valueContainsNull", True),
            }
    raise ValueError(f"unsupported schema node: {node!r}")


def partition_value_to_typed(value: str | None, data_type: T.DataType) -> Any:
    """Hive partition *string* → typed Python value per the table schema.

    Mirrors the reference's string→typed reconstruction
    (``rust/src/checkpoints.rs:278-307``). ``None``/empty string → NULL
    (Hive's ``__HIVE_DEFAULT_PARTITION__`` is also treated as NULL).
    """
    if value is None or value == "" or value == "__HIVE_DEFAULT_PARTITION__":
        return None
    import datetime as _dt
    import decimal as _dec

    if isinstance(data_type, T.StringType):
        return value
    if isinstance(data_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(value)
    if isinstance(data_type, (T.DoubleType, T.FloatType)):
        return float(value)
    if isinstance(data_type, T.BooleanType):
        return value.lower() == "true"
    if isinstance(data_type, T.DecimalType):
        return _dec.Decimal(value)
    if isinstance(data_type, T.DateType):
        return _dt.date.fromisoformat(value)
    if isinstance(data_type, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(value)
    raise ValueError(f"partition column of type {data_type} not supported")


def partition_value_to_pyarrow(value: str | None, pa_type) -> Any:
    """Hive partition *string* → Python value suitable for a pyarrow array of
    ``pa_type`` (same reconstruction rules as ``partition_value_to_typed``)."""
    import pyarrow as pa

    if value is None or value == "" or value == "__HIVE_DEFAULT_PARTITION__":
        return None
    import datetime as _dt
    import decimal as _dec

    if pa.types.is_string(pa_type) or pa.types.is_large_string(pa_type):
        return value
    if pa.types.is_integer(pa_type):
        return int(value)
    if pa.types.is_floating(pa_type):
        return float(value)
    if pa.types.is_boolean(pa_type):
        return value.lower() == "true"
    if pa.types.is_decimal(pa_type):
        return _dec.Decimal(value)
    if pa.types.is_date(pa_type):
        return _dt.date.fromisoformat(value)
    if pa.types.is_timestamp(pa_type):
        return _dt.datetime.fromisoformat(value)
    raise ValueError(f"partition column of pyarrow type {pa_type} not supported")


# ---- Delta schema JSON → pyarrow (reference mapping delta_arrow.rs:50-137,
# minus its timestamp-ns quirk: we use µs, Spark/parquet-correct) -------------

_PA_PRIMITIVES = {
    "string": "string", "long": "int64", "integer": "int32", "short": "int16",
    "byte": "int8", "float": "float32", "double": "float64", "boolean": "bool_",
    "binary": "binary", "date": "date32",
}


def _delta_type_to_pyarrow(node: Any):
    import pyarrow as pa

    if isinstance(node, str):
        if node in _PA_PRIMITIVES:
            return getattr(pa, _PA_PRIMITIVES[node])()
        if node == "timestamp":
            return pa.timestamp("us")
        if node == "timestamp_ntz":
            return pa.timestamp("us")  # tz-naive in arrow; session TZ is UTC
        if node.startswith("decimal("):
            p, s = node[len("decimal("):-1].split(",")
            return pa.decimal128(int(p), int(s))
        if node == "variant":
            raise ValueError(
                "variant columns are not readable on the pyarrow driver "
                "path (this pyarrow has no VARIANT logical type); use the "
                "Spark path (to_df) instead"
            )
        raise ValueError(f"unsupported Delta primitive {node!r}")
    t = node.get("type")
    if t == "struct":
        import pyarrow as pa

        return pa.struct(
            [
                pa.field(f["name"], _delta_type_to_pyarrow(f["type"]), f.get("nullable", True))
                for f in node["fields"]
            ]
        )
    if t == "array":
        import pyarrow as pa

        return pa.list_(_delta_type_to_pyarrow(node["elementType"]))
    if t == "map":
        import pyarrow as pa

        return pa.map_(
            _delta_type_to_pyarrow(node["keyType"]), _delta_type_to_pyarrow(node["valueType"])
        )
    raise ValueError(f"unsupported Delta type node {node!r}")


def schema_json_to_pyarrow(schema_json: dict):
    """Delta metaData schema JSON → ``pyarrow.Schema``."""
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(f["name"], _delta_type_to_pyarrow(f["type"]), f.get("nullable", True))
            for f in schema_json["fields"]
        ]
    )
