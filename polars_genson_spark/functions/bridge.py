"""Schema bridges: JSON Schema / Avro ⇄ pyspark ``StructType``.

The Spark analogue of polars-jsonschema-bridge
(/root/reference/polars-jsonschema-bridge/src/deserialise.rs:21-179 and
serialise.rs:65-112). Type mapping per SURVEY.md §1.2:

    string→StringType  integer→LongType  number→DoubleType
    boolean→BooleanType  array→ArrayType  object→StructType
    map→ArrayType(Struct<key,value>) (kv encoding parity; reference
    deserialise.rs:139-145) or MapType when ``kv_encoding=False``
    union ["null",T]→nullable T (first non-null branch,
    deserialise.rs:164-171)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

Json = Any


_JSON_PRIMITIVE_TYPES = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "null": T.NullType(),
}


def _json_type_to_spark(schema: Json, kv_encoding: bool) -> T.DataType:
    if isinstance(schema, list):  # legacy union
        non_null = [s for s in schema if s != "null"]
        if not non_null:
            return T.NullType()
        return _json_type_to_spark(non_null[0], kv_encoding)
    if not isinstance(schema, dict):
        # legacy unions carry bare type-name strings (['null','integer']):
        # map them like the Avro bridge does, instead of degrading every
        # member to string
        if isinstance(schema, str) and schema in _JSON_PRIMITIVE_TYPES:
            return _JSON_PRIMITIVE_TYPES[schema]
        return T.StringType()

    anyof = schema.get("anyOf")
    if isinstance(anyof, list):
        non_null = [
            s for s in anyof if not (isinstance(s, dict) and s.get("type") == "null")
        ]
        if non_null:
            return _json_type_to_spark(non_null[0], kv_encoding)
        return T.NullType()

    t = schema.get("type")
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if not non_null:
            return T.NullType()
        sub = dict(schema)
        sub["type"] = non_null[0]
        return _json_type_to_spark(sub, kv_encoding)

    if t == "string":
        return T.StringType()
    if t == "integer":
        return T.LongType()
    if t == "number":
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t == "null":
        return T.NullType()
    if t == "array":
        items = schema.get("items", {"type": "string"})
        if isinstance(items, list):
            # tuple-style positional items (reference TupleStrategy,
            # genson_rs/strategy/array.rs:153-237). Spark arrays are
            # homogeneous: identical positions collapse to that type,
            # mixed positions fall back to string elements — the same
            # degradation the reference bridge applies
            # (deserialise.rs:78-86 returns List[String] for tuple items).
            if not items:
                return T.ArrayType(T.StringType())
            elem_types = [_json_type_to_spark(s, kv_encoding) for s in items]
            if all(et == elem_types[0] for et in elem_types[1:]):
                return T.ArrayType(elem_types[0])
            return T.ArrayType(T.StringType())
        return T.ArrayType(_json_type_to_spark(items, kv_encoding))
    if t == "object":
        ap = schema.get("additionalProperties")
        props = schema.get("properties")
        # additionalProperties: false is a CLOSED object, not a map —
        # treating the boolean as a value schema produced a phantom
        # map<string,string> for a schema that declares NO extra keys
        if ap is not None and ap is not False and not props:
            value_type = _json_type_to_spark(ap, kv_encoding)
            if kv_encoding:
                return T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType(), True),
                            T.StructField("value", value_type, True),
                        ]
                    )
                )
            return T.MapType(T.StringType(), value_type)
        fields = [
            T.StructField(name, _json_type_to_spark(sub, kv_encoding), True)
            for name, sub in (props or {}).items()
        ]
        return T.StructType(fields)
    return T.StringType()


def json_schema_to_spark_schema(
    schema: Json, kv_encoding: bool = True
) -> T.DataType:
    return _json_type_to_spark(schema, kv_encoding)


_AVRO_PRIMITIVES = {
    "string": T.StringType(),
    "int": T.LongType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "null": T.NullType(),
    "bytes": T.BinaryType(),
}


def avro_to_spark_schema(schema: Json, kv_encoding: bool = True) -> T.DataType:
    if isinstance(schema, str):
        return _AVRO_PRIMITIVES.get(schema, T.StringType())
    if isinstance(schema, list):  # union → first non-null branch
        non_null = [s for s in schema if s != "null"]
        if not non_null:
            return T.NullType()
        return avro_to_spark_schema(non_null[0], kv_encoding)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        avro_to_spark_schema(f["type"], kv_encoding),
                        True,
                    )
                    for f in schema.get("fields", [])
                ]
            )
        if t == "map":
            value_type = avro_to_spark_schema(
                schema.get("values", "string"), kv_encoding
            )
            if kv_encoding:
                return T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType(), True),
                            T.StructField("value", value_type, True),
                        ]
                    )
                )
            return T.MapType(T.StringType(), value_type)
        if t == "array":
            return T.ArrayType(
                avro_to_spark_schema(schema.get("items", "string"), kv_encoding)
            )
        if isinstance(t, str):
            return _AVRO_PRIMITIVES.get(t, T.StringType())
    return T.StringType()


def spark_schema_to_json_schema(dtype: T.DataType) -> Json:
    """StructType → JSON Schema (the serialise.rs direction)."""
    if isinstance(dtype, T.StructType):
        props = {
            f.name: spark_schema_to_json_schema(f.dataType) for f in dtype.fields
        }
        required = sorted(f.name for f in dtype.fields if not f.nullable)
        out: Json = {"type": "object", "properties": props}
        if required:
            out["required"] = required
        return out
    if isinstance(dtype, T.ArrayType):
        return {
            "type": "array",
            "items": spark_schema_to_json_schema(dtype.elementType),
        }
    if isinstance(dtype, T.MapType):
        return {
            "type": "object",
            "additionalProperties": spark_schema_to_json_schema(
                dtype.valueType
            ),
        }
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return {"type": "integer"}
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, T.NullType):
        return {"type": "null"}
    return {"type": "string"}
