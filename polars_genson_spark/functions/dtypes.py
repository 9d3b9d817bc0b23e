"""Concise dtype-string format ⇄ Spark types.

Spark analogue of the reference's dtype serialisation surface
(/root/reference/polars-genson-py/python/polars_genson/dtypes.py:13-130
and __init__.py:42-100: ``schema_to_json`` / ``json_to_schema``): a
schema serialises to a flat JSON object ``{column: dtype_string}`` using
the same concise strings (``Struct[id:Int64,name:String]``,
``List[String]``, ``Array[Int64,3]``, ``Decimal(10,2)``, ``Date``,
``Datetime``, ``Duration``, ...), parsed back with nested-bracket
awareness.

Type mapping notes (Spark has no unsigned ints or fixed-size arrays):

    Int64/32/16/8      ⇄ Long/Integer/Short/Byte
    UInt8/16/32        → Short/Integer/Long   (widened; re-serialises signed)
    UInt64             → Decimal(20,0)        (the only lossless container)
    Float64/Float32    ⇄ Double/Float
    Date               ⇄ DateType     Datetime ⇄ TimestampNTZType
    Time               → TimestampNTZType (no TimeType in pyspark's stable API)
    Duration           ⇄ DayTimeIntervalType
    Categorical        → StringType   Binary ⇄ BinaryType   Null ⇄ NullType
    List[T]            ⇄ ArrayType(T)
    Array[T,n]         → ArrayType(T) (size dropped; re-serialises List[T])
    Struct[f:T,...]    ⇄ StructType
"""

from __future__ import annotations

import json
import re

from pyspark.sql import types as T

_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    "String": T.StringType(),
    "Int64": T.LongType(),
    "Int32": T.IntegerType(),
    "Int16": T.ShortType(),
    "Int8": T.ByteType(),
    "UInt64": T.DecimalType(20, 0),
    "UInt32": T.LongType(),
    "UInt16": T.IntegerType(),
    "UInt8": T.ShortType(),
    "Float64": T.DoubleType(),
    "Float32": T.FloatType(),
    "Boolean": T.BooleanType(),
    "Date": T.DateType(),
    "Time": T.TimestampNTZType(),
    "Datetime": T.TimestampNTZType(),
    "Duration": T.DayTimeIntervalType(),
    "Null": T.NullType(),
    "Binary": T.BinaryType(),
    "Categorical": T.StringType(),
}


def parse_dtype(dtype_str: str) -> T.DataType:
    """Parse a concise dtype string into a Spark DataType
    (reference ``_parse_polars_dtype``, dtypes.py:13-101)."""
    dtype_str = dtype_str.strip()

    if dtype_str.startswith("Decimal"):
        m = re.match(r"Decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", dtype_str)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 9)  # "Decimal" without parameters

    # Datetime/Duration may carry (time_unit[, tz]) parameters — the unit
    # does not change the Spark type, but a TIME ZONE makes it an instant
    # (tz-aware TimestampType), not wall-clock NTZ: dropping it silently
    # shifted round-tripped data by the session timezone
    base = re.match(r"(Datetime|Duration|Time)\s*\(", dtype_str)
    if base:
        if base.group(1) == "Datetime":
            m = re.match(r"Datetime\s*\(([^)]*)\)", dtype_str)
            params = [p.strip() for p in (m.group(1) if m else "").split(",")]
            if len(params) > 1 and params[1] not in ("", "None", "null"):
                return T.TimestampType()
        return _SIMPLE_TO_SPARK[base.group(1)]

    if dtype_str in _SIMPLE_TO_SPARK:
        return _SIMPLE_TO_SPARK[dtype_str]

    if dtype_str.startswith("List[") and dtype_str.endswith("]"):
        return T.ArrayType(parse_dtype(dtype_str[5:-1]))

    if dtype_str.startswith("Array[") and dtype_str.endswith("]"):
        inner = dtype_str[6:-1]
        if "," in inner:
            head, size = inner.rsplit(",", 1)
            try:
                int(size.strip())
                return T.ArrayType(parse_dtype(head.strip()))
            except ValueError:
                pass
        return T.ArrayType(parse_dtype(inner))

    if dtype_str.startswith("Struct[") and dtype_str.endswith("]"):
        fields_str = dtype_str[7:-1]
        if not fields_str:
            return T.StructType([])
        fields = []
        for part in _split_struct_fields(fields_str):
            if ":" not in part:
                continue
            name, type_str = part.split(":", 1)
            fields.append(
                T.StructField(name.strip(), parse_dtype(type_str.strip()), True)
            )
        return T.StructType(fields)

    return T.StringType()  # reference fallback (dtypes.py:100-101)


def _split_struct_fields(fields_str: str) -> list[str]:
    """Split struct fields by comma, bracket/paren aware
    (reference dtypes.py:104-130)."""
    fields, current, bracket, paren = [], "", 0, 0
    for ch in fields_str:
        if ch == "[":
            bracket += 1
        elif ch == "]":
            bracket -= 1
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif ch == "," and bracket == 0 and paren == 0:
            if current.strip():
                fields.append(current.strip())
            current = ""
            continue
        current += ch
    if current.strip():
        fields.append(current.strip())
    return fields


def format_dtype(dtype: T.DataType) -> str:
    """Spark DataType → concise dtype string (the serialise direction)."""
    if isinstance(dtype, T.StructType):
        inner = ",".join(
            f"{f.name}:{format_dtype(f.dataType)}" for f in dtype.fields
        )
        return f"Struct[{inner}]"
    if isinstance(dtype, T.ArrayType):
        return f"List[{format_dtype(dtype.elementType)}]"
    if isinstance(dtype, T.MapType):
        # maps serialise as their kv-encoded shape, like the engine's
        # default map encoding — preserving the ACTUAL key type (the old
        # hardcoded String silently corrupted map<int,...> round-trips
        # while schema_to_dict reported the correct key type)
        return (
            f"List[Struct[key:{format_dtype(dtype.keyType)},value:"
            f"{format_dtype(dtype.valueType)}]]"
        )
    if isinstance(dtype, T.DecimalType):
        if (dtype.precision, dtype.scale) == (20, 0):
            return "UInt64"
        return f"Decimal({dtype.precision},{dtype.scale})"
    mapping = [
        (T.StringType, "String"),
        (T.LongType, "Int64"),
        (T.IntegerType, "Int32"),
        (T.ShortType, "Int16"),
        (T.ByteType, "Int8"),
        (T.DoubleType, "Float64"),
        (T.FloatType, "Float32"),
        (T.BooleanType, "Boolean"),
        (T.DateType, "Date"),
        (T.TimestampNTZType, "Datetime"),
        # tz-aware timestamps are instants: polars spells that
        # Datetime(us, UTC); a bare "Datetime" would parse back as NTZ
        # and silently shift wall-clock reads by the session timezone
        (T.TimestampType, "Datetime(us, UTC)"),
        (T.DayTimeIntervalType, "Duration"),
        (T.NullType, "Null"),
        (T.BinaryType, "Binary"),
    ]
    for cls, name in mapping:
        if isinstance(dtype, cls):
            return name
    return "String"


def schema_to_json(schema: T.StructType) -> str:
    """StructType → flat ``{column: dtype_string}`` JSON
    (reference __init__.py:60-79)."""
    return json.dumps(
        {f.name: format_dtype(f.dataType) for f in schema.fields}
    )


def json_to_schema(json_str: str) -> T.StructType:
    """Flat ``{column: dtype_string}`` JSON → StructType
    (reference __init__.py:82-100)."""
    parsed = json.loads(json_str)
    if not isinstance(parsed, dict):
        raise ValueError(
            f"schema JSON must be an object of column→dtype, got "
            f"{type(parsed).__name__}"
        )
    return T.StructType(
        [
            T.StructField(name, parse_dtype(str(ds)), True)
            for name, ds in parsed.items()
        ]
    )


def _dtype_to_dict(dtype: T.DataType):
    """Recursively convert a Spark dtype to a nested Python dict
    (reference __init__.py:1260-1271 ``_dtype_to_dict``)."""
    if isinstance(dtype, T.StructType):
        return {f.name: _dtype_to_dict(f.dataType) for f in dtype.fields}
    if isinstance(dtype, T.ArrayType):
        return {"list": _dtype_to_dict(dtype.elementType)}
    if isinstance(dtype, T.MapType):
        return {
            "map": {
                "key": _dtype_to_dict(dtype.keyType),
                "value": _dtype_to_dict(dtype.valueType),
            }
        }
    return format_dtype(dtype)


def schema_to_dict(schema: T.StructType) -> dict:
    """StructType → nested Python dict (reference __init__.py:1272-1277)."""
    if not isinstance(schema, T.StructType):
        raise TypeError(f"Expected StructType, got {type(schema)}")
    return {f.name: _dtype_to_dict(f.dataType) for f in schema.fields}


def avro_to_spark_schema(avro_schema_json: str) -> T.StructType:
    """Avro schema JSON string → StructType
    (reference ``avro_to_polars_schema``, __init__.py:1236-1257)."""
    from .bridge import avro_to_spark_schema as _bridge_avro

    parsed = json.loads(avro_schema_json)
    dt = _bridge_avro(parsed)
    if isinstance(dt, T.StructType):
        return dt
    return T.StructType([T.StructField("value", dt, True)])
