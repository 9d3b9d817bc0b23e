"""Dtype-string serialisation round-trips, mirroring the reference's
schema_ser_deser_test.py (/root/reference/polars-genson-py/tests/), plus
tuple-style array schemas through the bridge."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from polars_genson_spark import json_to_schema, parse_dtype, schema_to_json
from polars_genson_spark.functions.bridge import json_schema_to_spark_schema


def test_basic_schema_to_json():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("c", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    parsed = json.loads(schema_to_json(schema))
    assert parsed == {
        "a": "Int64",
        "b": "Boolean",
        "c": "String",
        "d": "Float64",
    }


def test_complex_schema_round_trip():
    schema = T.StructType(
        [
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "settings",
                            T.StructType(
                                [
                                    T.StructField("theme", T.StringType()),
                                    T.StructField(
                                        "notifications", T.BooleanType()
                                    ),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("scores", T.ArrayType(T.DoubleType())),
            T.StructField(
                "metadata",
                T.StructType(
                    [
                        T.StructField("created", T.DateType()),
                        T.StructField("updated", T.TimestampNTZType()),
                    ]
                ),
            ),
        ]
    )
    assert json_to_schema(schema_to_json(schema)) == _nullable(schema)


def test_decimal_duration_date_round_trip():
    schema = T.StructType(
        [
            T.StructField("price", T.DecimalType(10, 2)),
            T.StructField("tax", T.DecimalType(5, 4)),
            T.StructField("id", T.LongType()),
            T.StructField("date_col", T.DateType()),
            T.StructField("datetime_col", T.TimestampNTZType()),
            T.StructField("duration_col", T.DayTimeIntervalType()),
        ]
    )
    out = json.loads(schema_to_json(schema))
    assert out["price"] == "Decimal(10,2)"
    assert out["duration_col"] == "Duration"
    assert json_to_schema(schema_to_json(schema)) == _nullable(schema)


def test_nested_list_round_trip():
    schema = T.StructType(
        [
            T.StructField("matrix", T.ArrayType(T.ArrayType(T.LongType()))),
            T.StructField("simple_list", T.ArrayType(T.StringType())),
            T.StructField(
                "struct_list",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField("value", T.DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    assert json.loads(schema_to_json(schema))["matrix"] == "List[List[Int64]]"
    assert json_to_schema(schema_to_json(schema)) == _nullable(schema)


def test_empty_schema_round_trip():
    assert json.loads(schema_to_json(T.StructType([]))) == {}
    assert json_to_schema("{}") == T.StructType([])


def test_manual_json_to_schema():
    schema = json_to_schema(
        json.dumps({"name": "String", "age": "Int64", "active": "Boolean"})
    )
    assert schema["name"].dataType == T.StringType()
    assert schema["age"].dataType == T.LongType()
    assert schema["active"].dataType == T.BooleanType()


def test_unsigned_and_small_ints():
    """Reference dtypes.py:27-45: the full signed/unsigned ladder parses;
    unsigned types widen (Spark has none) and UInt64 keeps losslessness
    via Decimal(20,0)."""
    assert parse_dtype("Int8") == T.ByteType()
    assert parse_dtype("Int16") == T.ShortType()
    assert parse_dtype("UInt8") == T.ShortType()
    assert parse_dtype("UInt16") == T.IntegerType()
    assert parse_dtype("UInt32") == T.LongType()
    assert parse_dtype("UInt64") == T.DecimalType(20, 0)
    rt = json_to_schema(
        schema_to_json(T.StructType([T.StructField("u", T.DecimalType(20, 0))]))
    )
    assert rt["u"].dataType == T.DecimalType(20, 0)


def test_parameterised_and_fixed_size_variants():
    assert parse_dtype("Datetime(us)") == T.TimestampNTZType()
    assert parse_dtype("Duration(ms)") == T.DayTimeIntervalType()
    assert parse_dtype("Array[Int64,3]") == T.ArrayType(T.LongType())
    assert parse_dtype("Array[Struct[a:Int64],4]") == T.ArrayType(
        T.StructType([T.StructField("a", T.LongType(), True)])
    )
    assert parse_dtype("Decimal") == T.DecimalType(38, 9)
    # nested brackets + parens inside struct field split
    nested = parse_dtype("Struct[a:List[Struct[b:Decimal(10,2)]],c:String]")
    assert nested == T.StructType(
        [
            T.StructField(
                "a",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("b", T.DecimalType(10, 2), True)]
                    )
                ),
                True,
            ),
            T.StructField("c", T.StringType(), True),
        ]
    )


def test_invalid_json_to_schema():
    with pytest.raises(Exception):
        json_to_schema("{'invalid': json}")
    with pytest.raises(ValueError):
        json_to_schema(json.dumps(["not", "a", "schema"]))


def test_tuple_style_array_schemas():
    """Positional items (reference TupleStrategy, array.rs:153-237):
    homogeneous tuples collapse to that element type, mixed tuples degrade
    to string elements exactly like the reference bridge
    (deserialise.rs:78-86)."""
    homog = json_schema_to_spark_schema(
        {"type": "array", "items": [{"type": "integer"}, {"type": "integer"}]}
    )
    assert homog == T.ArrayType(T.LongType())
    mixed = json_schema_to_spark_schema(
        {"type": "array", "items": [{"type": "integer"}, {"type": "string"}]}
    )
    assert mixed == T.ArrayType(T.StringType())
    empty = json_schema_to_spark_schema({"type": "array", "items": []})
    assert empty == T.ArrayType(T.StringType())


def _nullable(schema: T.StructType) -> T.StructType:
    """json_to_schema emits all-nullable fields (JSON has no nullability
    at the dtype-string level), so compare against the nullable twin."""

    def nb(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, nb(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(nb(dt.elementType), dt.containsNull)
        return dt

    return nb(schema)  # type: ignore[return-value]


def test_schema_to_dict_nested():
    from polars_genson_spark import schema_to_dict

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "user",
                T.StructType([T.StructField("name", T.StringType())]),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    assert schema_to_dict(schema) == {
        "id": "Int64",
        "user": {"name": "String"},
        "tags": {"list": "String"},
    }
    with pytest.raises(TypeError):
        schema_to_dict({"not": "a schema"})


def test_avro_to_spark_schema():
    from polars_genson_spark import avro_to_spark_schema

    avro = json.dumps(
        {
            "type": "record",
            "name": "doc",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "maybe", "type": ["null", "double"]},
            ],
        }
    )
    st = avro_to_spark_schema(avro)
    assert st["id"].dataType == T.LongType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["maybe"].dataType == T.DoubleType()
