"""Round-4 ninth review pass: namespace kwargs, dtype round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from polars_genson_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(
        app_name="pgs-tests-r4r9", master="local[4]", shuffle_partitions=4
    )


def test_namespace_config_plus_diagnostics(spark):
    """config= together with the ignored diagnostics must not TypeError
    (the early return left 'debug' behind for _reject_unknown)."""
    from polars_genson_spark.config import InferenceConfig

    df = spark.createDataFrame([('{"a": 1}',)], "doc string")
    out = df.genson.infer_json_schema(
        "doc", config=InferenceConfig(), debug=True, profile=True
    )
    assert out["properties"]["a"] == {"type": "integer"}


def test_map_key_type_round_trips():
    """map<int,string> keeps its key type through the dtype string (the
    hardcoded String key silently corrupted the round-trip)."""
    from polars_genson_spark.functions.dtypes import (
        format_dtype,
        parse_dtype,
    )

    s = format_dtype(T.MapType(T.LongType(), T.StringType()))
    assert s == "List[Struct[key:Int64,value:String]]"
    back = parse_dtype(s)
    assert back == T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.LongType(), True),
                T.StructField("value", T.StringType(), True),
            ]
        )
    )


def test_tz_aware_timestamp_round_trips():
    """TimestampType (an instant) must not collapse to NTZ: the bare
    'Datetime' round-trip silently shifted reads by the session tz."""
    from polars_genson_spark.functions.dtypes import (
        format_dtype,
        parse_dtype,
    )

    s = format_dtype(T.TimestampType())
    assert s == "Datetime(us, UTC)"
    assert parse_dtype(s) == T.TimestampType()
    # NTZ keeps its existing spellings
    assert format_dtype(T.TimestampNTZType()) == "Datetime"
    assert parse_dtype("Datetime") == T.TimestampNTZType()
    assert parse_dtype("Datetime(us)") == T.TimestampNTZType()
