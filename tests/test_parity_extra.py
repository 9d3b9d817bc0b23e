"""Extra reference-parity coverage: map encodings (entries/mapping),
property-order determinism, bridge round-trips, and hypothesis
property-based monoid laws over random JSON documents.

Reference behaviours mirrored:
- map encodings (normalise.rs:41-56; map_encoding tests)
- property insertion order = first-seen order (strategy/object.rs:17-18,
  order-sensitivity test at object.rs:295-317) made merge-order-invariant
  by partition-id-ordered driver merge
- schema ser/de round-trip (polars-genson-py/src/schema.rs:19-95)
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_genson_spark.config import (
    InferenceConfig,
    NormaliseConfig,
)
from polars_genson_spark.functions import summary as S
from polars_genson_spark.functions.bridge import (
    json_schema_to_spark_schema,
    spark_schema_to_json_schema,
)
from polars_genson_spark.functions.normalise import normalise_document


# ---------------------------------------------------------------------------
# Map encodings
# ---------------------------------------------------------------------------

MAP_SCHEMA = {
    "type": "record",
    "name": "document",
    "fields": [
        {
            "name": "labels",
            "type": {"type": "map", "values": "string"},
        }
    ],
}


def _norm(doc, encoding):
    cfg = NormaliseConfig(map_encoding=encoding)
    return normalise_document(doc, MAP_SCHEMA, cfg)


def test_map_encoding_kv():
    out = _norm({"labels": {"en": "cat", "fr": "chat"}}, "kv")
    assert out["labels"] == [
        {"key": "en", "value": "cat"},
        {"key": "fr", "value": "chat"},
    ]


def test_map_encoding_mapping():
    out = _norm({"labels": {"en": "cat"}}, "mapping")
    assert out["labels"] == {"en": "cat"}


def test_map_encoding_entries():
    out = _norm({"labels": {"en": "cat"}}, "entries")
    assert out["labels"] == [{"en": "cat"}]


# ---------------------------------------------------------------------------
# Property-order determinism (the §7.3-1 hazard)
# ---------------------------------------------------------------------------


def test_property_order_is_first_seen():
    node = S.new_summary()
    S.observe(node, {"b": 1, "a": 2})
    S.observe(node, {"c": 3, "a": 4})
    schema = S.to_schema(node)
    assert list(schema["properties"]) == ["b", "a", "c"]


def test_property_order_merge_follows_left_then_right():
    left, right = S.new_summary(), S.new_summary()
    S.observe(left, {"x": 1})
    S.observe(right, {"y": 1, "x": 2})
    merged = S.new_summary()
    S.merge(merged, left)
    S.merge(merged, right)
    assert list(S.to_schema(merged)["properties"]) == ["x", "y"]


# ---------------------------------------------------------------------------
# Bridge round-trip
# ---------------------------------------------------------------------------


def test_bridge_roundtrip_nested():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "tags": {"type": "array", "items": {"type": "integer"}},
            "meta": {
                "type": "object",
                "properties": {"score": {"type": "number"}},
            },
        },
    }
    st_type = json_schema_to_spark_schema(schema)
    back = spark_schema_to_json_schema(st_type)
    assert back["properties"]["name"] == {"type": "string"}
    assert back["properties"]["tags"]["items"] == {"type": "integer"}
    assert back["properties"]["meta"]["properties"]["score"] == {
        "type": "number"
    }


def test_bridge_map_kv_and_native():
    schema = {"type": "object", "additionalProperties": {"type": "string"}}
    kv = json_schema_to_spark_schema(schema, kv_encoding=True)
    assert kv.simpleString() == "array<struct<key:string,value:string>>"
    native = json_schema_to_spark_schema(schema, kv_encoding=False)
    assert native.simpleString() == "map<string,string>"


# ---------------------------------------------------------------------------
# Hypothesis: monoid laws over random JSON documents
# ---------------------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d", "e"]), children, max_size=4
        ),
    ),
    max_leaves=12,
)
json_docs = st.dictionaries(
    st.sampled_from(["k1", "k2", "k3", "k4"]), json_values, max_size=4
)


def _canon(schema):
    """Schema equality modulo property order (merge order legitimately
    changes first-seen order; everything else must be identical)."""
    return json.dumps(schema, sort_keys=True)


@settings(max_examples=60, deadline=None)
@given(st.lists(json_docs, min_size=1, max_size=12), st.integers(0, 11))
def test_split_fold_equals_whole_fold(docs, cut):
    cut = min(cut, len(docs))
    whole = S.new_summary()
    for d in docs:
        S.observe(whole, d)

    left, right = S.new_summary(), S.new_summary()
    for d in docs[:cut]:
        S.observe(left, d)
    for d in docs[cut:]:
        S.observe(right, d)
    merged = S.new_summary()
    S.merge(merged, left)
    S.merge(merged, right)

    assert _canon(S.to_schema(merged)) == _canon(S.to_schema(whole))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(json_docs, min_size=1, max_size=6),
    st.lists(json_docs, min_size=1, max_size=6),
    st.lists(json_docs, min_size=1, max_size=6),
)
def test_merge_associative_random(a_docs, b_docs, c_docs):
    def summarise(ds):
        n = S.new_summary()
        for d in ds:
            S.observe(n, d)
        return n

    a, b, c = summarise(a_docs), summarise(b_docs), summarise(c_docs)

    ab = S.new_summary()
    S.merge(ab, a)
    S.merge(ab, b)
    ab_c = S.new_summary()
    S.merge(ab_c, ab)
    S.merge(ab_c, c)

    bc = S.new_summary()
    S.merge(bc, b)
    S.merge(bc, c)
    a_bc = S.new_summary()
    S.merge(a_bc, a)
    S.merge(a_bc, bc)

    assert _canon(S.to_schema(ab_c)) == _canon(S.to_schema(a_bc))


@settings(max_examples=40, deadline=None)
@given(st.lists(json_docs, min_size=1, max_size=10))
def test_normalise_idempotent_random(docs):
    """normalise(normalise(x)) == normalise(x) against the inferred Avro
    schema — enforcement is a projection."""
    from polars_genson_spark.functions.avro import json_schema_to_avro
    from polars_genson_spark.functions.rewrite import postprocess_schema

    node = S.new_summary()
    for d in docs:
        S.observe(node, d)
    schema = S.to_schema(node)
    if not isinstance(schema, dict) or schema.get("type") != "object":
        return
    postprocess_schema(schema, InferenceConfig())
    avro = json_schema_to_avro(schema)
    cfg = NormaliseConfig()
    for d in docs:
        once = normalise_document(d, avro, cfg)
        twice = normalise_document(once, avro, cfg)
        assert once == twice


def test_genson_namespace_accessor(spark):
    """df.genson.* parity with the reference's registered namespace:
    infer (json + spark schema, kwargs as config knobs), normalise with
    decode-by-default, schema_to_json of the frame's own schema."""
    import json

    import polars_genson_spark  # noqa: F401 — registers the namespace

    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2}',)], "json_data string"
    )
    js = df.genson.infer_json_schema("json_data")
    assert js["type"] == "object" and set(js["properties"]) == {"a", "b"}
    assert js["required"] == ["a"]

    st = df.genson.infer_spark_schema("json_data")
    assert {f.name for f in st.fields} == {"a", "b"}
    # reference alias + a config kwarg routed into InferenceConfig
    st2 = df.genson.infer_polars_schema("json_data", map_threshold=1)
    assert st2 is not None

    out = df.genson.normalise_json("json_data")
    assert set(out.columns) == {"a", "b"}  # decode=True unnests by default

    sj = json.loads(df.genson.schema_to_json())
    assert sj == {"json_data": "String"}
