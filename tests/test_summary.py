"""Pure-python monoid tests (no Spark): observe/merge/to_schema semantics
mirroring the reference's builder tests (genson_rs/mod.rs:160-218)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_genson_spark.functions import summary as S


def fold(docs):
    node = S.new_summary()
    for d in docs:
        S.observe(node, d)
    return node


def test_basic_record_merge_f1():
    docs = [
        {"name": "Alice", "age": 30},
        {"name": "Bob", "age": 25, "city": "NYC"},
        {"name": "Charlie", "age": 35, "email": "charlie@example.com"},
    ]
    schema = S.to_schema(fold(docs))
    assert schema["type"] == "object"
    assert schema["properties"]["name"] == {"type": "string"}
    assert schema["properties"]["age"] == {"type": "integer"}
    assert schema["properties"]["city"] == {"type": "string"}
    assert schema["properties"]["email"] == {"type": "string"}
    # required = intersection, sorted (object.rs:258-264)
    assert schema["required"] == ["age", "name"]


def test_numeric_widening():
    schema = S.to_schema(fold([{"x": 1}, {"x": 2.5}]))
    assert schema["properties"]["x"] == {"type": "number"}
    # and in either merge order
    schema = S.to_schema(fold([{"x": 2.5}, {"x": 1}]))
    assert schema["properties"]["x"] == {"type": "number"}


def test_scalar_union_sorted_alphabetically():
    schema = S.to_schema(fold([{"x": 1}, {"x": "s"}]))
    assert schema["properties"]["x"] == {"type": ["integer", "string"]}


def test_union_with_complex_anyof_f2():
    docs = [
        {"id": 1, "nums": [0], "strs": "a"},
        {"id": 2, "nums": [1, 2], "strs": ["b"]},
        {"id": 3, "nums": [3, 4, 5], "strs": ["c", "d", "e"]},
    ]
    schema = S.to_schema(fold(docs))
    strs = schema["properties"]["strs"]
    # complex schemas first (insertion), scalars collapsed last
    # (node.rs:143-182); here array was seen second but scalars go last
    assert strs == {
        "anyOf": [
            {"type": "array", "items": {"type": "string"}},
            {"type": "string"},
        ]
    }
    assert schema["properties"]["nums"] == {
        "type": "array",
        "items": {"type": "integer"},
    }


def test_nested_objects_and_nulls():
    docs = [{"a": {"b": None}}, {"a": {"b": 1}}]
    schema = S.to_schema(fold(docs))
    assert schema["properties"]["a"]["properties"]["b"] == {
        "type": ["integer", "null"]
    }


def test_empty_object():
    schema = S.to_schema(fold([{}]))
    assert schema == {"type": "object"}


def test_empty_array_has_no_items():
    schema = S.to_schema(fold([{"xs": []}]))
    assert schema["properties"]["xs"] == {"type": "array"}


def test_merge_equivalent_to_sequential_fold():
    docs = [
        {"name": "Alice", "age": 30},
        {"name": "Bob", "age": 25, "city": "NYC"},
        {"name": "C", "tags": ["x"], "age": 1.5},
        {"deep": {"a": [1, {"b": True}]}},
    ]
    whole = fold(docs)
    left, right = fold(docs[:2]), fold(docs[2:])
    merged = S.merge(left, right)
    assert S.to_schema(merged) == S.to_schema(whole)


def test_merge_associative():
    a = fold([{"x": 1}])
    b = fold([{"x": "s", "y": 2}])
    c = fold([{"y": 2.5, "z": [None]}])
    import copy

    ab_c = S.merge(S.merge(copy.deepcopy(a), copy.deepcopy(b)), copy.deepcopy(c))
    a_bc = S.merge(copy.deepcopy(a), S.merge(copy.deepcopy(b), copy.deepcopy(c)))
    assert S.to_schema(ab_c) == S.to_schema(a_bc)


json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=4), children, max_size=4),
    ),
    max_leaves=12,
)


@given(st.lists(json_values, min_size=1, max_size=8), st.integers(0, 7))
@settings(max_examples=60, deadline=None)
def test_split_fold_matches_whole_fold(docs, split):
    split = split % len(docs)
    whole = S.to_schema(fold(docs))
    merged = S.to_schema(S.merge(fold(docs[:split]), fold(docs[split:])))
    assert whole == merged


def test_summary_json_roundtrip():
    node = fold([{"a": [1, "x"], "b": {"c": None}}])
    assert json.loads(json.dumps(node)) == node
