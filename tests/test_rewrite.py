"""Map inference / unification / scalar promotion — fixtures F3, F4, F5
(reference: unify_maps_test.py, map_max_required_keys_test.py behaviours)."""

from __future__ import annotations

import json

from polars_genson_spark import InferenceConfig, infer_json_schema
from polars_genson_spark.functions.rewrite import (
    check_unifiable_schemas,
    postprocess_schema,
    reorder_unions,
)

from conftest import make_json_df


def test_f3_map_inference_by_key_cardinality(spark):
    labels = {
        "en": "human", "fr": "être humain", "de": "Mensch",
        "es": "humano", "it": "umano", "pt": "humano",
    }
    df = make_json_df(spark, [json.dumps({"labels": labels})])
    cfg = InferenceConfig(map_threshold=5)
    schema = infer_json_schema(df, "json_data", cfg).schema
    labels_schema = schema["properties"]["labels"]
    assert labels_schema == {
        "type": "object",
        "additionalProperties": {"type": "string"},
    }


def test_f3_below_threshold_stays_record(spark):
    df = make_json_df(
        spark, ['{"labels": {"en": "Hello", "fr": "Bonjour"}}']
    )
    cfg = InferenceConfig(map_threshold=20)
    schema = infer_json_schema(df, "json_data", cfg).schema
    assert "properties" in schema["properties"]["labels"]


def test_f3_avro_map(spark):
    df = make_json_df(
        spark,
        [
            '{"labels": {"en": "Hello", "fr": "Bonjour"}}',
            '{"labels": {"de": "Hallo", "es": "Hola"}}',
        ],
    )
    cfg = InferenceConfig(map_threshold=2, avro=True)
    avro = infer_json_schema(df, "json_data", cfg).schema
    labels = next(f for f in avro["fields"] if f["name"] == "labels")
    assert labels["type"]["type"] == "map"
    assert labels["type"]["values"] == "string"


F4 = [
    '{"letter": {"a": {"alphabet": 0, "vowel": 0, "frequency": 0.0817}}}',
    '{"letter": {"b": {"alphabet": 1, "consonant": 0, "frequency": 0.0150}}}',
    '{"letter": {"c": {"alphabet": 2, "consonant": 1, "frequency": 0.0278}}}',
    '{"letter": {"d": {"alphabet": 3, "consonant": 2, "frequency": 0.0425}}}',
    '{"letter": {"e": {"alphabet": 4, "vowel": 4, "frequency": 0.1270}}}',
]


def test_f4_unify_maps_selective_nullability(spark):
    df = make_json_df(spark, F4)
    cfg = InferenceConfig(map_threshold=5, unify_maps=True, avro=True)
    avro = infer_json_schema(df, "json_data", cfg).schema
    letter = next(f for f in avro["fields"] if f["name"] == "letter")
    assert letter["type"]["type"] == "map"
    values = letter["type"]["values"]
    assert values["type"] == "record"
    ftypes = {f["name"]: f["type"] for f in values["fields"]}
    assert set(ftypes) == {"alphabet", "frequency", "vowel", "consonant"}
    assert ftypes["alphabet"] == "int"
    assert ftypes["frequency"] == "float"
    assert ftypes["vowel"] == ["null", "int"]
    assert ftypes["consonant"] == ["null", "int"]


def test_f4_without_unify_no_map(spark):
    df = make_json_df(spark, F4)
    cfg = InferenceConfig(map_threshold=5, unify_maps=False)
    schema = infer_json_schema(df, "json_data", cfg).schema
    assert "additionalProperties" not in schema["properties"]["letter"]


def test_f5_force_scalar_promotion(spark):
    df = make_json_df(spark, ['{"precision": 11}', '{"precision": 12}'])
    cfg = InferenceConfig(force_scalar_promotion=frozenset({"precision"}))
    schema = infer_json_schema(df, "json_data", cfg).schema
    precision = schema["properties"]["precision"]
    assert precision["type"] == "object"
    assert "precision__integer" in precision["properties"]


def test_mixed_scalar_promotion_unification():
    cfg = InferenceConfig(unify_maps=True)
    unified = check_unifiable_schemas(
        [
            {"type": "object", "properties": {"v": {"type": "string"}}},
            {"type": "object", "properties": {"v": {"type": "integer"}}},
        ],
        "root",
        cfg,
    )
    v = unified["properties"]["v"]
    assert set(v["properties"]) == {"v__string", "v__integer"}


def test_force_field_types_map(spark):
    df = make_json_df(spark, ['{"labels": {"en": "x"}}'])
    cfg = InferenceConfig(force_field_types={"labels": "map"})
    schema = infer_json_schema(df, "json_data", cfg).schema
    assert schema["properties"]["labels"]["additionalProperties"] == {
        "type": "string"
    }


def test_map_max_required_keys_gate(spark):
    # all 3 keys appear in the single doc → all required → above max_rk
    doc = {"cfg": {"a": 1, "b": 2, "c": 3}}
    df = make_json_df(spark, [json.dumps(doc)])
    blocked = InferenceConfig(map_threshold=3, map_max_required_keys=1)
    schema = infer_json_schema(df, "json_data", blocked).schema
    assert "properties" in schema["properties"]["cfg"]  # stayed a record

    allowed = InferenceConfig(map_threshold=3, map_max_required_keys=3)
    schema = infer_json_schema(df, "json_data", allowed).schema
    assert "additionalProperties" in schema["properties"]["cfg"]


def test_no_root_map(spark):
    doc = {f"k{i}": i for i in range(25)}
    df = make_json_df(spark, [json.dumps(doc)])
    schema = infer_json_schema(df, "json_data", InferenceConfig()).schema
    assert "properties" in schema  # root survives map inference

    import dataclasses

    cfg = dataclasses.replace(InferenceConfig(), no_root_map=False)
    schema = infer_json_schema(df, "json_data", cfg).schema
    assert "additionalProperties" in schema


def test_union_reorder_rank():
    schema = {"type": ["string", "integer", "array", "null", "boolean"]}
    reorder_unions(schema)
    assert schema["type"] == ["null", "array", "boolean", "integer", "string"]
    # ["null", T] preserved as-is
    schema2 = {"type": ["integer", "null"]}
    reorder_unions(schema2)
    assert schema2["type"] == ["integer", "null"]


def test_identical_map_of_records_fast_path():
    rec = {
        "type": "object",
        "properties": {"x": {"type": "integer"}},
        "required": ["x"],
    }
    schema = {
        "type": "object",
        "properties": {"a": dict(rec), "b": dict(rec), "c": dict(rec)},
        "required": ["a", "b", "c"],
    }
    cfg = InferenceConfig(map_threshold=3)
    postprocess_schema(schema, cfg)
    # the identical-children fast path (map_inference.rs:462-478) runs
    # BEFORE the no_root_map guard, so even the root converts
    assert schema["additionalProperties"] == rec

    inner = {
        "type": "object",
        "properties": {
            "wrap": {
                "type": "object",
                "properties": {"a": dict(rec), "b": dict(rec), "c": dict(rec)},
                "required": ["a", "b", "c"],
            }
        },
        "required": ["wrap"],
    }
    postprocess_schema(inner, cfg)
    assert inner["properties"]["wrap"]["additionalProperties"] == rec
