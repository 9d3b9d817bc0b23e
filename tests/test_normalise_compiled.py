"""Pin: the compiled normalise kernel is bit-identical to the
interpreted normalise_value on every schema branch and config knob.

The compiled path (functions/normalise.compile_normaliser) exists purely
as a round-6 performance rewrite; any semantic drift from the
reference-parity interpreter is a correctness bug, so this sweeps an
adversarial (schema, value, config) grid through both and compares the
canonical JSON of the results.
"""

from __future__ import annotations

import itertools
import json
import random

from polars_genson_spark.config import NormaliseConfig
from polars_genson_spark.functions.normalise import (
    compile_document_normaliser,
    compile_normaliser,
    normalise_document,
    normalise_value,
)

SCHEMAS = [
    "string",
    "int",
    "long",
    "double",
    "float",
    "boolean",
    "null",
    "weird_type",
    [],
    ["null"],
    ["null", "string"],
    ["null", "int"],
    ["string", "int"],
    ["null", {"type": "array", "items": "int"}],
    {"type": "array", "items": "string"},
    {"type": "array", "items": {"type": "array", "items": "int"}},
    {"type": "map", "values": "string"},
    {"type": "map", "values": {"type": "map", "values": "int"}},
    {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "string"},
            {"name": "b", "type": ["null", "long"]},
            {"name": "c__int", "type": "int"},
            {"name": "c__string", "type": "string"},
            {"name": "d", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "array", "items": "double"}},
            {"name": "broken"},  # no type: skipped by both
        ],
    },
    {
        "type": "record",
        "name": "outer",
        "fields": [
            {
                "name": "inner",
                "type": {
                    "type": "record",
                    "name": "i",
                    "fields": [
                        {"name": "x__boolean", "type": "boolean"},
                        {"name": "y", "type": {"type": "map", "values": "long"}},
                    ],
                },
            }
        ],
    },
    {"type": "unknown_kind", "whatever": 1},
    12345,  # non-str/list/dict schema: identity in both
]

VALUES = [
    None,
    True,
    False,
    0,
    1,
    -7,
    2**63,          # out-of-i64 int: nulled by int schema
    -(2**63) - 1,
    3.5,
    "hello",
    "42",
    "1",
    "true",
    "false",
    "0",
    "nope",
    "héllo wörld ünïcode",
    [],
    [1, 2, 3],
    ["a", None, 5],
    [[1], [2, "x"]],
    {},
    {"a": "x"},
    {"a": 5, "b": 2, "c__int": 1},
    {"d": {"k1": "v1", "k2": 2}, "e": [1.5, "2.5", None]},
    {"inner": {"x__boolean": True, "y": {"m": 9}}},
    {"inner": 5},
    {"unknown_extra": 1},
]

CONFIGS = [
    NormaliseConfig(),
    NormaliseConfig(coerce_string=True),
    NormaliseConfig(empty_as_null=True),
    NormaliseConfig(map_encoding="mapping"),
    NormaliseConfig(map_encoding="entries"),
    NormaliseConfig(coerce_string=True, empty_as_null=True,
                    map_encoding="mapping"),
    NormaliseConfig(wrap_root="root"),
]


def _canon(v):
    return json.dumps(v, sort_keys=False, separators=(",", ":"),
                      default=str)


def test_compiled_matches_interpreted_grid():
    n = 0
    for schema, cfg in itertools.product(SCHEMAS, CONFIGS):
        compiled = compile_normaliser(schema, cfg)
        for value in VALUES:
            for fname in (None, "fld"):
                want = normalise_value(value, schema, cfg, fname)
                got = compiled(value, fname)
                assert _canon(got) == _canon(want), (
                    schema, value, fname, cfg)
                n += 1
    assert n > 3000  # the grid actually ran


def test_compiled_document_matches_interpreted_random():
    rng = random.Random(13)

    def rand_value(depth=0):
        kinds = ["null", "bool", "int", "float", "str"]
        if depth < 3:
            kinds += ["list", "dict"]
        k = rng.choice(kinds)
        if k == "null":
            return None
        if k == "bool":
            return rng.random() < 0.5
        if k == "int":
            return rng.randint(-10, 10)
        if k == "float":
            return round(rng.uniform(-5, 5), 3)
        if k == "str":
            return rng.choice(["a", "42", "true", "zz", "ü"])
        if k == "list":
            return [rand_value(depth + 1) for _ in range(rng.randint(0, 3))]
        return {
            f"k{j}": rand_value(depth + 1)
            for j in range(rng.randint(0, 3))
        }

    for schema in SCHEMAS:
        for cfg in CONFIGS:
            kernel = compile_document_normaliser(schema, cfg)
            for _ in range(40):
                doc = rand_value()
                want = normalise_document(doc, schema, cfg)
                got = kernel(doc)
                assert _canon(got) == _canon(want), (schema, doc, cfg)


def test_compiled_unknown_encoding_raises_on_map_only():
    cfg = NormaliseConfig(map_encoding="bogus")
    kernel = compile_normaliser({"type": "map", "values": "string"}, cfg)
    import pytest

    with pytest.raises(ValueError):
        kernel({"a": "b"})
    # non-map schemas never consult the encoding, same as the interpreter
    ok = compile_normaliser("string", cfg)
    assert ok("x") == "x"
