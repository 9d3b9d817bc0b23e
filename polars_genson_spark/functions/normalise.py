"""Row normalisation against an Avro schema — the validation/enforcement
kernel.

Pure-Python recursive function applied per document inside a vectorized
pandas UDF (one call per Arrow batch, orjson/json parse per doc inside the
batch — matching the reference's per-doc parse inside a rayon chunk).

Behavioural port of ``normalise_value``
(/root/reference/genson-core/src/normalise.rs:140-315) including:

- null preservation for primitives; failed parses → null
- optional string coercion ("42"→42) when ``coerce_string``
- records: exact field set, missing→null, extras dropped, promoted
  ``{field}__{type}`` scalar matching (normalise.rs:193-221)
- arrays: scalar→singleton wrap, empty→null when ``empty_as_null``
- maps: per-entry recursion, kv/entries/mapping encodings
  (normalise.rs:41-56), scalar fallback → promoted single-entry object
- unions: null-preserving, else first non-null branch (normalise.rs:296-310)
"""

from __future__ import annotations

from typing import Any, Optional

from ..config import (
    MAP_ENCODING_ENTRIES,
    MAP_ENCODING_KV,
    MAP_ENCODING_MAPPING,
    NormaliseConfig,
)
from .rewrite import make_promoted_scalar_key

Json = Any


def _apply_map_encoding(m: dict[str, Json], encoding: str) -> Json:
    if encoding == MAP_ENCODING_MAPPING:
        return m
    if encoding == MAP_ENCODING_ENTRIES:
        return [{k: v} for k, v in m.items()]
    if encoding == MAP_ENCODING_KV:
        return [{"key": k, "value": v} for k, v in m.items()]
    raise ValueError(f"unknown map encoding: {encoding}")


def _scalar_type_of(value: Json) -> str:
    if isinstance(value, str):
        return "string"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    return "unknown"


def normalise_value(
    value: Json,
    schema: Json,
    cfg: NormaliseConfig,
    field_name: Optional[str] = None,
) -> Json:
    # Primitive types
    if isinstance(schema, str):
        t = schema
        if t == "string":
            if value is None:
                return None
            if isinstance(value, str):
                return value
            # non-string → canonical JSON text (serde to_string parity:
            # bools→"true"/"false", numbers via repr)
            if isinstance(value, bool):
                return "true" if value else "false"
            import json as _json

            # ensure_ascii=False: serde emits raw UTF-8 — \uXXXX escapes
            # would change the DATA of any coerced non-ASCII value
            return _json.dumps(
                value, separators=(",", ":"), ensure_ascii=False
            )
        if t in ("int", "long"):
            if value is None:
                return None
            if isinstance(value, bool):
                return None
            if isinstance(value, int):
                # reference parity (normalise.rs n.is_i64()): a value
                # outside i64 is nulled, not passed through — Python's
                # arbitrary-precision int would otherwise overflow the
                # LongType column / Avro long reader downstream
                if -(2**63) <= value < 2**63:
                    return value
                return None
            if isinstance(value, str) and cfg.coerce_string:
                try:
                    return int(value)
                except ValueError:
                    return None
            return None
        if t in ("double", "float"):
            if value is None:
                return None
            if isinstance(value, float):
                return value
            if isinstance(value, str) and cfg.coerce_string:
                try:
                    return float(value)
                except ValueError:
                    return None
            return None
        if t == "boolean":
            if value is None:
                return None
            if isinstance(value, bool):
                return value
            if isinstance(value, str) and cfg.coerce_string:
                if value in ("true", "1"):
                    return True
                if value in ("false", "0"):
                    return False
                return None
            return None
        if t == "null":
            return None
        return value

    # Union
    if isinstance(schema, list):
        if "null" in schema:
            if value is None:
                return None
            branch = next((t for t in schema if t != "null"), None)
            if branch is None:  # union of only null: always-null field
                return None
            return normalise_value(value, branch, cfg, field_name)
        if schema:
            return normalise_value(value, schema[0], cfg, field_name)
        return value

    if not isinstance(schema, dict):
        return value

    stype = schema.get("type")

    # Record
    if stype == "record":
        out: dict[str, Json] = {}
        for f in schema.get("fields", []):
            name = f.get("name")
            field_schema = f.get("type")
            if name is None or field_schema is None:
                continue
            if isinstance(value, dict):
                val = value.get(name)
            else:
                # scalar promotion: scalar collides with record
                # (normalise.rs:193-221)
                val = None
                if "__" in name:
                    type_suffix = name.rsplit("__", 1)[-1]
                    matches = (
                        (isinstance(value, str) and type_suffix == "string")
                        or (
                            isinstance(value, bool)
                            and type_suffix == "boolean"
                        )
                        or (
                            isinstance(value, (int, float))
                            and not isinstance(value, bool)
                            and type_suffix
                            in (
                                "int",
                                "integer",
                                "long",
                                "float",
                                "double",
                                "number",
                            )
                        )
                    )
                    if matches:
                        val = value
            out[name] = normalise_value(val, field_schema, cfg, name)
        return out

    # Array
    if stype == "array":
        items_schema = schema.get("items", "string")
        if value is None:
            return None
        if isinstance(value, list):
            if not value and cfg.empty_as_null:
                return None
            return [
                normalise_value(v, items_schema, cfg, field_name)
                for v in value
            ]
        return [normalise_value(value, items_schema, cfg, field_name)]

    # Map
    if stype == "map":
        values_schema = schema.get("values", "string")
        if value is None:
            return None
        if isinstance(value, dict):
            if not value and cfg.empty_as_null:
                return None
            out = {
                k: normalise_value(v, values_schema, cfg, k)
                for k, v in value.items()
            }
            return _apply_map_encoding(out, cfg.map_encoding)
        # scalar fallback → promoted single-entry map (normalise.rs:280-292)
        wrapped_key = make_promoted_scalar_key(
            field_name or "", _scalar_type_of(value)
        )
        synthetic = {
            wrapped_key: normalise_value(value, values_schema, cfg, field_name)
        }
        return _apply_map_encoding(synthetic, cfg.map_encoding)

    # Fallback
    return value


def normalise_document(
    doc: Json, schema: Json, cfg: NormaliseConfig
) -> Json:
    """Normalise one parsed document (applies wrap_root when configured)."""
    if cfg.wrap_root is not None:
        doc = {cfg.wrap_root: doc}
    return normalise_value(doc, schema, cfg, None)


# ---------------------------------------------------------------------------
# Compiled kernel (round 6, guide §1.2 step 2 "per-task work"): the
# recursive normalise_value re-dispatches on the SCHEMA for every value of
# every document — isinstance chains, dict lookups ("type", "fields",
# "items", "values"), cfg attribute reads — although the schema is a
# broadcast constant for the whole job. compile_normaliser walks the schema
# ONCE and returns nested closures with every dispatch decision, field
# list, promoted-key suffix and encoding choice pre-resolved; per document
# only the data-dependent branches remain. Pinned bit-identical to
# normalise_value by tests/test_normalise_compiled.py (adversarial branch
# corpus) and by the 160-replay reference snapshot suite riding
# normalise_json.
# ---------------------------------------------------------------------------

_NUM_SUFFIXES = ("int", "integer", "long", "float", "double", "number")


def compile_normaliser(schema: Json, cfg: NormaliseConfig):
    """Return ``fn(value, field_name=None) -> Json`` computing exactly
    ``normalise_value(value, schema, cfg, field_name)``."""
    import json as _json

    coerce_string = cfg.coerce_string
    empty_as_null = cfg.empty_as_null
    encoding = cfg.map_encoding

    if encoding == MAP_ENCODING_MAPPING:
        apply_enc = lambda m: m  # noqa: E731
    elif encoding == MAP_ENCODING_ENTRIES:
        apply_enc = lambda m: [{k: v} for k, v in m.items()]  # noqa: E731
    elif encoding == MAP_ENCODING_KV:
        apply_enc = (  # noqa: E731
            lambda m: [{"key": k, "value": v} for k, v in m.items()]
        )
    else:
        apply_enc = None  # raise lazily, like _apply_map_encoding

    def compile_node(schema: Json):
        # Primitive types
        if isinstance(schema, str):
            t = schema
            if t == "string":
                def f_string(value, field_name=None):
                    if value is None or isinstance(value, str):
                        return value
                    if isinstance(value, bool):
                        return "true" if value else "false"
                    return _json.dumps(
                        value, separators=(",", ":"), ensure_ascii=False
                    )
                return f_string
            if t in ("int", "long"):
                def f_int(value, field_name=None):
                    if isinstance(value, bool) or value is None:
                        return None
                    if isinstance(value, int):
                        if -(2**63) <= value < 2**63:
                            return value
                        return None
                    if coerce_string and isinstance(value, str):
                        try:
                            return int(value)
                        except ValueError:
                            return None
                    return None
                return f_int
            if t in ("double", "float"):
                def f_float(value, field_name=None):
                    if value is None or isinstance(value, float):
                        return value
                    if coerce_string and isinstance(value, str):
                        try:
                            return float(value)
                        except ValueError:
                            return None
                    return None
                return f_float
            if t == "boolean":
                def f_bool(value, field_name=None):
                    if value is None or isinstance(value, bool):
                        return value
                    if coerce_string and isinstance(value, str):
                        if value in ("true", "1"):
                            return True
                        if value in ("false", "0"):
                            return False
                    return None
                return f_bool
            if t == "null":
                return lambda value, field_name=None: None
            return lambda value, field_name=None: value

        # Union
        if isinstance(schema, list):
            if "null" in schema:
                branch = next((t for t in schema if t != "null"), None)
                if branch is None:
                    return lambda value, field_name=None: None
                sub = compile_node(branch)

                def f_union(value, field_name=None):
                    if value is None:
                        return None
                    return sub(value, field_name)
                return f_union
            if schema:
                return compile_node(schema[0])
            return lambda value, field_name=None: value

        if not isinstance(schema, dict):
            return lambda value, field_name=None: value

        stype = schema.get("type")

        # Record
        if stype == "record":
            fields = []
            for f in schema.get("fields", []):
                name = f.get("name")
                field_schema = f.get("type")
                if name is None or field_schema is None:
                    continue
                suffix = name.rsplit("__", 1)[-1] if "__" in name else None
                fields.append((name, suffix, compile_node(field_schema)))

            def f_record(value, field_name=None):
                out = {}
                if isinstance(value, dict):
                    get = value.get
                    for name, _suffix, sub in fields:
                        out[name] = sub(get(name), name)
                    return out
                for name, suffix, sub in fields:
                    val = None
                    if suffix is not None:
                        if isinstance(value, str):
                            if suffix == "string":
                                val = value
                        elif isinstance(value, bool):
                            if suffix == "boolean":
                                val = value
                        elif isinstance(value, (int, float)):
                            if suffix in _NUM_SUFFIXES:
                                val = value
                    out[name] = sub(val, name)
                return out
            return f_record

        # Array
        if stype == "array":
            sub = compile_node(schema.get("items", "string"))

            def f_array(value, field_name=None):
                if value is None:
                    return None
                if isinstance(value, list):
                    if not value and empty_as_null:
                        return None
                    return [sub(v, field_name) for v in value]
                return [sub(value, field_name)]
            return f_array

        # Map
        if stype == "map":
            sub = compile_node(schema.get("values", "string"))

            def f_map(value, field_name=None):
                if value is None:
                    return None
                if isinstance(value, dict):
                    if not value and empty_as_null:
                        return None
                    out = {k: sub(v, k) for k, v in value.items()}
                else:
                    out = {
                        make_promoted_scalar_key(
                            field_name or "", _scalar_type_of(value)
                        ): sub(value, field_name)
                    }
                if apply_enc is None:
                    raise ValueError(
                        f"unknown map encoding: {encoding}"
                    )
                return apply_enc(out)
            return f_map

        # Fallback
        return lambda value, field_name=None: value

    return compile_node(schema)


def compile_document_normaliser(schema: Json, cfg: NormaliseConfig):
    """Compiled :func:`normalise_document`: ``fn(doc) -> Json``."""
    root = compile_normaliser(schema, cfg)
    wrap = cfg.wrap_root
    if wrap is None:
        return lambda doc: root(doc, None)
    return lambda doc: root({wrap: doc}, None)
