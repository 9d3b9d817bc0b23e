"""Driver-side schema post-processing: map inference, record unification,
scalar promotion, forced overrides, union reordering.

Pure tree rewriting over the merged JSON-Schema document (KB-sized), so it
runs on the driver — no distribution needed. Behavioural port (not a code
port) of:

- map inference / rewrite_objects:
  /root/reference/genson-core/src/schema/map_inference.rs:184-791
- unification ladder:
  /root/reference/genson-core/src/schema/map_inference/unification.rs
- forced field types (pre-rewrite conversion):
  /root/reference/genson-core/src/schema.rs:452-548
- union reordering by canonical rank:
  /root/reference/genson-core/src/schema.rs:85-157
"""

from __future__ import annotations

import copy
from typing import Any, Optional

from ..config import InferenceConfig

Json = Any

_NULL = "null"


def make_promoted_scalar_key(field_prefix: str, scalar_type: str) -> str:
    """`{field}__{type}` — /root/reference/genson-core/src/schema/core.rs:206-209."""
    return f"{field_prefix}__{scalar_type}"


# ---------------------------------------------------------------------------
# Union reordering (reference schema.rs:85-157)
# ---------------------------------------------------------------------------

_TYPE_RANK = {
    "null": 0,
    "map": 1,
    "array": 2,
    "object": 3,
    "record": 3,
    "boolean": 10,
    "integer": 11,
    "int": 11,
    "long": 11,
    "number": 12,
    "float": 12,
    "double": 12,
    "enum": 13,
    "string": 14,
    "fixed": 15,
    "bytes": 16,
}


def type_rank(val: Json) -> int:
    if isinstance(val, str):
        return _TYPE_RANK.get(val, 99)
    if isinstance(val, dict):
        t = val.get("type")
        if isinstance(t, str):
            return _TYPE_RANK.get(t, 99)
        return 100
    return 100


def reorder_unions(schema: Json) -> None:
    """Sort ``type: [...]`` arrays by canonical rank, preserving ["null", T]."""
    if isinstance(schema, dict):
        types = schema.get("type")
        if isinstance(types, list) and not (
            len(types) == 2 and _NULL in types
        ):
            types.sort(key=type_rank)
        for v in schema.values():
            reorder_unions(v)
    elif isinstance(schema, list):
        for v in schema:
            reorder_unions(v)


# ---------------------------------------------------------------------------
# Schema shape predicates (unification.rs:115-300)
# ---------------------------------------------------------------------------


def _nullable_inner_type(schema: Json) -> Optional[str]:
    """For {"type": ["null", "x"]} return "x", else None."""
    t = schema.get("type") if isinstance(schema, dict) else None
    if isinstance(t, list) and len(t) == 2 and _NULL in t:
        other = next((x for x in t if x != _NULL), None)
        if isinstance(other, str):
            return other
    return None


def is_scalar_schema(schema: Json) -> bool:
    if isinstance(schema, list) and len(schema) == 2 and _NULL in schema:
        inner = next(v for v in schema if v != _NULL)
        return is_scalar_schema(inner)
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t in ("string", "number", "integer", "boolean")
        inner = _nullable_inner_type(schema)
        return inner in ("string", "number", "integer", "boolean")
    return False


def is_object_schema(schema: Json) -> bool:
    if not isinstance(schema, dict):
        return False
    t = schema.get("type")
    if isinstance(t, str):
        return t == "object" and "properties" in schema
    return _nullable_inner_type(schema) == "object" and "properties" in schema


def is_empty_record_schema(schema: Json) -> bool:
    if not isinstance(schema, dict):
        return False
    t = schema.get("type")
    is_obj = (isinstance(t, str) and t == "object") or (
        _nullable_inner_type(schema) == "object"
    )
    if not is_obj:
        return False
    ap = schema.get("additionalProperties")
    if isinstance(ap, dict) or ap is True:
        return False
    props = schema.get("properties")
    if props is None:
        return True
    return isinstance(props, dict) and len(props) == 0


def is_map_schema(schema: Json) -> bool:
    if not isinstance(schema, dict):
        return False
    t = schema.get("type")
    if isinstance(t, str):
        return t == "object" and "additionalProperties" in schema
    return (
        _nullable_inner_type(schema) == "object"
        and "additionalProperties" in schema
    )


def is_array_schema(schema: Json) -> bool:
    if isinstance(schema, list) and len(schema) == 2 and _NULL in schema:
        inner = next(v for v in schema if v != _NULL)
        return is_array_schema(inner)
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t == "array"
        return _nullable_inner_type(schema) == "array"
    return False


def get_scalar_type_name(schema: Json) -> Optional[str]:
    if not isinstance(schema, dict):
        return None
    t = schema.get("type")
    if isinstance(t, str) and t in ("string", "number", "integer", "boolean"):
        return t
    inner = _nullable_inner_type(schema)
    if inner in ("string", "number", "integer", "boolean"):
        return inner
    return None


def normalise_nullable(v: Json) -> Json:
    """Peel all ``["null", X]`` wrapper layers (unification.rs:19-34)."""
    current = v
    while (
        isinstance(current, list)
        and len(current) == 2
        and _NULL in current
    ):
        current = next(x for x in current if x != _NULL)
    return current


def extract_non_null_schema(schema: Json) -> Json:
    """Unwrap one nullable layer into a plain schema (map_inference.rs:46-82)."""
    if isinstance(schema, dict):
        inner = _nullable_inner_type(schema)
        if inner is not None:
            out = dict(schema)
            out["type"] = inner
            return out
        # modern nullable with non-string inner type unsupported, return as-is
        t = schema.get("type")
        if isinstance(t, list) and len(t) == 2 and _NULL in t:
            return copy.deepcopy(schema)
        return copy.deepcopy(schema)
    if isinstance(schema, list) and len(schema) == 2 and _NULL in schema:
        return copy.deepcopy(next(v for v in schema if v != _NULL))
    return copy.deepcopy(schema)


def _extract_field_from_nullable(schema: Json, field: str) -> Optional[Json]:
    """unification.rs:372-399 — unwrap nullability then fetch ``field``."""
    if isinstance(schema, list) and len(schema) == 2 and _NULL in schema:
        inner = next(v for v in schema if v != _NULL)
        return _extract_field_from_nullable(inner, field)
    if isinstance(schema, dict):
        return schema.get(field)
    return None


# ---------------------------------------------------------------------------
# Pairwise compatibility (unification.rs:52-113)
# ---------------------------------------------------------------------------


def _try_make_nullable_union(a: Json, b: Json) -> Optional[Json]:
    if isinstance(a, dict) and a.get("type") == _NULL:
        bt = b.get("type") if isinstance(b, dict) else None
        if bt is not None and bt != _NULL:
            out = copy.deepcopy(b)
            out["type"] = [_NULL, bt]
            return out
    return None


def schemas_compatible(existing: Json, new: Json) -> Optional[Json]:
    if existing == new:
        return copy.deepcopy(existing)

    r = _try_make_nullable_union(existing, new) or _try_make_nullable_union(
        new, existing
    )
    if r is not None:
        return r

    def extract(schema: Json) -> tuple[bool, Json]:
        inner = _nullable_inner_type(schema)
        if inner is not None:
            out = dict(schema)
            out["type"] = inner
            return True, out
        return False, schema

    e_nullable, e_inner = extract(existing)
    n_nullable, n_inner = extract(new)

    if e_inner == n_inner:
        if e_nullable or n_nullable:
            out = copy.deepcopy(e_inner)
            it = e_inner.get("type") if isinstance(e_inner, dict) else None
            if it is not None:
                out["type"] = [_NULL, it]
            return out
        return copy.deepcopy(e_inner)
    return None


# ---------------------------------------------------------------------------
# Unification ladder (unification.rs:402-706, 1018-1143)
# ---------------------------------------------------------------------------


def unify_array_schemas(schemas, path, config) -> Optional[Json]:
    if not schemas:
        return None
    items_schemas = []
    for s in schemas:
        items = _extract_field_from_nullable(s, "items")
        if items is None:
            return None
        items_schemas.append(items)
    unified = check_unifiable_schemas(items_schemas, f"{path}.items", config)
    if unified is None:
        return None
    return {"type": "array", "items": unified}


def unify_scalar_schemas(schemas, path, config) -> Optional[Json]:
    if not schemas:
        return None
    base_types = set()
    for s in schemas:
        t = s.get("type") if isinstance(s, dict) else None
        if isinstance(t, str):
            base_types.add(t)
        elif isinstance(t, list) and len(t) == 2 and _NULL in t:
            other = next((x for x in t if x != _NULL), None)
            if isinstance(other, str):
                base_types.add(other)
    if len(base_types) == 1:
        return {"type": [_NULL, next(iter(base_types))]}
    return None


def unify_map_schemas(schemas, path, config) -> Optional[Json]:
    if not schemas:
        return None
    ap_schemas = []
    for s in schemas:
        ap = _extract_field_from_nullable(s, "additionalProperties")
        if ap is None:
            return None
        ap_schemas.append(ap)
    unified = check_unifiable_schemas(
        ap_schemas, f"{path}.additionalProperties", config
    )
    if unified is None:
        return None
    return {"type": "object", "additionalProperties": unified}


def try_scalar_promotion(
    object_schema, scalar_schema, field_name, path, config
) -> Optional[Json]:
    scalar_type = get_scalar_type_name(scalar_schema)
    if scalar_type is None:
        return None
    wrapped_key = make_promoted_scalar_key(field_name, scalar_type)
    promoted = {
        "type": "object",
        "properties": {wrapped_key: copy.deepcopy(scalar_schema)},
    }
    result = check_unifiable_schemas(
        [object_schema, promoted], f"{path}.{field_name}", config
    )
    if result is None:
        return None
    # all fields must be optional after scalar promotion
    # (unification.rs:362-366). NOTE on the 4 divergent claims_fixture_l1
    # snapshots (all ``approved: false``): they retain ``required`` through
    # trailing scalar promotions, but the sibling claims_fixture_l2
    # snapshot DROPS it for the byte-identical local fold pattern
    # (entity-record followed only by string variants), so no rule
    # consistent across fixtures can replay both — those snapshots are
    # stale outputs of an earlier reference version. We match the current
    # reference algorithm, which the approved snapshots pin. See
    # tests/test_reference_snapshots.py for the full analysis.
    if isinstance(result, dict):
        result.pop("required", None)
    return result


def try_mixed_scalar_promotion(
    existing, new, field_name, path, config
) -> Optional[Json]:
    et = get_scalar_type_name(existing)
    nt = get_scalar_type_name(new)
    if et is None or nt is None or et == nt:
        return None
    props = {
        make_promoted_scalar_key(field_name, et): copy.deepcopy(existing),
        make_promoted_scalar_key(field_name, nt): copy.deepcopy(new),
    }
    return {"type": "object", "properties": props}


def unify_field_schemas(field_name, schemas, path, config) -> Optional[Json]:
    """Sequential pairwise unification (unification.rs:567-640)."""
    if len(schemas) == 1:
        return copy.deepcopy(schemas[0])
    first = schemas[0]
    if all(s == first for s in schemas):
        return copy.deepcopy(first)

    unified = copy.deepcopy(schemas[0])
    for new in schemas[1:]:
        compatible = schemas_compatible(unified, new)
        if compatible is not None:
            unified = compatible
            continue

        both_arrays = is_array_schema(unified) and is_array_schema(new)
        both_objectish = (
            is_object_schema(unified) or is_empty_record_schema(unified)
        ) and (is_object_schema(new) or is_empty_record_schema(new))
        if both_arrays or both_objectish:
            result = check_unifiable_schemas(
                [unified, new], f"{path}.{field_name}", config
            )
            if result is None:
                return None
            unified = result
            continue

        if config.wrap_scalars:
            u_obj, u_scal = is_object_schema(unified), is_scalar_schema(unified)
            n_obj, n_scal = is_object_schema(new), is_scalar_schema(new)
            if u_obj and n_scal:
                result = try_scalar_promotion(
                    unified, new, field_name, path, config
                )
                if result is not None:
                    unified = result
                    continue
            elif n_obj and u_scal:
                result = try_scalar_promotion(
                    new, unified, field_name, path, config
                )
                if result is not None:
                    unified = result
                    continue
            elif u_scal and n_scal:
                result = try_mixed_scalar_promotion(
                    unified, new, field_name, path, config
                )
                if result is not None:
                    unified = result
                    continue
        return None
    return unified


def unify_record_schemas(schemas, path, config) -> Optional[Json]:
    """unification.rs:708-906 — selective-nullability record merge."""
    schema_properties = []
    for s in schemas:
        props = _extract_field_from_nullable(s, "properties")
        if isinstance(props, dict):
            schema_properties.append(props)
        elif is_empty_record_schema(s):
            schema_properties.append({})
        else:
            return None

    field_schemas: dict[str, list[Json]] = {}
    field_counts: dict[str, int] = {}
    # anyOf-unified entries are appended AFTER the main loop, matching the
    # reference's two-phase collection (unification.rs "Now add all the
    # unified anyOf references") — this affects both the per-field branch
    # order and, for fields seen only via anyOf, the field order itself.
    deferred_anyof: list[tuple[str, Json]] = []
    for props in schema_properties:
        for field_name, field_schema in props.items():
            field_counts[field_name] = field_counts.get(field_name, 0) + 1
            normalized = normalise_nullable(field_schema)
            anyof = (
                normalized.get("anyOf") if isinstance(normalized, dict) else None
            )
            if isinstance(anyof, list):
                unified_anyof = unify_anyof_schemas(anyof, field_name, config)
                if unified_anyof is not None:
                    deferred_anyof.append((field_name, unified_anyof))
                    continue
            field_schemas.setdefault(field_name, []).append(normalized)
    for field_name, unified_anyof in deferred_anyof:
        field_schemas.setdefault(field_name, []).append(unified_anyof)

    all_fields: dict[str, Json] = {}
    for field_name, schemas_for_field in field_schemas.items():
        unified = unify_field_schemas(
            field_name, schemas_for_field, path, config
        )
        if unified is None:
            return None
        all_fields[field_name] = unified

    total = len(schemas)
    unified_properties: dict[str, Json] = {}
    required_fields: list[str] = []

    # present in all → required, non-nullable
    for field_name, field_type in all_fields.items():
        if field_counts.get(field_name, 0) == total:
            unified_properties[field_name] = field_type
            required_fields.append(field_name)

    # missing in some → nullable
    for field_name, field_type in all_fields.items():
        if field_counts.get(field_name, 0) < total:
            t = field_type.get("type") if isinstance(field_type, dict) else None
            if isinstance(t, str):
                if t == _NULL:
                    unified_properties[field_name] = field_type
                else:
                    nf = copy.deepcopy(field_type)
                    nf["type"] = [_NULL, t]
                    unified_properties[field_name] = nf
            elif isinstance(t, list):
                unified_properties[field_name] = field_type
            else:
                unified_properties[field_name] = {
                    "anyOf": [{"type": _NULL}, field_type]
                }

    result: Json = {"type": "object", "properties": unified_properties}
    if required_fields:
        result["required"] = required_fields
    return result


def unify_anyof_schemas(schemas, field_name, config) -> Optional[Json]:
    """unification.rs:951-997 — promote scalars inside a mixed anyOf."""
    if not config.wrap_scalars:
        return None
    has_scalars = any(is_scalar_schema(s) for s in schemas)
    has_objects = any(is_object_schema(s) for s in schemas)
    if not has_scalars or not has_objects:
        return None
    promoted_schemas = []
    for s in schemas:
        if is_scalar_schema(s):
            st = get_scalar_type_name(s)
            if st is None:
                return None
            promoted_schemas.append(
                {
                    "type": "object",
                    "properties": {
                        make_promoted_scalar_key(field_name, st): copy.deepcopy(
                            s
                        )
                    },
                }
            )
        else:
            promoted_schemas.append(s)
    return check_unifiable_schemas(promoted_schemas, field_name, config)


def check_unifiable_schemas(schemas, path, config) -> Optional[Json]:
    """Dispatcher (unification.rs:1018-1143)."""
    if not schemas:
        return None

    if all(is_array_schema(s) for s in schemas):
        return unify_array_schemas(schemas, path, config)

    if all(is_map_schema(s) or is_empty_record_schema(s) for s in schemas):
        map_schemas = [s for s in schemas if is_map_schema(s)]
        if not map_schemas:
            # all empty records → empty map of strings
            return {
                "type": "object",
                "additionalProperties": {"type": "string"},
            }
        return unify_map_schemas(map_schemas, path, config)

    if all(
        is_object_schema(s) or is_empty_record_schema(s) for s in schemas
    ):
        return unify_record_schemas(schemas, path, config)

    if all(is_scalar_schema(s) for s in schemas):
        return unify_scalar_schemas(schemas, path, config)

    return None


# ---------------------------------------------------------------------------
# Forced field types, applied before rewrite (schema.rs:452-548)
# ---------------------------------------------------------------------------


def _convert_to_map(schema: Json) -> Json:
    if isinstance(schema, list):
        has_null = any(
            v == _NULL
            or (isinstance(v, dict) and v.get("type") == _NULL)
            for v in schema
        )
        if has_null:
            return {
                "type": [_NULL, "object"],
                "additionalProperties": {"type": "string"},
            }
        return {
            "type": "object",
            "additionalProperties": {"type": "string"},
        }
    if isinstance(schema, dict):
        if "additionalProperties" in schema:
            return schema
        t = schema.get("type")
        is_nullable = isinstance(t, list) and _NULL in t
        schema.pop("properties", None)
        schema.pop("required", None)
        schema.pop("anyOf", None)
        schema["type"] = [_NULL, "object"] if is_nullable else "object"
        schema["additionalProperties"] = {"type": "string"}
    return schema


def preprocess_force_field_types(schema: Json, config: InferenceConfig) -> None:
    if isinstance(schema, dict):
        props = schema.get("properties")
        if isinstance(props, dict):
            for field_name in list(props.keys()):
                if config.force_field_types.get(field_name) == "map":
                    props[field_name] = _convert_to_map(props[field_name])
                preprocess_force_field_types(props[field_name], config)
        for key in ("items", "additionalProperties"):
            if key in schema:
                preprocess_force_field_types(schema[key], config)
        anyof = schema.get("anyOf")
        if isinstance(anyof, list):
            for item in anyof:
                preprocess_force_field_types(item, config)
    elif isinstance(schema, list):
        for item in schema:
            preprocess_force_field_types(item, config)


# ---------------------------------------------------------------------------
# Map inference / rewrite_objects (map_inference.rs:184-791)
# ---------------------------------------------------------------------------


def _contains_anyof(value: Json) -> bool:
    if isinstance(value, dict):
        if "anyOf" in value:
            return True
        return any(_contains_anyof(v) for v in value.values())
    if isinstance(value, list):
        return any(_contains_anyof(v) for v in value)
    return False


def _process_anyof_unions(schema: Json, field_name: str, config) -> None:
    if isinstance(schema, dict):
        anyof = schema.get("anyOf")
        if isinstance(anyof, list) and config.unify_maps:
            unified = unify_anyof_schemas(anyof, field_name, config)
            if unified is not None:
                schema.clear()
                schema.update(unified)
                _process_anyof_unions(schema, field_name, config)
                return
        props = schema.get("properties")
        if isinstance(props, dict):
            for k, v in props.items():
                _process_anyof_unions(v, k, config)
        else:
            for v in schema.values():
                _process_anyof_unions(v, field_name, config)
    elif isinstance(schema, list):
        for v in schema:
            _process_anyof_unions(v, field_name, config)


def _check_force_parent_field_types(obj: Json, config) -> Optional[str]:
    props = obj.get("properties")
    if isinstance(props, dict):
        for prop_key, forced in config.force_parent_field_types.items():
            if prop_key in props:
                return forced
    return None


def rewrite_objects(
    schema: Json,
    field_name: Optional[str],
    config: InferenceConfig,
    is_root: bool,
) -> None:
    """Heuristic object→map rewrite, in place (map_inference.rs:184-791)."""
    # force_scalar_promotion guard + promotion of plain scalars
    if (
        field_name is not None
        and field_name in config.force_scalar_promotion
        and field_name not in config.force_field_types
        and isinstance(schema, dict)
    ):
        t = schema.get("type")
        inner = None
        if isinstance(t, str) and t in (
            "string",
            "integer",
            "number",
            "boolean",
        ):
            inner = t
            nullable = False
        else:
            nt = _nullable_inner_type(schema)
            if nt in ("string", "integer", "number", "boolean"):
                inner = nt
                nullable = True
        if inner is not None:
            wrapped_key = make_promoted_scalar_key(field_name, inner)
            scalar_schema = copy.deepcopy(schema)
            schema.clear()
            schema.update(
                {
                    "type": "object",
                    "properties": {wrapped_key: scalar_schema},
                }
            )
            return

    if isinstance(schema, dict):
        obj = schema
        # forced overrides by field name
        if field_name is not None and field_name in config.force_field_types:
            forced = config.force_field_types[field_name]
            if forced == "map":
                obj.pop("properties", None)
                obj.pop("required", None)
                obj["additionalProperties"] = {"type": "string"}
                return
            if forced == "record":
                props = obj.get("properties")
                if isinstance(props, dict):
                    for k, v in props.items():
                        rewrite_objects(v, k, config, False)
                if "items" in obj:
                    rewrite_objects(obj["items"], None, config, False)
                return

        # anyOf unions
        anyof = obj.get("anyOf")
        if isinstance(anyof, list):
            if config.unify_maps:
                unified = unify_anyof_schemas(anyof, field_name or "", config)
                if unified is not None:
                    obj.clear()
                    obj.update(unified)
                    rewrite_objects(obj, field_name, config, is_root)
                    return
            for branch in obj.get("anyOf", []):
                rewrite_objects(branch, field_name, config, False)

        props = obj.get("properties")
        if isinstance(props, dict):
            # force_parent_field_types guard
            forced_parent = _check_force_parent_field_types(obj, config)
            if forced_parent == "record":
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
                if "items" in obj:
                    rewrite_objects(obj["items"], None, config, False)
                return

            # force-promoted field guard
            if (
                field_name is not None
                and field_name in config.force_scalar_promotion
            ):
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
                return

            # already-converted map guard
            if "additionalProperties" in obj and not props:
                rewrite_objects(
                    obj["additionalProperties"], None, config, False
                )
                return

            key_count = len(props)
            above_threshold = key_count >= config.map_threshold
            child_schemas = list(props.values())

            # identical map-of-records fast path (map_inference.rs:462-478)
            if above_threshold and child_schemas:
                first = child_schemas[0]
                if (
                    isinstance(first, dict)
                    and first.get("type") == "object"
                    and "properties" in first
                    and len(child_schemas) > 1
                    and all(other == first for other in child_schemas[1:])
                ):
                    first_clone = copy.deepcopy(first)
                    obj.pop("properties", None)
                    obj.pop("required", None)
                    # the map's value schema is itself subject to map
                    # inference (pinned by map_encoding__cli_wrap_root:
                    # identical 2-key records under a 2-key map become
                    # map<map<string>> at map_threshold=2)
                    rewrite_objects(first_clone, None, config, False)
                    obj["additionalProperties"] = first_clone
                    return

            required_key_count = len(obj.get("required") or [])

            unified_schema: Optional[Json] = None
            if child_schemas:
                normalised = [
                    extract_non_null_schema(v) for v in child_schemas
                ]
                first_normalised = normalised[0]
                if all(s == first_normalised for s in normalised):
                    unified_schema = first_normalised
                elif config.unify_maps:
                    has_excluded = any(
                        k in config.no_unify for k in props.keys()
                    )
                    if not has_excluded:
                        if all(
                            isinstance(s, dict) and s.get("type") == "array"
                            for s in child_schemas
                        ):
                            item_schemas = []
                            all_items_ok = True
                            for s in child_schemas:
                                if "items" in s:
                                    item_schemas.append(s["items"])
                                else:
                                    all_items_ok = False
                                    break
                            if all_items_ok:
                                unified_items = check_unifiable_schemas(
                                    item_schemas, field_name or "", config
                                )
                                if unified_items is not None:
                                    unified_schema = {
                                        "type": "array",
                                        "items": unified_items,
                                    }
                        elif above_threshold:
                            unified_schema = check_unifiable_schemas(
                                child_schemas, field_name or "", config
                            )

            if unified_schema is not None and _contains_anyof(unified_schema):
                _process_anyof_unions(
                    unified_schema, field_name or "", config
                )

            should_be_map = False
            if above_threshold and unified_schema is not None:
                if is_root and config.no_root_map:
                    should_be_map = False
                elif config.map_max_required_keys is not None:
                    should_be_map = (
                        required_key_count <= config.map_max_required_keys
                    )
                else:
                    should_be_map = True

            if should_be_map and unified_schema is not None:
                obj.pop("properties", None)
                obj.pop("required", None)
                obj["type"] = "object"
                processed = copy.deepcopy(unified_schema)
                rewrite_objects(processed, None, config, False)
                obj["additionalProperties"] = processed
                return

        # recurse (unless force-typed field)
        if not (
            field_name is not None
            and field_name in config.force_field_types
        ):
            props = obj.get("properties")
            if isinstance(props, dict):
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
            if "items" in obj:
                rewrite_objects(obj["items"], None, config, False)
            for k, v in obj.items():
                if k in (
                    "items",
                    "type",
                    "required",
                    "$schema",
                    "namespace",
                    "name",
                    "properties",
                ):
                    continue
                if isinstance(v, dict):
                    rewrite_objects(v, k, config, False)
    elif isinstance(schema, list):
        for v in schema:
            rewrite_objects(v, None, config, False)


def postprocess_schema(schema: Json, config: InferenceConfig) -> Json:
    """The full driver-side finalise pipeline, in reference order
    (schema.rs:585-595): force types → map inference → union reorder."""
    preprocess_force_field_types(schema, config)
    rewrite_objects(schema, None, config, True)
    reorder_unions(schema)
    return schema
