"""JSON Schema → Avro schema conversion (subset of avrotize used by the
reference; call site /root/reference/genson-core/src/schema/core.rs:183-200).

Behaviour pinned against the reference's golden snapshots
(/root/reference/genson-cli/tests/snapshots/*__avro.snap):

- root record is named ``document`` with namespace ``genson``
- primitives: string→string, integer→int, number→float, boolean→boolean
- optional (non-required) fields become ``["null", T]`` unions
- map schemas carry ``{"name": <field>, "type": "map", "values": ...}``
- records under a map's ``values`` are named ``{field}_values``
- child records of record R in namespace NS live in ``NS.R_types``
"""

from __future__ import annotations

from typing import Any, Optional

Json = Any

_PRIMITIVES = {
    "string": "string",
    "integer": "int",
    "number": "float",
    "boolean": "boolean",
    "null": "null",
    # pass-through if already avro-flavoured
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
}


def json_schema_to_avro(schema: Json, namespace: str = "genson") -> Json:
    """Convert a (post-processed) JSON Schema document to an Avro schema."""
    return _record_from_object(schema, "document", namespace)


def _record_from_object(schema: Json, name: str, namespace: str) -> Json:
    fields = []
    props = schema.get("properties") or {}
    required = set(schema.get("required") or [])
    child_ns = f"{namespace}.{name}_types"
    for fname, fschema in props.items():
        ftype = _avro_type(fschema, fname, child_ns)
        if fname not in required and not _is_nullable_avro(ftype):
            ftype = ["null", ftype]
        fields.append({"name": fname, "type": ftype})
    return {
        "type": "record",
        "name": name,
        "namespace": namespace,
        "fields": fields,
    }


def _is_nullable_avro(avro_type: Json) -> bool:
    return isinstance(avro_type, list) and "null" in avro_type


def _avro_type(
    schema: Json, field_name: str, namespace: str, in_map_values: bool = False
) -> Json:
    """Convert one JSON-Schema fragment to an Avro type."""
    if isinstance(schema, list):
        # legacy union form ["null", {...}]
        return [
            _avro_type(s, field_name, namespace, in_map_values)
            if not isinstance(s, str)
            else _PRIMITIVES.get(s, s)
            for s in schema
        ]
    if not isinstance(schema, dict):
        return "string"

    anyof = schema.get("anyOf")
    if isinstance(anyof, list):
        return [
            _avro_type(s, field_name, namespace, in_map_values) for s in anyof
        ]

    t = schema.get("type")

    if isinstance(t, list):
        # {"type": ["null", "integer"]} and multi-scalar unions
        members: list[Json] = []
        for member in t:
            if member == "null":
                members.append("null")
            elif member in ("object", "array"):
                sub = dict(schema)
                sub["type"] = member
                members.append(
                    _avro_type(sub, field_name, namespace, in_map_values)
                )
            else:
                members.append(_PRIMITIVES.get(member, member))
        return members

    if t == "object":
        if "additionalProperties" in schema and not schema.get("properties"):
            values = _avro_type(
                schema["additionalProperties"],
                field_name,
                namespace,
                in_map_values=True,
            )
            return {"name": field_name, "type": "map", "values": values}
        record_name = f"{field_name}_values" if in_map_values else field_name
        return _record_from_object(schema, record_name, namespace)

    if t == "array":
        items = schema.get("items", {"type": "string"})
        return {
            "type": "array",
            "items": _avro_type(items, field_name, namespace, in_map_values),
        }

    if isinstance(t, str):
        return _PRIMITIVES.get(t, "string")

    return "string"


def avro_primitive_for_json_type(json_type: str) -> Optional[str]:
    return _PRIMITIVES.get(json_type)
