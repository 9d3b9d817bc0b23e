"""JSON Schema → Avro schema conversion (subset of avrotize used by the
reference; call site /root/reference/genson-core/src/schema/core.rs:183-200).

Behaviour pinned against the reference's golden snapshots
(/root/reference/genson-cli/tests/snapshots/*__avro.snap):

- root record is named ``document`` with namespace ``genson``; a ROOT map
  (additionalProperties at the top level) is wrapped in that record as a
  single field ``document`` whose map values record is named
  ``document_extensions``
- primitives: string→string, integer→int, number→float, boolean→boolean
- REQUIRED fields strip the null branch of a 2-member nullable union
  (``["null", T]`` → ``T``); optional fields are made nullable (but a
  null-only type stays the 1-member union ``["null"]``, never
  ``["null","null"]``)
- map types carry ``{"name": <name>, "type": "map", "values": ...}``;
  anything named under a map's ``values`` (directly or through array
  items) takes the map's name + ``_values`` — recursively, so a map in
  map values is ``{outer}_values`` and its record values
  ``{outer}_values_values``
- child records of record R in namespace NS live in ``NS.R_types``
- a record with an always-null field (type ``["null"]``) carries
  ``"dependencies": ["null"]`` (avrotize artifact, pinned by the
  x1818_l4/l5/l26/l29 snapshots)
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


def _is_map_schema(schema: Json) -> bool:
    # additionalProperties: false is a CLOSED object (no extra keys), not
    # a map of string values — only a schema-or-true marker means map
    return (
        isinstance(schema, dict)
        and "additionalProperties" in schema
        and schema.get("additionalProperties") is not False
        and not schema.get("properties")
    )


def json_schema_to_avro(schema: Json, namespace: str = "genson") -> Json:
    """Convert a (post-processed) JSON Schema document to an Avro schema."""
    if _is_map_schema(schema):
        values = _avro_type(
            schema["additionalProperties"], "document_extensions", namespace
        )
        map_type = {"name": "document", "type": "map", "values": values}
        return {
            "type": "record",
            "name": "document",
            "namespace": namespace,
            "fields": [{"name": "document", "type": map_type}],
        }
    return _record_from_object(schema, "document", namespace)


def _strip_null(avro_type: Json) -> Json:
    """Required-field rule: ["null", T] → T; null-only stays ["null"]."""
    if isinstance(avro_type, list) and "null" in avro_type:
        non_null = [t for t in avro_type if t != "null"]
        if not non_null:
            return ["null"]
        if len(non_null) == 1:
            return non_null[0]
        return non_null
    return avro_type


def _ensure_nullable(avro_type: Json) -> Json:
    """Optional-field rule: make nullable without double-wrapping."""
    if avro_type == "null":
        return ["null"]
    if isinstance(avro_type, list):
        if "null" in avro_type:
            return avro_type
        return ["null", *avro_type]
    return ["null", avro_type]


def _record_from_object(schema: Json, name: str, namespace: str) -> Json:
    fields = []
    props = schema.get("properties") or {}
    required = set(schema.get("required") or [])
    child_ns = f"{namespace}.{name}_types"
    has_null_only = False
    for fname, fschema in props.items():
        ftype = _avro_type(fschema, fname, child_ns)
        if fname in required:
            ftype = _strip_null(ftype)
        else:
            ftype = _ensure_nullable(ftype)
        if ftype == ["null"] or ftype == "null":
            has_null_only = True
        fields.append({"name": fname, "type": ftype})
    rec: Json = {
        "type": "record",
        "name": name,
        "namespace": namespace,
        "fields": fields,
    }
    if has_null_only:
        rec["dependencies"] = ["null"]
    return rec


def _avro_type(schema: Json, pending_name: str, namespace: str) -> Json:
    """Convert one JSON-Schema fragment to an Avro type.

    ``pending_name`` is the name this fragment takes if it turns out to be
    a named thing (record or map); array items inherit it unchanged, map
    values get ``{pending_name}_values``."""
    if isinstance(schema, list):
        # legacy union form ["null", {...}]
        return [
            _avro_type(s, pending_name, namespace)
            if not isinstance(s, str)
            else _PRIMITIVES.get(s, s)
            for s in schema
        ]
    if not isinstance(schema, dict):
        return "string"

    def _union_member_name(consumed: int) -> str:
        # Avro rejects redefining a record name within one schema: when a
        # union holds MORE than one structured member (object/array/map),
        # the 2nd+ take a _N suffix. Single-structured unions — the shape
        # the inference engine itself emits — keep the bare name.
        return pending_name if consumed == 0 else f"{pending_name}_{consumed + 1}"

    anyof = schema.get("anyOf")
    if isinstance(anyof, list):
        out: list[Json] = []
        consumed = 0
        for s in anyof:
            structured = isinstance(s, dict) and s.get("type") in (
                "object", "array",
            )
            out.append(
                _avro_type(s, _union_member_name(consumed), namespace)
            )
            consumed += int(structured)
        return out

    t = schema.get("type")

    if isinstance(t, list):
        # {"type": ["null", "integer"]} and multi-scalar unions
        members: list[Json] = []
        consumed = 0
        for member in t:
            if member == "null":
                members.append("null")
            elif member in ("object", "array"):
                sub = dict(schema)
                sub["type"] = member
                members.append(
                    _avro_type(sub, _union_member_name(consumed), namespace)
                )
                consumed += 1
            else:
                members.append(_PRIMITIVES.get(member, member))
        return members

    if t == "object":
        if _is_map_schema(schema):
            values = _avro_type(
                schema["additionalProperties"],
                f"{pending_name}_values",
                namespace,
            )
            return {"name": pending_name, "type": "map", "values": values}
        return _record_from_object(schema, pending_name, namespace)

    if t == "array":
        items = schema.get("items", {"type": "string"})
        return {
            "type": "array",
            "items": _avro_type(items, pending_name, namespace),
        }

    if isinstance(t, str):
        return _PRIMITIVES.get(t, "string")

    return "string"


def avro_primitive_for_json_type(json_type: str) -> Optional[str]:
    return _PRIMITIVES.get(json_type)
