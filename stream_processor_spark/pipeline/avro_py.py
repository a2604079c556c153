"""Pure-Python Avro binary codec (Apache Avro 1.11 spec subset).

Fallback execution path for the engine's Avro wire format when the JVM
``spark-avro`` package is not on the classpath (this container ships
neither spark-avro nor a Python avro library). Implements the public
Avro *binary encoding* spec — zigzag-varint ints/longs, length-prefixed
strings/bytes, little-endian IEEE float/double, union-index prefix,
records as field concatenation, blocked arrays/maps:
https://avro.apache.org/docs/1.11.1/specification/#binary-encoding

Production clusters should prefer the JVM codec (``--packages
org.apache.spark:spark-avro_2.13:<ver>``) — it runs inside codegen with
no Python round-trip. This module exists so the wire semantics are
*executable and tested everywhere*, not import-gated (the reference
exercises Avro end-to-end via producer_b.js:42 / consumer decode).

Supported types: null, boolean, int, long, float, double, string, bytes,
record (nested), array, map, and unions. Unions are encoded with the
branch resolved by value type; ``null`` always uses its union branch.
Unsupported (not needed by the engine's schemas): enum, fixed, recursive
named-type references, logical-type semantics (values pass through as
their base type).
"""

from __future__ import annotations

import io
import json
import struct


# ---------------------------------------------------------------- varints --


def _write_long(out: io.BytesIO, n: int) -> None:
    """Zigzag-encoded variable-length long (spec: int and long)."""
    n = (n << 1) ^ (n >> 63)
    while (n & ~0x7F) != 0:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n & 0x7F]))


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# ----------------------------------------------------------------- schema --


def parse_schema(schema_json: str | dict | list):
    """Normalize an Avro JSON schema into plain dict/list/str nodes."""
    if isinstance(schema_json, str):
        try:
            return json.loads(schema_json)
        except json.JSONDecodeError:
            return schema_json  # bare primitive name like "long"
    return schema_json


def _type_name(node) -> str:
    if isinstance(node, str):
        return node
    if isinstance(node, list):
        return "union"
    return node["type"]


def _union_branch_for(value, branches):
    """Pick the union branch whose type matches the Python value."""
    for i, b in enumerate(branches):
        t = _type_name(b)
        if value is None and t == "null":
            return i, b
        if value is not None and t != "null":
            if t == "boolean" and isinstance(value, bool):
                return i, b
            if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
                return i, b
            if t in ("float", "double") and isinstance(value, (int, float)) and not isinstance(value, bool):
                return i, b
            if t == "string" and isinstance(value, str):
                return i, b
            if t == "bytes" and isinstance(value, (bytes, bytearray)):
                return i, b
            if t == "record" and isinstance(value, dict):
                return i, b
            if t == "array" and isinstance(value, (list, tuple)):
                return i, b
            if t == "map" and isinstance(value, dict):
                return i, b
    raise ValueError(f"no union branch for value {value!r} in {branches!r}")


# ----------------------------------------------------------------- encode --


def _encode(out: io.BytesIO, node, value) -> None:
    t = _type_name(node)
    if value is None and t not in ("union", "null", "record"):
        # a null against a non-nullable field must FAIL, not silently
        # stringify (str(None) → 'None' corruption) or TypeError deep in
        # struct packing; callers contain this per record
        raise ValueError(f"null value for non-nullable avro type {t!r}")
    if t == "union":
        i, branch = _union_branch_for(value, node)
        _write_long(out, i)
        _encode(out, branch, value)
    elif t == "null":
        if value is not None:
            raise ValueError(f"null schema got {value!r}")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "string":
        raw = str(value).encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif t == "bytes":
        raw = bytes(value)
        _write_long(out, len(raw))
        out.write(raw)
    elif t == "record":
        for f in node["fields"]:
            _encode(out, f["type"], None if value is None else value.get(f["name"]))
    elif t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, node["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _encode(out, "string", k)
                _encode(out, node["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def encode(record, schema) -> bytes:
    """Encode one value (dict for records) to Avro binary."""
    out = io.BytesIO()
    _encode(out, parse_schema(schema), record)
    return out.getvalue()


# ----------------------------------------------------------------- decode --


def _decode(buf: io.BytesIO, node):
    t = _type_name(node)
    if t == "union":
        i = _read_long(buf)
        return _decode(buf, node[i])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        n = _read_long(buf)
        return buf.read(n).decode("utf-8")
    if t == "bytes":
        n = _read_long(buf)
        return buf.read(n)
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in node["fields"]}
    if t == "array":
        items = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec) — skip the size
                n = -n
                _read_long(buf)
            for _ in range(n):
                items.append(_decode(buf, node["items"]))
        return items
    if t == "map":
        entries = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _decode(buf, "string")
                entries[k] = _decode(buf, node["values"])
        return entries
    raise ValueError(f"unsupported avro type {t!r}")


def decode(payload: bytes, schema):
    """Decode Avro binary to a Python value (dict for records)."""
    return _decode(io.BytesIO(payload), parse_schema(schema))
