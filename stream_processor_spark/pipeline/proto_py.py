"""Pure-Python Protobuf wire codec (proto3 scalar subset, spec-derived).

Fallback execution path for the engine's Protobuf wire format when the
JVM ``spark-protobuf`` package (and its compiled descriptor) is
unavailable — this container ships neither spark-protobuf nor the Python
``google.protobuf`` runtime. Implements the public protobuf *wire
format*: varint-encoded ``(field_number << 3) | wire_type`` tags,
varint scalars, length-delimited strings/bytes/messages, little-endian
fixed64/fixed32: https://protobuf.dev/programming-guides/encoding/

Instead of compiled descriptors, messages are described by a
:class:`ProtoMessageSpec` — the engine analog of the reference's inline
proto declaration for its demo ``{key, value, num}`` message
(performance-testing/producers/producer_c.js:41-45). proto3 semantics:
encoding omits default values (empty string / 0 / False); decoding fills
missing fields with their defaults.

Supported field types: string, bytes, int32, int64, uint64, sint32,
sint64, bool, double, float, and nested message (via a nested spec).
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_WIRE_TYPE = {
    "string": _WT_LEN,
    "bytes": _WT_LEN,
    "message": _WT_LEN,
    "int32": _WT_VARINT,
    "int64": _WT_VARINT,
    "uint64": _WT_VARINT,
    "sint32": _WT_VARINT,
    "sint64": _WT_VARINT,
    "bool": _WT_VARINT,
    "double": _WT_I64,
    "float": _WT_I32,
}

_DEFAULTS = {
    "string": "",
    "bytes": b"",
    "int32": 0,
    "int64": 0,
    "uint64": 0,
    "sint32": 0,
    "sint64": 0,
    "bool": False,
    "double": 0.0,
    "float": 0.0,
    "message": None,
}


@dataclass(frozen=True)
class ProtoField:
    number: int
    name: str
    type: str  # key of _WIRE_TYPE
    message_spec: "ProtoMessageSpec | None" = None  # for type == "message"


@dataclass(frozen=True)
class ProtoMessageSpec:
    name: str
    fields: tuple[ProtoField, ...]

    def by_number(self) -> dict[int, ProtoField]:
        return {f.number: f for f in self.fields}


def demo_message_spec() -> ProtoMessageSpec:
    """The reference's demo message (producer_c.js:41-45)."""
    return ProtoMessageSpec(
        name="DemoMessage",
        fields=(
            ProtoField(1, "key", "string"),
            ProtoField(2, "value", "string"),
            ProtoField(3, "num", "int32"),
        ),
    )


# ---------------------------------------------------------------- varints --


def _write_varint(out: io.BytesIO, n: int) -> None:
    if n < 0:  # negative int32/int64 → 10-byte two's-complement varint
        n &= (1 << 64) - 1
    while n > 0x7F:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n]))


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return acc
        shift += 7


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    raw = buf.read(n)
    if len(raw) != n:
        raise EOFError(f"truncated field: wanted {n} bytes, got {len(raw)}")
    return raw


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# ----------------------------------------------------------------- encode --


def encode(record: dict, spec: ProtoMessageSpec) -> bytes:
    """proto3 encode: fields in number order, defaults omitted."""
    out = io.BytesIO()
    for f in sorted(spec.fields, key=lambda f: f.number):
        v = (record or {}).get(f.name)
        if v is None or v == _DEFAULTS[f.type]:
            continue
        _write_varint(out, (f.number << 3) | _WIRE_TYPE[f.type])
        if f.type == "string":
            raw = str(v).encode("utf-8")
            _write_varint(out, len(raw))
            out.write(raw)
        elif f.type == "bytes":
            raw = bytes(v)
            _write_varint(out, len(raw))
            out.write(raw)
        elif f.type == "message":
            raw = encode(v, f.message_spec)
            _write_varint(out, len(raw))
            out.write(raw)
        elif f.type in ("int32", "int64", "uint64"):
            _write_varint(out, int(v))
        elif f.type in ("sint32", "sint64"):
            _write_varint(out, _zigzag(int(v)))
        elif f.type == "bool":
            _write_varint(out, 1)
        elif f.type == "double":
            out.write(struct.pack("<d", float(v)))
        elif f.type == "float":
            out.write(struct.pack("<f", float(v)))
        else:  # pragma: no cover
            raise ValueError(f"unsupported proto type {f.type!r}")
    return out.getvalue()


# ----------------------------------------------------------------- decode --


def _skip(buf: io.BytesIO, wire_type: int) -> None:
    if wire_type == _WT_VARINT:
        _read_varint(buf)
    elif wire_type == _WT_I64:
        _read_exact(buf, 8)
    elif wire_type == _WT_LEN:
        _read_exact(buf, _read_varint(buf))
    elif wire_type == _WT_I32:
        _read_exact(buf, 4)
    else:
        raise ValueError(f"unknown wire type {wire_type}")


def decode(payload: bytes, spec: ProtoMessageSpec) -> dict:
    """proto3 decode: unknown fields skipped, missing fields defaulted."""
    fields = spec.by_number()
    rec = {f.name: _DEFAULTS[f.type] for f in spec.fields}
    buf = io.BytesIO(payload)
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        tag = _read_varint(buf)
        number, wire_type = tag >> 3, tag & 0x7
        f = fields.get(number)
        if f is None or _WIRE_TYPE[f.type] != wire_type:
            _skip(buf, wire_type)
            continue
        if f.type == "string":
            rec[f.name] = _read_exact(buf, _read_varint(buf)).decode("utf-8")
        elif f.type == "bytes":
            rec[f.name] = _read_exact(buf, _read_varint(buf))
        elif f.type == "message":
            rec[f.name] = decode(_read_exact(buf, _read_varint(buf)), f.message_spec)
        elif f.type in ("int32", "int64"):
            n = _read_varint(buf)
            bits = 32 if f.type == "int32" else 64
            if n >= 1 << (bits - 1):  # two's-complement negatives
                n -= 1 << 64 if n >= 1 << 63 else 1 << bits
            rec[f.name] = n
        elif f.type == "uint64":
            rec[f.name] = _read_varint(buf)
        elif f.type in ("sint32", "sint64"):
            rec[f.name] = _unzigzag(_read_varint(buf))
        elif f.type == "bool":
            rec[f.name] = _read_varint(buf) != 0
        elif f.type == "double":
            rec[f.name] = struct.unpack("<d", _read_exact(buf, 8))[0]
        elif f.type == "float":
            rec[f.name] = struct.unpack("<f", _read_exact(buf, 4))[0]
    return rec
