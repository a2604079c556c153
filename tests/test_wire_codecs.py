"""Unit tests for the vendored pure-Python wire codecs (no Spark needed).

Byte-level expectations come straight from the public specs:
- Avro binary encoding: https://avro.apache.org/docs/1.11.1/specification/
- Protobuf wire format: https://protobuf.dev/programming-guides/encoding/
  (150 → ``0x96 0x01`` is the canonical docs example)
"""

from __future__ import annotations

from stream_processor_spark.pipeline import avro_py, proto_py

FLAT = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "num", "type": "long"},
    ],
}


def test_avro_spec_pinned_bytes():
    # "a" → len 1 (zigzag 0x02) + 'a'; long 1 → zigzag 0x02
    assert avro_py.encode({"key": "a", "num": 1}, FLAT) == b"\x02a\x02"
    # long -1 → zigzag 0x01; long -64 → zigzag 127 = 0x7f
    assert avro_py.encode({"key": "", "num": -1}, FLAT) == b"\x00\x01"
    assert avro_py.encode({"key": "", "num": -64}, FLAT) == b"\x00\x7f"
    # multi-byte varint: 192 → zigzag 384 = 0x80 0x03
    assert avro_py.encode({"key": "", "num": 192}, FLAT) == b"\x00\x80\x03"


def test_avro_roundtrip_all_types():
    sch = {
        "type": "record",
        "name": "t2",
        "fields": [
            {"name": "v", "type": ["null", "string"]},
            {"name": "b", "type": "boolean"},
            {"name": "n", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "raw", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {
                "name": "sub",
                "type": {
                    "type": "record",
                    "name": "s",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
        ],
    }
    rec = {
        "v": None,
        "b": True,
        "n": -(2**40),
        "d": 1.5,
        "f": 0.5,
        "raw": b"\x00\x01",
        "arr": [1, -2, 3],
        "m": {"a": "b"},
        "sub": {"x": 7},
    }
    assert avro_py.decode(avro_py.encode(rec, sch), sch) == rec
    # union picks the non-null branch for a present value
    rec2 = dict(rec, v="hello")
    assert avro_py.decode(avro_py.encode(rec2, sch), sch) == rec2


def test_avro_truncated_payload_raises():
    import pytest

    with pytest.raises(Exception):
        avro_py.decode(b"\x02", FLAT)  # string header says 1 byte, none follow


def test_proto_spec_pinned_bytes():
    spec = proto_py.demo_message_spec()
    # field 1 'a': tag 0x0a len 1; field 2 'b': 0x12; field 3 int32 150:
    # tag 0x18, varint 0x96 0x01 (the protobuf docs example)
    assert (
        proto_py.encode({"key": "a", "value": "b", "num": 150}, spec)
        == b"\x0a\x01a\x12\x01b\x18\x96\x01"
    )


def test_proto_defaults_omitted_and_refilled():
    spec = proto_py.demo_message_spec()
    raw = proto_py.encode({"key": "", "value": "x", "num": 0}, spec)
    assert raw == b"\x12\x01x"  # defaults omitted on the wire (proto3)
    assert proto_py.decode(raw, spec) == {"key": "", "value": "x", "num": 0}


def test_proto_negative_int32_ten_byte_varint():
    spec = proto_py.demo_message_spec()
    raw = proto_py.encode({"key": "", "value": "", "num": -2}, spec)
    assert len(raw) == 1 + 10  # tag + 10-byte two's-complement varint
    assert proto_py.decode(raw, spec)["num"] == -2


def test_proto_unknown_fields_skipped():
    spec = proto_py.demo_message_spec()
    wide = proto_py.ProtoMessageSpec(
        name="Wide",
        fields=spec.fields
        + (
            proto_py.ProtoField(4, "extra", "string"),
            proto_py.ProtoField(5, "score", "double"),
        ),
    )
    raw = proto_py.encode(
        {"key": "k", "value": "v", "num": 1, "extra": "zzz", "score": 2.5}, wide
    )
    # decoding with the narrower spec skips fields 4 and 5
    assert proto_py.decode(raw, spec) == {"key": "k", "value": "v", "num": 1}


def test_proto_sint_zigzag_and_nested():
    inner = proto_py.ProtoMessageSpec(
        name="Inner", fields=(proto_py.ProtoField(1, "x", "sint64"),)
    )
    outer = proto_py.ProtoMessageSpec(
        name="Outer",
        fields=(
            proto_py.ProtoField(1, "name", "string"),
            proto_py.ProtoField(2, "inner", "message", inner),
        ),
    )
    rec = {"name": "n", "inner": {"x": -3}}
    assert proto_py.decode(proto_py.encode(rec, outer), outer) == rec
