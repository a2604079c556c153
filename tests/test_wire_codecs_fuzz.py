"""Property tests for the vendored wire codecs (hypothesis, no Spark).

Round-trip invariants: decode(encode(x)) == x for arbitrary records over
the supported type surface, including nested structures, unicode, and
extreme integers. These guard the hand-written varint/zigzag/framing
arithmetic against edge cases the example-based tests don't reach.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stream_processor_spark.pipeline import avro_py, proto_py
from stream_processor_spark.pipeline.codecs import (
    WIRE_HEADER_LEN,
    WIRE_MAGIC,
    wire_header,
)

# ---------------------------------------------------------------- avro -----

AVRO_SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "sub",
            "type": {
                "type": "record",
                "name": "subr",
                "fields": [{"name": "x", "type": ["null", "long"]}],
            },
        },
    ],
}

avro_records = st.fixed_dictionaries(
    {
        "s": st.none() | st.text(max_size=50),
        "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "b": st.booleans(),
        # finite doubles only: NaN breaks == (and engines disagree on NaN
        # payload bits anyway — engine columns treat NaN as NULL upstream)
        "d": st.floats(allow_nan=False, allow_infinity=True),
        "raw": st.binary(max_size=40),
        "arr": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.integers(-(2**32), 2**32), max_size=6),
        "sub": st.fixed_dictionaries({"x": st.none() | st.integers(-(2**62), 2**62)}),
    }
)


@settings(max_examples=200, deadline=None)
@given(avro_records)
def test_avro_roundtrip_property(rec):
    assert avro_py.decode(avro_py.encode(rec, AVRO_SCHEMA), AVRO_SCHEMA) == rec


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_long_zigzag_roundtrip(n):
    sch = {"type": "record", "name": "l", "fields": [{"name": "v", "type": "long"}]}
    assert avro_py.decode(avro_py.encode({"v": n}, sch), sch) == {"v": n}


# ------------------------------------------------------------- protobuf ----

PROTO_SPEC = proto_py.ProtoMessageSpec(
    name="Fuzz",
    fields=(
        proto_py.ProtoField(1, "s", "string"),
        proto_py.ProtoField(2, "raw", "bytes"),
        proto_py.ProtoField(3, "i32", "int32"),
        proto_py.ProtoField(4, "i64", "int64"),
        proto_py.ProtoField(5, "s32", "sint32"),
        proto_py.ProtoField(6, "s64", "sint64"),
        proto_py.ProtoField(7, "b", "bool"),
        proto_py.ProtoField(8, "d", "double"),
        proto_py.ProtoField(
            9,
            "sub",
            "message",
            proto_py.ProtoMessageSpec(
                name="Sub", fields=(proto_py.ProtoField(1, "x", "int64"),)
            ),
        ),
    ),
)

proto_records = st.fixed_dictionaries(
    {
        "s": st.text(max_size=50),
        "raw": st.binary(max_size=40),
        "i32": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "i64": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s32": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "s64": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.booleans(),
        "d": st.floats(allow_nan=False, allow_infinity=True),
        "sub": st.none()
        | st.fixed_dictionaries(
            {"x": st.integers(min_value=-(2**63), max_value=2**63 - 1)}
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(proto_records)
def test_proto_roundtrip_property(rec):
    got = proto_py.decode(proto_py.encode(rec, PROTO_SPEC), PROTO_SPEC)
    # proto3: absent/None message field decodes as its default (None);
    # scalar defaults are indistinguishable from unset by design
    assert got == rec


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64))
def test_proto_decode_never_crashes_on_garbage(raw):
    """Arbitrary bytes either decode to a dict or raise cleanly (EOFError/
    ValueError/Unicode) — never hang or corrupt state. The engine wraps
    decode failures into NULL records (per-message containment)."""
    try:
        out = proto_py.decode(raw, PROTO_SPEC)
        assert isinstance(out, dict)
    except (EOFError, ValueError, UnicodeDecodeError):
        pass


# ------------------------------------------------------------- framing -----


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1), st.binary(max_size=64))
def test_wire_header_roundtrip(schema_id, payload):
    framed = wire_header(schema_id) + payload
    assert framed[:1] == WIRE_MAGIC
    assert int.from_bytes(framed[1:WIRE_HEADER_LEN], "big") == schema_id
    assert framed[WIRE_HEADER_LEN:] == payload
