"""Unit tests for the vendored protobuf shim's message runtime
(round-9 ADVICE): auto-vivified sub-messages must be cached (a detached
instance silently drops `msg.sub.x = v`), and packed repeated scalars —
a wire-type-2 payload for a varint-typed repeated field — must raise
instead of being stored as raw bytes."""

import pytest

from stream_processor_spark.vendor.protobuf_shim.google.protobuf import wire
from stream_processor_spark.vendor.protobuf_shim.google.protobuf.message_runtime import (
    FieldDesc,
    FileDesc,
    MessageDesc,
    build_classes,
)


def _classes():
    sub = MessageDesc("Sub", ".t.Sub")
    sub.fields = [FieldDesc("x", 1, 3, False, "")]
    outer = MessageDesc("Outer", ".t.Outer")
    outer.fields = [
        FieldDesc("sub", 1, 11, False, ".t.Sub"),
        FieldDesc("nums", 2, 3, True, ""),
        FieldDesc("tag", 3, 9, False, ""),
    ]
    fd = FileDesc()
    fd.messages = [sub, outer]
    return build_classes(fd)


def test_subm_autovivify_persists_through_serialize():
    reg = _classes()
    Outer = reg[".t.Outer"]
    o = Outer()
    o.sub.x = 7  # writes through the cached auto-vivified instance
    assert o.sub.x == 7
    o2 = Outer()
    o2.ParseFromString(o.SerializeToString())
    assert o2.sub.x == 7


def test_repeated_varints_roundtrip_unpacked():
    reg = _classes()
    Outer = reg[".t.Outer"]
    o = Outer()
    o.nums.extend([1, 5, 300])
    o.tag = "hi"
    o2 = Outer()
    o2.ParseFromString(o.SerializeToString())
    assert list(o2.nums) == [1, 5, 300]
    assert o2.tag == "hi"


def test_packed_repeated_scalars_raise():
    reg = _classes()
    Outer = reg[".t.Outer"]
    packed = wire.encode_len_delimited(
        2, wire.encode_varint(1) + wire.encode_varint(2)
    )
    with pytest.raises(NotImplementedError, match="packed"):
        Outer().ParseFromString(bytes(packed))


def test_pure_read_does_not_change_equality_or_wire():
    """Round-10 ADVICE: auto-vivifying a sub-message (or repeated list)
    on a PURE READ must not make two semantically identical messages
    unequal, and must not emit the field on the wire — while an
    EXPLICITLY assigned empty sub-message keeps real presence (the
    oneof Exists() case: the tag itself carries the information) and a
    vivified-then-MUTATED one still counts everywhere."""
    reg = _classes()
    Outer, Sub = reg[".t.Outer"], reg[".t.Sub"]
    a, b = Outer(), Outer()
    assert a == b
    wire_before = a.SerializeToString()

    _ = a.sub          # read-only touch: vivifies + caches
    _ = a.nums         # same for the repeated field
    assert a == b and b == a                      # equality unaffected
    assert a.SerializeToString() == wire_before   # wire unaffected
    # nested pure read inside the vivified sub stays effectively empty
    assert a._effective_values() == {}

    # explicit assignment of an EMPTY sub-message = presence
    a.sub = Sub()
    assert a != b
    assert a.SerializeToString() != wire_before   # tag emitted

    # vivified then MUTATED = real content, counts everywhere
    c = Outer()
    c.sub.x = 7
    assert c != Outer()
    assert c.SerializeToString() != wire_before
    c2 = Outer()
    c2.ParseFromString(c.SerializeToString())
    assert c2.sub.x == 7 and c2 == c

    # vivified repeated list that GAINS an element counts too
    d = Outer()
    d.nums.append(4)
    assert d != Outer() and d.SerializeToString() != wire_before
