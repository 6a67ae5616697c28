"""Unit pins for the vendored minimal protobuf runtime
(vendor/protostub) that backs transformWithState when the container
lacks ``google.protobuf`` (tests/test_streaming.py runs the live
protocol; this file pins the wire codec itself).

Golden bytes are hand-derived from the published encoding spec
(https://protobuf.dev/programming-guides/encoding/), so a codec
regression fails against the spec, not against itself.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

_STUB = str(Path(__file__).resolve().parents[1] / "vendor" / "protostub")


@pytest.fixture(scope="module")
def mini():
    sys.path.insert(0, _STUB)
    try:
        import importlib

        # force the stub even when the real protobuf is installed: load
        # its _mini module directly by path, bypassing the google ns
        spec = importlib.util.spec_from_file_location(
            "protostub_mini", Path(_STUB) / "google/protobuf/_mini.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(_STUB)


def _msg_desc(mini, name, fields):
    md = mini.MessageDescriptorLite(name, f".test.{name}")
    for fname, fnum, ftype, *rest in fields:
        fd = mini.FieldDescriptorLite(
            fname, fnum, ftype, rest[0] if rest else 1, ""
        )
        md._add_field(fd)
    return md


def test_varint_golden(mini):
    assert mini._enc_varint(0) == b"\x00"
    assert mini._enc_varint(1) == b"\x01"
    assert mini._enc_varint(300) == b"\xac\x02"  # the spec's example
    # negative int64: 10-byte two's complement
    assert mini._enc_varint(-1) == b"\xff" * 9 + b"\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        dec, pos = mini._dec_varint(mini._enc_varint(v), 0)
        assert dec == v and pos == len(mini._enc_varint(v))


def test_scalar_message_golden(mini):
    # message T { int32 a = 1; string s = 2; bytes b = 3; bool f = 4; }
    md = _msg_desc(
        mini,
        "T",
        [
            ("a", 1, mini.TYPE_INT32),
            ("s", 2, mini.TYPE_STRING),
            ("b", 3, mini.TYPE_BYTES),
            ("f", 4, mini.TYPE_BOOL),
        ],
    )
    cls = mini._class_for(md)
    m = cls(a=150, s="testing", b=b"\x01", f=True)
    # spec examples: field1 varint 150 -> 08 96 01; field2 "testing"
    # -> 12 07 74 65 73 74 69 6e 67
    wire = m.SerializeToString()
    assert wire.startswith(b"\x08\x96\x01\x12\x07testing")
    assert b"\x1a\x01\x01" in wire  # field 3 LEN 1
    assert wire.endswith(b"\x20\x01")  # field 4 varint 1
    rt = cls()
    rt.ParseFromString(wire)
    assert (rt.a, rt.s, rt.b, rt.f) == (150, "testing", b"\x01", True)


def test_proto3_default_skipping_and_negative_int(mini):
    md = _msg_desc(mini, "D", [("a", 1, mini.TYPE_INT64)])
    cls = mini._class_for(md)
    assert cls(a=0).SerializeToString() == b""  # proto3: defaults skipped
    neg = cls(a=-5)
    rt = cls()
    rt.ParseFromString(neg.SerializeToString())
    assert rt.a == -5


def test_empty_submessage_presence(mini):
    """Oneof discriminators in StateMessage.proto are EMPTY messages —
    an explicitly-set empty submessage must still hit the wire."""
    inner = _msg_desc(mini, "Empty", [])
    outer = mini.MessageDescriptorLite("O", ".test.O")
    fd = mini.FieldDescriptorLite("e", 7, mini.TYPE_MESSAGE, 1, ".test.Empty")
    fd.message_type = inner
    outer._add_field(fd)
    ocls = mini._class_for(outer)
    icls = mini._class_for(inner)
    wire = ocls(e=icls()).SerializeToString()
    assert wire == b"\x3a\x00"  # tag(7, LEN) + len 0
    assert ocls().SerializeToString() == b""  # unset -> absent


def test_repeated_bytes_and_unknown_field_skip(mini):
    md = _msg_desc(
        mini, "R", [("v", 2, mini.TYPE_BYTES, mini.LABEL_REPEATED)]
    )
    cls = mini._class_for(md)
    wire = cls(v=[b"a", b"bb"]).SerializeToString()
    assert wire == b"\x12\x01a\x12\x02bb"
    # prepend an unknown varint field (1) and append an unknown LEN
    # field (9): parser must skip both
    rt = cls()
    rt.ParseFromString(b"\x08\x2a" + wire + b"\x4a\x03xyz")
    assert rt.v == [b"a", b"bb"]


def test_packed_varint_parsing(mini):
    """proto3 serializers pack repeated varints; the parser must accept
    the packed form even though we emit unpacked."""
    md = _msg_desc(
        mini, "P", [("xs", 1, mini.TYPE_INT32, mini.LABEL_REPEATED)]
    )
    cls = mini._class_for(md)
    rt = cls()
    rt.ParseFromString(b"\x0a\x03\x01\xac\x02")  # packed [1, 300]
    assert rt.xs == [1, 300]


def test_packed_fixed_width_parsing(mini):
    """Packed repeated double/float/fixed arrive as ONE multi-element
    LEN payload; the parser must stride-decode it (and reject a payload
    whose length isn't a multiple of the element width)."""
    import struct

    md = _msg_desc(
        mini, "PD", [("ds", 1, mini.TYPE_DOUBLE, mini.LABEL_REPEATED)]
    )
    cls = mini._class_for(md)
    payload = struct.pack("<2d", 1.5, -2.25)
    rt = cls()
    rt.ParseFromString(b"\x0a\x10" + payload)  # tag(1, LEN) + len 16
    assert rt.ds == [1.5, -2.25]

    md32 = _msg_desc(
        mini, "PF", [("fs", 1, mini.TYPE_FIXED32, mini.LABEL_REPEATED)]
    )
    cls32 = mini._class_for(md32)
    rt32 = cls32()
    rt32.ParseFromString(b"\x0a\x08" + struct.pack("<2I", 7, 300))
    assert rt32.fs == [7, 300]

    bad = cls()
    with pytest.raises(ValueError, match="not a multiple"):
        bad.ParseFromString(b"\x0a\x07" + payload[:7])


def test_real_pb2_module_roundtrip(mini):
    """End-to-end through Spark's actual generated module: the stub must
    build pyspark's StateMessage_pb2 and round-trip the handshake the
    state client sends first. Skipped when the real protobuf is
    installed (the generated module then binds to it, not the stub)."""
    try:
        import google.protobuf as gp

        if "protostub" not in (getattr(gp, "__file__", "") or ""):
            pytest.skip("real protobuf installed; stub not in play")
    except ImportError:
        pytest.skip("google namespace not importable at all")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    rt = sm.StateRequest()
    rt.ParseFromString(req.SerializeToString())
    assert rt.statefulProcessorCall.setHandleState.state == sm.CREATED
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb"], requireNextFetch=True
    )
    r2 = sm.StateResponseWithListGet()
    r2.ParseFromString(resp.SerializeToString())
    assert list(r2.value) == [b"a", b"bb"] and r2.requireNextFetch
