"""Clean-room protobuf shim (novelti_dingo_spark/_vendor/pbshim):
wire-format roundtrips over pyspark's real generated StateMessage_pb2
module, plus the activation contract. The authoritative end-to-end
check is test_streaming.py's transformWithState run (the JVM parses
what the shim emits); these tests pin the runtime's own invariants so
a wire bug localizes here first."""

from __future__ import annotations

import importlib.util

import pytest

from novelti_dingo_spark.protobuf_fallback import ensure_protobuf


@pytest.fixture(scope="module")
def sm():
    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_activation_makes_protobuf_importable():
    mode = ensure_protobuf()
    assert mode in ("real", "shim")
    assert importlib.util.find_spec("google.protobuf") is not None
    # idempotent: the decision sticks and the path is not re-inserted
    assert ensure_protobuf() == mode


def test_known_wire_bytes(sm):
    """Hand-derived from the public encoding spec: StateRequest field 2
    (statefulProcessorCall, len-type -> tag 0x12) wrapping
    SetHandleState field 1 (tag 0x0a) wrapping enum field 1 = CREATED
    (tag 0x08, varint 1)."""
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020801")


def test_scalar_roundtrips(sm):
    big = 2**62 + 12345
    m = sm.RegisterTimer(expiryTimestampMs=big)
    m2 = sm.RegisterTimer()
    m2.ParseFromString(m.SerializeToString())
    assert m2.expiryTimestampMs == big
    # negative int64 (sign-extended 10-byte varint)
    m3 = sm.RegisterTimer(expiryTimestampMs=-7)
    m4 = sm.RegisterTimer()
    m4.ParseFromString(m3.SerializeToString())
    assert m4.expiryTimestampMs == -7
    # utf-8 string with multibyte chars
    m5 = sm.ParseStringSchema(schema="émojis ✓ 日本語")
    m6 = sm.ParseStringSchema()
    m6.ParseFromString(m5.SerializeToString())
    assert m6.schema == "émojis ✓ 日本語"


def test_defaults_and_presence(sm):
    r = sm.StateResponse()
    r.ParseFromString(b"")  # nothing on the wire
    assert r.statusCode == 0
    assert r.errorMessage == ""
    assert r.value == b""
    # explicitly set defaults DO serialize (presence model)
    m = sm.StateResponse(statusCode=0)
    assert m.SerializeToString() == bytes.fromhex("0800")


def test_repeated_bytes_and_messages(sm):
    m = sm.StateResponseWithListGet(
        statusCode=0, value=[b"", b"a", b"\x00\xff"], requireNextFetch=True
    )
    m2 = sm.StateResponseWithListGet()
    m2.ParseFromString(m.SerializeToString())
    assert list(m2.value) == [b"", b"a", b"\x00\xff"]
    assert m2.requireNextFetch is True

    kv = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ]
    )
    kv2 = sm.StateResponseWithMapIterator()
    kv2.ParseFromString(kv.SerializeToString())
    assert [(p.key, p.value) for p in kv2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_oneof_switching_and_whichoneof(sm):
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    assert call.WhichOneof("method") == "getValueState"
    call.getListState.CopyFrom(sm.StateCallCommand())
    # setting a sibling must clear the previous case... via setattr:
    call2 = sm.StatefulProcessorCall()
    call2.getValueState = sm.StateCallCommand(stateName="a")
    call2.getMapState = sm.StateCallCommand(stateName="b")
    assert call2.WhichOneof("method") == "getMapState"
    rt = sm.StatefulProcessorCall()
    rt.ParseFromString(call2.SerializeToString())
    assert rt.WhichOneof("method") == "getMapState"
    assert rt.getMapState.stateName == "b"


def test_nested_submessage_autovivify(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 9876  # touch-then-set marks presence
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.ttl.durationMs == 9876
    assert rt.HasField("ttl")


def test_unknown_fields_skipped(sm):
    """Forward compatibility: bytes containing a field number the
    schema lacks must parse (skipped), not crash — varint, len, and
    fixed kinds."""
    payload = sm.StateResponse(statusCode=3).SerializeToString()
    # append unknown field 15 varint, field 14 len-delim, field 13 i64
    extra = (
        bytes([15 << 3 | 0, 0x2A])
        + bytes([14 << 3 | 2, 0x02, 0x61, 0x62])
        + bytes([13 << 3 | 1]) + b"\x00" * 8
    )
    m = sm.StateResponse()
    m.ParseFromString(payload + extra)
    assert m.statusCode == 3


def test_mismatched_wire_type_on_known_field_raises(sm):
    """A KNOWN field arriving with the WRONG wire type is stream
    corruption or an out-of-scope encoding (packed repeated
    primitives arrive as LEN where the declared type says VARINT).
    Silently skipping would drop data — the runtime must fail loud
    (round-7 advice: the old code skipped it like an unknown field)."""
    f = sm.StateResponse.DESCRIPTOR.fields_by_name["statusCode"]
    # statusCode is varint-typed; deliver it length-delimited
    bad = bytes([f.number << 3 | 2, 0x02, 0x61, 0x62])
    m = sm.StateResponse()
    with pytest.raises(NotImplementedError, match="wire type"):
        m.ParseFromString(bad)


def test_descriptor_parse_matches_generated_metadata(sm):
    """The descriptor-blob parser must agree with the generated
    module's own metadata (message set, field numbering)."""
    d = sm.StateRequest.DESCRIPTOR
    assert [f.name for f in d.fields] == [
        "version",
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
        "utilsRequest",
    ]
    assert d.fields_by_name["utilsRequest"].number == 6
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    # proto3 optional: TimerInfo.key has explicit presence
    ti = sm.TimerInfo(timestampMs=5)
    assert not ti.HasField("key")
    ti.key = b"x"
    assert ti.HasField("key")
    rt = sm.TimerInfo()
    rt.ParseFromString(ti.SerializeToString())
    assert rt.key == b"x" and rt.timestampMs == 5
