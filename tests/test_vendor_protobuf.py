"""Wire-format pins for the vendored mini protobuf runtime.

stream_transform_with_state speaks this wire format to the JVM state
server, where protobuf-java parses it — so these byte-level pins are
the contract: every expected-bytes literal below was derived by hand
from the public protobuf encoding spec
(protobuf.dev/programming-guides/encoding/), and the end-to-end proof
is the operator's oracle parity (test_parity covers it).
"""

from __future__ import annotations

import sys

VENDOR = __file__.rsplit("/tests/", 1)[0] + "/vendor"
if VENDOR not in sys.path:
    sys.path.append(VENDOR)


def _pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_vendor_resolves_when_no_real_protobuf():
    from google.protobuf import descriptor, descriptor_pool  # noqa: F401

    assert hasattr(descriptor, "_USE_C_DESCRIPTORS")
    assert descriptor_pool.Default() is descriptor_pool.Default()


def test_scalar_and_submessage_encoding_matches_spec():
    sm = _pb2()
    # version=2 → field 1 varint: 08 02 (spec: tag=(1<<3)|0, value 2).
    req = sm.StateRequest(version=2)
    assert req.SerializeToString() == bytes.fromhex("0802")
    # SetHandleState(state=INITIALIZED(2)) → field 1 varint 2.
    st = sm.SetHandleState(state=sm.INITIALIZED)
    assert st.SerializeToString() == bytes.fromhex("0802")
    # proto3: default-valued scalars are NOT emitted.
    assert sm.StateRequest(version=0).SerializeToString() == b""
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""


def test_empty_oneof_submessage_still_wires_the_tag():
    sm = _pb2()
    # Exists() is an EMPTY message, but as a oneof arm its tag must be
    # serialized (len 0) or the JVM would see an unset method oneof.
    call = sm.ValueStateCall(stateName="agg", exists=sm.Exists())
    data = call.SerializeToString()
    # 0a 03 'agg'  |  12 00 (field 2 Exists, length 0)
    assert data == bytes.fromhex("0a03616767") + bytes.fromhex("1200")


def test_nested_autovivify_and_roundtrip():
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.ttl.durationMs = 5000  # auto-vivified submessage marks present
    call = sm.StatefulProcessorCall(getValueState=cmd)
    req = sm.StateRequest(statefulProcessorCall=call, version=2)
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert back.version == 2
    assert got.stateName == "agg"
    assert got.ttl.durationMs == 5000


def test_negative_int64_and_bool_parse():
    sm = _pb2()
    from google.protobuf.minipb import _enc_varint

    # JVM sends watermark -1 as a 10-byte two's-complement varint.
    buf = bytearray()
    _enc_varint(buf, (3 << 3) | 0)
    _enc_varint(buf, -1)
    resp = sm.StateResponseWithLongTypeVal()
    resp.ParseFromString(bytes(buf))
    assert resp.value == -1
    # requireNextFetch bool + repeated bytes value.
    lg = sm.StateResponseWithListGet()
    lg.ParseFromString(bytes.fromhex("1a030102031a01042001"))
    assert lg.value == [b"\x01\x02\x03", b"\x04"]
    assert lg.requireNextFetch is True
    assert lg.statusCode == 0  # proto3 default when absent


def test_unknown_fields_are_skipped():
    sm = _pb2()
    resp = sm.StateResponse()
    # field 99 varint (unknown), then errorMessage="x"
    resp.ParseFromString(bytes.fromhex("981807") + bytes.fromhex("120178"))
    assert resp.errorMessage == "x"


def test_repeated_message_parse():
    sm = _pb2()
    info = sm.TimerInfo(timestampMs=123)
    payload = info.SerializeToString()
    wrapped = bytearray()
    from google.protobuf.minipb import _enc_varint

    for _ in range(2):
        _enc_varint(wrapped, (3 << 3) | 2)
        _enc_varint(wrapped, len(payload))
        wrapped += payload
    resp = sm.StateResponseWithTimer()
    resp.ParseFromString(bytes(wrapped))
    assert [t.timestampMs for t in resp.timer] == [123, 123]
