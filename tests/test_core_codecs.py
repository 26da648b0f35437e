"""Golden tests for the data model + codecs against the reference fixtures.

The key property (SURVEY.md §7 step 1): decode the reference's 13,217-byte
recorded-session CBOR and re-encode it byte-identically.
"""

import json

from zktls_tpu.core import cbor
from zktls_tpu.core.legacy import LegacyGuestInput
from zktls_tpu.core.tape import (
    DIR_CLIENT_TO_SERVER,
    DIR_SERVER_TO_CLIENT,
    RandomTape,
    decode_stream,
    encode_stream,
    format_time,
    parse_time,
    stream_halves,
)
from zktls_tpu.core.types import GuestInput, GuestInputResponse, Request


# ---------------------------------------------------------------------------
# CBOR primitives
# ---------------------------------------------------------------------------


def test_cbor_roundtrip_primitives():
    cases = [
        0, 1, 10, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**64 - 1,
        -1, -24, -25, -256, -257,
        b"", b"\x00\xff", "a" * 300, "héllo",
        [1, [2, 3], b"x"], {"a": 1, "b": [True, False, None]},
    ]
    for c in cases:
        assert cbor.loads(cbor.dumps(c)) == c


def test_cbor_minimal_heads():
    # ciborium uses minimal-length (canonical) integer heads
    assert cbor.dumps(23) == b"\x17"
    assert cbor.dumps(24) == b"\x18\x18"
    assert cbor.dumps(255) == b"\x18\xff"
    assert cbor.dumps(256) == b"\x19\x01\x00"
    assert cbor.dumps(-1) == b"\x20"


# ---------------------------------------------------------------------------
# Golden fixture: bit-exact round-trip
# ---------------------------------------------------------------------------


def test_fixture_cbor_bitexact_roundtrip(fixture_cbor_bytes):
    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    assert gi.to_cbor() == fixture_cbor_bytes


def test_fixture_contents(fixture_cbor_bytes):
    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    assert gi.request.url == "httpbin.org:443"
    assert gi.request.server_name == "httpbin.org"
    assert gi.time == "1731840085.800056000"
    assert len(gi.random) == 130
    assert len(gi.response) == 426
    assert gi.response.startswith(b"HTTP/1.1 200 OK")
    # template rendering: offsets 25/39 splice "httpbin.org"/"Close"
    rendered = gi.request.template.render()
    assert rendered == (
        b"GET /get HTTP/1.1\r\nHost: httpbin.org\r\nConnection: Close\r\n\r\n"
    )
    # filtered response is a real sub-range of the response
    f = gi.filtered_responses[0]
    assert gi.response[f.begin : f.begin + f.length] == f.bytes


def test_fixture_stream_tape(fixture_cbor_bytes):
    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    segs = decode_stream(gi.stream)
    assert encode_stream(segs) == gi.stream
    # first segment: 238-byte ClientHello flight, client→server
    assert segs[0].direction == DIR_CLIENT_TO_SERVER
    assert len(segs[0].data) == 238
    assert segs[0].data[0] == 0x16  # TLS handshake record
    assert segs[0].data[1:3] == b"\x03\x01"
    assert any(s.direction == DIR_SERVER_TO_CLIENT for s in segs)
    c2s, s2c = stream_halves(gi.stream)
    assert len(c2s) + len(s2c) + 5 * len(segs) == len(gi.stream)


def test_fixture_random_tape_identifies_keys(fixture_cbor_bytes):
    """SURVEY §2.3: random[64:96] is the client_random — it must appear
    verbatim inside the ClientHello on the wire."""
    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    tape = RandomTape(gi.random)
    x25519_priv = tape.draw(32)
    session_id = tape.draw(32)
    client_random = tape.draw(32)
    c2s, _ = stream_halves(gi.stream)
    assert client_random in c2s
    assert session_id in c2s
    assert x25519_priv not in c2s  # private material never hits the wire


def test_time_codec():
    assert parse_time("1731840085.800056000") == (1731840085, 800056000)
    assert format_time(1731840085, 800056000) == "1731840085.800056000"
    assert format_time(*parse_time("5.000000001")) == "5.000000001"


# ---------------------------------------------------------------------------
# Current (v0.2.5) schema
# ---------------------------------------------------------------------------


def test_request_json_roundtrip(fixture_request_json):
    req = Request.from_json(fixture_request_json)
    assert req.version == 1
    assert req.request_info.server_name == "httpbin.org"
    assert req.request_info.request.startswith(b"GET /get HTTP/1.1\r\n")
    assert req.target is not None and len(req.target.client) == 20
    assert req.origin is not None and len(req.origin.signature) == 65
    # semantic round-trip through our JSON codec
    again = Request.from_json(req.to_json())
    assert again == req
    # and the emitted JSON object graph matches the reference's exactly
    assert json.loads(req.to_json()) == json.loads(fixture_request_json)


def test_guest_input_cbor_roundtrip(fixture_request_json, fixture_cbor_bytes):
    req = Request.from_json(fixture_request_json)
    legacy = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    gi = GuestInput(request=req, response=legacy.to_guest_input_response())
    blob = gi.to_cbor()
    again = GuestInput.from_cbor(blob)
    assert again == gi
    assert again.to_cbor() == blob
    # JSON path too
    assert GuestInput.from_json(gi.to_json()) == gi


def test_guest_input_response_tape_fields_are_uint_arrays():
    """Plain Vec<u8> fields must encode as CBOR arrays-of-uints (serde
    default), matching the reference convention observed in the fixture."""
    r = GuestInputResponse(
        time="1.000000000", stream=b"\x02\x00\x00\x00\x01a",
        random=b"\xaa", response=b"hi",
    )
    obj = cbor.loads(cbor.dumps(r.to_obj(human=False)))
    assert obj["stream"] == [2, 0, 0, 0, 1, ord("a")]
    assert obj["random"] == [0xAA]
