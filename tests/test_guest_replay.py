"""Tape-replay tests against the recorded fixture session (test pyramid
level 2, SURVEY.md §4: recorded-session determinism, no network needed)."""

import pytest

from zktls_tpu.core.legacy import LegacyGuestInput
from zktls_tpu.core.tape import parse_time
from zktls_tpu.guest.crypto.keccak import keccak256
from zktls_tpu.guest.journal import decode_journal
from zktls_tpu.guest.program import run_guest
from zktls_tpu.guest.replay import ReplayError, replay_session
from zktls_tpu.guest.x509 import verify_chain


@pytest.fixture(scope="module")
def legacy(fixture_cbor_bytes):
    # pytest fixtures of session scope can't be reused at module level here,
    # so re-read the bytes
    return LegacyGuestInput.from_cbor(fixture_cbor_bytes)


@pytest.fixture(scope="module")
def fixture_cbor_bytes():
    from tests.conftest import FIXTURE_CBOR

    return FIXTURE_CBOR.read_bytes()


def test_replay_fixture_full_session(legacy):
    res = replay_session(legacy.to_guest_input_response())
    # every self-consistency check must hold on the golden tape
    assert res.all_checks_pass(), res.checks
    assert res.cipher_suite.id == 0xC02F
    assert res.curve_name == "secp256r1"
    assert res.request_plaintext == legacy.request.template.render()
    assert res.response_plaintext == legacy.response
    assert res.response_plaintext.startswith(b"HTTP/1.1 200 OK")
    # witness streams populated
    assert len(res.sha256_recorder.events) > 100
    assert len(res.gcm_events) == 6  # CFin, SFin, req, 2x resp, alert
    # key derivation is deterministic
    res2 = replay_session(legacy.to_guest_input_response())
    assert res2.master_secret == res.master_secret
    assert res2.client_write_key == res.client_write_key


def test_replay_witness_event_consistency(legacy):
    res = replay_session(legacy.to_guest_input_response())
    # GCM keystream XOR plaintext == ciphertext for every decryption event
    for ev in res.gcm_events:
        ks = b"".join(ev.keystream)[: len(ev.ciphertext)]
        assert bytes(a ^ b for a, b in zip(ev.plaintext, ks)) == ev.ciphertext
    # SHA-256 compression chains are internally consistent
    for ev in res.sha256_recorder.events:
        from zktls_tpu.guest.crypto.sha256 import compress

        assert compress(ev.state_in, ev.block) == ev.state_out


def test_replay_rejects_tampered_tape(legacy):
    gir = legacy.to_guest_input_response()
    # flip one ciphertext byte in the last stream segment (server appdata)
    tampered = bytearray(gir.stream)
    tampered[-20] ^= 0x01
    gir_bad = type(gir)(
        time=gir.time, stream=bytes(tampered), random=gir.random,
        response=gir.response,
        filtered_responses_begin=gir.filtered_responses_begin,
        filtered_responses_length=gir.filtered_responses_length,
        filtered_responses=gir.filtered_responses,
    )
    with pytest.raises(ReplayError):
        replay_session(gir_bad)


def test_replay_rejects_wrong_response_claim(legacy):
    gir = legacy.to_guest_input_response()
    gir.response = gir.response[:-1] + b"X"
    res = replay_session(gir)
    assert not res.checks["response_matches_tape"]


def test_chain_verification(legacy):
    res = replay_session(legacy.to_guest_input_response())
    sec, _ = parse_time(legacy.time)
    out = verify_chain(res.certificate_chain, "httpbin.org", sec)
    assert out["hostname_match"] and out["validity"] and out["signatures"]
    # wrong hostname rejected
    assert not verify_chain(res.certificate_chain, "evil.example", sec)[
        "hostname_match"
    ]
    # expired at a clock 10 years later
    assert not verify_chain(
        res.certificate_chain, "httpbin.org", sec + 10 * 365 * 86400
    )["validity"]


def test_run_guest_emits_journal(legacy):
    gi = legacy.to_guest_input()
    out = run_guest(gi)
    j = decode_journal(out.journal)
    assert j["journal_version"] == 2
    assert j["request_hash"] == keccak256(gi.request.request_info.request)
    # v2 binding fields
    import hashlib

    assert j["stream_sha256"] == hashlib.sha256(
        gi.response.stream).digest()
    from zktls_tpu.stark.chips.gcm_control import GCM_RECORD_SIZE

    assert len(j["gcm_records"]) == GCM_RECORD_SIZE * len(
        out.replay.gcm_events)
    assert j["response_hash"] == keccak256(out.replay.response_plaintext)
    assert j["server_name"] == "httpbin.org"
    assert j["time"] == parse_time(legacy.time)[0]
    assert j["filtered_begins"] == [f.begin for f in legacy.filtered_responses]
    assert j["filtered_contents"] == [f.bytes for f in legacy.filtered_responses]
    # journal emission is deterministic
    assert run_guest(gi).journal == out.journal


def test_run_guest_rejects_request_mismatch(legacy):
    gi = legacy.to_guest_input()
    gi.request.request_info.request = b"GET /other HTTP/1.1\r\n\r\n"
    with pytest.raises(ReplayError, match="request"):
        run_guest(gi)


def test_keccak256_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_origin_signature_roundtrip(legacy):
    """Sign a request with a known key; the guest recovers the address."""
    from zktls_tpu.guest.crypto.ec import SECP256K1
    from zktls_tpu.guest.crypto.keccak import keccak256
    from zktls_tpu.guest.origin import recover_origin_signer, sign_origin
    from zktls_tpu.core.types import RequestOrigin

    gi = legacy.to_guest_input()
    priv = 0xA1B2C3D4E5F60718293A4B5C6D7E8F90A1B2C3D4E5F60718293A4B5C6D7E8F90
    gi.request.origin = RequestOrigin(type="secp256k1", signature=b"\x00" * 65,
                                      nonce=7)
    sig = sign_origin(gi.request, priv)
    gi.request.origin.signature = sig
    pub = SECP256K1.mul(priv, SECP256K1.g)
    want = keccak256(pub[0].to_bytes(32, "big")
                     + pub[1].to_bytes(32, "big"))[12:]
    assert recover_origin_signer(gi.request) == want
    # journal carries the recovered signer
    out = run_guest(gi)
    j = decode_journal(out.journal)
    assert j["origin_signer"] == want
    assert j["nonce"] == 7
    # a different nonce changes the digest -> different recovered signer
    gi.request.origin.nonce = 8
    assert recover_origin_signer(gi.request) != want
