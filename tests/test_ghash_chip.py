"""GHASH chip: witness generation vs the reference GF(2^128) multiply,
constraint satisfaction on real replay events, and tamper detection."""

import numpy as np

import pytest

from zktls_tpu.guest.crypto.aes import AES
from zktls_tpu.guest.crypto.gcm import AESGCM, _ghash_mul
from zktls_tpu.stark.chips.ghash import (
    LAYOUT,
    ROWS_PER_BLOCK,
    GhashAir,
    gcm_event_ghash,
    ghash_trace,
)
from zktls_tpu.stark.debug import check_trace

AIR = GhashAir()


def _checked(trace, public):
    return check_trace(AIR, trace, public)


def test_single_block_matches_reference_mul():
    h = int.from_bytes(bytes(range(16)), "big")
    blk = int.from_bytes(bytes(range(100, 116)), "big")
    trace, public = ghash_trace([(h, [blk])])
    assert trace.shape == (128, LAYOUT.width)
    assert int.from_bytes(bytes(public), "big") == _ghash_mul(blk, h)
    assert _checked(trace, public) == []


def test_multi_block_chained_event():
    h = 0x66E94BD4EF8A2C3B884CFA59CA342B2E  # AES-128 E_0(0) for zero key
    blocks = [int.from_bytes(bytes([i] * 16), "big") for i in (1, 2, 3)]
    y = 0
    for b in blocks:
        y = _ghash_mul(y ^ b, h)
    trace, public = ghash_trace([(h, blocks)])
    assert int.from_bytes(bytes(public), "big") == y
    assert _checked(trace, public) == []


def test_full_gcm_event_tag_equation():
    """S from the chip witness + E_K(J0) from AES == the real GCM tag."""
    key = bytes(range(16))
    nonce = bytes(range(12))
    aad = b"\x17\x03\x03\x00\x30"
    pt = b"the record plaintext payload!!"
    ct_tag = AESGCM(key).encrypt(nonce, pt, aad)
    events: list = []
    AESGCM(key).decrypt(nonce, ct_tag, aad, events)
    ev = events[0]
    h, blocks = gcm_event_ghash(ev)
    trace, public = ghash_trace([(h, blocks)])
    assert _checked(trace, public) == []
    s = int.from_bytes(bytes(public), "big")
    j0 = nonce + b"\x00\x00\x00\x01"
    ek_j0 = int.from_bytes(AES(key).encrypt_block(j0), "big")
    assert (s ^ ek_j0).to_bytes(16, "big") == ev.tag


def test_multiple_events_h_freed_between():
    evs = [
        (int.from_bytes(bytes([7] * 16), "big"), [12345]),
        (int.from_bytes(bytes([9] * 16), "big"), [67890, 13579]),
    ]
    trace, public = ghash_trace(evs)
    # event-start flags: one per event (plus front padding groups)
    es_rows = trace[::ROWS_PER_BLOCK, LAYOUT["es"].start]
    assert int(es_rows.sum()) == (trace.shape[0] // ROWS_PER_BLOCK) - 1
    assert _checked(trace, public) == []


def test_real_replay_events(fixture_cbor_bytes):
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.replay import replay_session

    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    res = replay_session(gi.to_guest_input_response())
    assert res.gcm_events
    ghash_events = [gcm_event_ghash(ev) for ev in res.gcm_events]
    trace, public = ghash_trace(ghash_events)
    # the last event's S must satisfy the recorded tag equation
    ev = res.gcm_events[-1]
    s = int.from_bytes(bytes(public), "big")
    j0 = ev.nonce + b"\x00\x00\x00\x01"
    ek_j0 = int.from_bytes(AES(ev.key).encrypt_block(j0), "big")
    assert (s ^ ek_j0).to_bytes(16, "big") == ev.tag
    assert _checked(trace, public) == []


@pytest.fixture(scope="module")
def fixture_cbor_bytes():
    from tests.conftest import FIXTURE_CBOR

    return FIXTURE_CBOR.read_bytes()


def test_tampered_accumulator_detected():
    h = int.from_bytes(bytes([5] * 16), "big")
    trace, public = ghash_trace([(h, [424242])])
    bad = trace.copy()
    bad[64, LAYOUT["acc"].start + 17] ^= 1
    assert _checked(bad, public)


def test_forged_h_mid_event_detected():
    h = int.from_bytes(bytes([5] * 16), "big")
    trace, public = ghash_trace([(h, [111, 222])])
    bad = trace.copy()
    # flip h in the second block group without setting its es flag
    n = bad.shape[0]
    base = n - ROWS_PER_BLOCK
    for r in range(ROWS_PER_BLOCK):
        bad[base + r, LAYOUT["h"].start + 3] ^= 1
    assert _checked(bad, public)


def test_wrong_public_s_detected():
    h = int.from_bytes(bytes([5] * 16), "big")
    trace, public = ghash_trace([(h, [999])])
    bad_public = list(public)
    bad_public[0] ^= 1
    fails = _checked(trace, bad_public)
    assert fails and all(r == trace.shape[0] - 1 for r, _c in fails)
