"""AES-128 keystream chip: witness generation, LogUp S-box binding,
constraint satisfaction on real replay events, and tamper detection."""

import os

import numpy as np
import pytest

from zktls_tpu.guest.crypto.aes import AES, SBOX
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.chips.aes128 import LAYOUT, Aes128Air, aes128_trace
from zktls_tpu.stark.debug import check_trace

AIR = Aes128Air()
CHALS = [Fp4(97531, 8642, 3, 14), Fp4(271828, 31415, 9, 26)]


def _checked(trace, public):
    perm = AIR.generate_perm_trace(trace, public, CHALS)
    return check_trace(AIR, trace, public, perm_trace=perm, challenges=CHALS)


def test_single_block_fips_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    trace, public = aes128_trace([(key, pt)])
    assert trace.shape == (256, LAYOUT.width)
    assert bytes(public).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _checked(trace, public) == []


def test_multi_block_real_gcm_witness(fixture_cbor_bytes):
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.replay import replay_session

    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    res = replay_session(gi.to_guest_input_response())
    blocks = [(ev.key, cb) for ev in res.gcm_events
              for cb in ev.counter_blocks]
    assert len(blocks) == 35
    trace, public = aes128_trace(blocks)
    assert bytes(public) == res.gcm_events[-1].keystream[-1]
    assert _checked(trace, public) == []


@pytest.fixture(scope="module")
def fixture_cbor_bytes():
    from tests.conftest import FIXTURE_CBOR

    return FIXTURE_CBOR.read_bytes()


def test_tampered_sbox_output_detected():
    key = bytes(range(16))
    trace, public = aes128_trace([(key, bytes(16))])
    bad = trace.copy()
    bad[250, LAYOUT["sb"].start + 5] ^= 1  # last group, active row
    assert _checked(bad, public)


def test_forged_round_key_detected():
    key = bytes(range(16))
    trace, public = aes128_trace([(key, bytes(16))])
    bad = trace.copy()
    bad[241, LAYOUT["rk"].start + 3] ^= 1  # round 1 key bit of last group
    assert _checked(bad, public)


def test_wrong_public_keystream_detected():
    key = bytes(range(16))
    trace, public = aes128_trace([(key, bytes(16))])
    bad_public = list(public)
    bad_public[7] ^= 0x40
    fails = _checked(trace, bad_public)
    assert fails and all(r == 255 for r, _c in fails)


def test_multiplicities_balance_totals():
    trace, public = aes128_trace([(bytes(range(16)), bytes(16))])
    total_m = int(trace[:, LAYOUT["mult"].start].sum())
    assert total_m == trace.shape[0] * 20  # every row looks up 20 tuples
