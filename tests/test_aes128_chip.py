"""AES-128 chip v2: witness generation, LogUp S-box binding, bus send
messages, constraint satisfaction on real replay events, and tamper
detection."""

import numpy as np
import pytest

from zktls_tpu.guest.crypto.aes import AES
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.bus import (
    BUS_AES_ENC,
    MAX_PAYLOAD,
    aes_enc_payload,
    bus_term,
    delta_powers,
)
from zktls_tpu.stark.chips.aes128 import LAYOUT, Aes128Air, aes128_trace
from zktls_tpu.stark.debug import check_trace

AIR = Aes128Air()
CHALS = [Fp4(97531, 8642, 3, 14)] + delta_powers(Fp4(271828, 31415, 9, 26),
                                                 MAX_PAYLOAD)


def _bus_sum(trace):
    perm = AIR.generate_perm_trace(trace, [], CHALS)
    return perm, [int(v) for v in perm[-1, -4:]]


def _checked(trace):
    perm, bus = _bus_sum(trace)
    return check_trace(AIR, trace, bus, perm_trace=perm, challenges=CHALS)


def test_single_block_fips_vector_and_bus_send():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    trace, publics = aes128_trace([(3, key, pt)])
    assert trace.shape == (256, LAYOUT.width)
    assert _checked(trace) == []
    # the chip's bus sum is exactly one AES_ENC send of this block
    _, bus = _bus_sum(trace)
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    payload = aes_enc_payload(3, key, pt, ct)
    assert Fp4(*bus) == bus_term(CHALS, BUS_AES_ENC, payload)


def test_multi_block_real_gcm_witness(fixture_cbor_bytes):
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.replay import replay_session
    from zktls_tpu.models.aes128_chip import aes_event_blocks

    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    res = replay_session(gi.to_guest_input_response())
    blocks = aes_event_blocks(res.gcm_events)
    # counter blocks + per-event H and J0 blocks
    assert len(blocks) == 35 + 2 * len(res.gcm_events)
    trace, _ = aes128_trace(blocks)
    assert _checked(trace) == []


@pytest.fixture(scope="module")
def fixture_cbor_bytes():
    from tests.conftest import FIXTURE_CBOR

    return FIXTURE_CBOR.read_bytes()


def test_tampered_sbox_output_detected():
    key = bytes(range(16))
    trace, _ = aes128_trace([(0, key, bytes(16))])
    bad = trace.copy()
    bad[250, LAYOUT["sb"].start + 5] ^= 1  # last group, active row
    assert _checked(bad)


def test_forged_round_key_detected():
    key = bytes(range(16))
    trace, _ = aes128_trace([(0, key, bytes(16))])
    bad = trace.copy()
    bad[241, LAYOUT["rk"].start + 3] ^= 1  # round 1 key bit of last group
    assert _checked(bad)


def test_forged_key_limb_detected():
    """The key limbs feeding the bus message must match the round-0 key."""
    key = bytes(range(16))
    trace, _ = aes128_trace([(0, key, bytes(16))])
    bad = trace.copy()
    bad[240:256, LAYOUT["key"].start] ^= 1
    assert _checked(bad)


def test_tampered_counter_block_changes_bus_message():
    """Flipping the input block flips the chip's bus sum — the control
    chip's matching receive then breaks the global balance."""
    key = bytes(range(16))
    pt = bytes(16)
    trace, _ = aes128_trace([(0, key, pt)])
    _, good_bus = _bus_sum(trace)
    pt2 = bytes([1] + [0] * 15)
    trace2, _ = aes128_trace([(0, key, pt2)])
    _, bad_bus = _bus_sum(trace2)
    assert good_bus != bad_bus


def test_padding_groups_are_silent():
    """Pad groups (ms = 0) contribute no bus sends: one real block in a
    16-group trace still yields exactly one AES_ENC term."""
    key = bytes(range(16))
    trace, _ = aes128_trace([(7, key, bytes(16))])
    assert int(trace[:, LAYOUT["ms"].start].sum()) == 16  # one live group
    _, bus = _bus_sum(trace)
    ct = AES(key).encrypt_block(bytes(16))
    payload = aes_enc_payload(7, key, bytes(16), ct)
    assert Fp4(*bus) == bus_term(CHALS, BUS_AES_ENC, payload)


def test_multiplicities_balance_totals():
    trace, _ = aes128_trace([(0, bytes(range(16)), bytes(16))])
    total_m = int(trace[:, LAYOUT["mult"].start].sum())
    assert total_m == trace.shape[0] * 20  # every row looks up 20 tuples
