"""GHASH chip v2: witness generation vs the reference GF(2^128) multiply,
bus h/mask/tag messages, constraint satisfaction on real replay events,
and tamper detection."""

import numpy as np
import pytest

from zktls_tpu.guest.crypto.aes import AES
from zktls_tpu.guest.crypto.gcm import AESGCM, _ghash_mul
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.bus import (
    BUS_GCM_H,
    BUS_GCM_MASK,
    BUS_GCM_TAG,
    MAX_PAYLOAD,
    bus_term,
    delta_powers,
    u16_limbs,
)
from zktls_tpu.stark.chips.ghash import (
    LAYOUT,
    ROWS_PER_BLOCK,
    GhashAir,
    gcm_event_ghash,
    ghash_trace,
)
from zktls_tpu.stark.debug import check_trace

AIR = GhashAir()
CHALS = [Fp4(222, 111, 7, 3)] + delta_powers(Fp4(919, 29, 5, 8), MAX_PAYLOAD)


def _bus_sum(trace):
    perm = AIR.generate_perm_trace(trace, [], CHALS)
    return perm, [int(v) for v in perm[-1, -4:]]


def _checked(trace):
    perm, bus = _bus_sum(trace)
    return check_trace(AIR, trace, bus, perm_trace=perm, challenges=CHALS)


def _final_t(trace):
    """The last row's t bits as a big-endian int (the event's S)."""
    bits = trace[-1, LAYOUT["t"]]
    return sum(int(b) << k for k, b in enumerate(bits))


def test_single_block_matches_reference_mul():
    h = int.from_bytes(bytes(range(16)), "big")
    blk = int.from_bytes(bytes(range(100, 116)), "big")
    trace, _ = ghash_trace([(0, h, [blk], 0)])
    assert trace.shape == (128, LAYOUT.width)
    assert _final_t(trace) == _ghash_mul(blk, h)
    assert _checked(trace) == []


def test_multi_block_chained_event():
    h = 0x66E94BD4EF8A2C3B884CFA59CA342B2E  # AES-128 E_0(0) for zero key
    blocks = [int.from_bytes(bytes([i] * 16), "big") for i in (1, 2, 3)]
    y = 0
    for b in blocks:
        y = _ghash_mul(y ^ b, h)
    trace, _ = ghash_trace([(0, h, blocks, 0)])
    assert _final_t(trace) == y
    assert _checked(trace) == []


def test_full_gcm_event_bus_messages():
    """The chip's bus sum is exactly: −h receive − mask receive + tag
    send, with tag = S ⊕ E_K(J0) matching the real GCM tag."""
    key = bytes(range(16))
    nonce = bytes(range(12))
    aad = b"\x17\x03\x03\x00\x30"
    pt = b"the record plaintext payload!!"
    ct_tag = AESGCM(key).encrypt(nonce, pt, aad)
    events: list = []
    AESGCM(key).decrypt(nonce, ct_tag, aad, events)
    ev = events[0]
    h, blocks = gcm_event_ghash(ev)
    trace, _ = ghash_trace([(4, h, blocks, int.from_bytes(ev.j0_mask,
                                                          "big"))])
    assert _checked(trace) == []
    _, bus = _bus_sum(trace)
    expect = (bus_term(CHALS, BUS_GCM_TAG, [4] + u16_limbs(ev.tag))
              - bus_term(CHALS, BUS_GCM_H, [4] + u16_limbs(ev.h_block))
              - bus_term(CHALS, BUS_GCM_MASK, [4] + u16_limbs(ev.j0_mask)))
    # round 3: every processed block is bus-bound too
    from zktls_tpu.stark.bus import BUS_GCM_AAD, BUS_GCM_CT, BUS_GCM_LEN

    def blk_limbs(v):
        return u16_limbs(int(v).to_bytes(16, "big"))

    expect = expect - bus_term(CHALS, BUS_GCM_AAD, [4] + blk_limbs(blocks[0]))
    for i, blk in enumerate(blocks[1:-1]):
        expect = expect - bus_term(CHALS, BUS_GCM_CT,
                                   [4, i + 1] + blk_limbs(blk))
    expect = expect - bus_term(CHALS, BUS_GCM_LEN, [4] + blk_limbs(blocks[-1]))
    assert Fp4(*bus) == expect


def test_multiple_events_h_freed_between():
    evs = [
        (0, int.from_bytes(bytes([7] * 16), "big"), [12345], 0),
        (1, int.from_bytes(bytes([9] * 16), "big"), [67890, 13579], 0),
    ]
    trace, _ = ghash_trace(evs)
    es_rows = trace[::ROWS_PER_BLOCK, LAYOUT["es"].start]
    assert int(es_rows.sum()) == (trace.shape[0] // ROWS_PER_BLOCK) - 1
    assert _checked(trace) == []


def test_real_replay_events(fixture_cbor_bytes):
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.replay import replay_session

    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes)
    res = replay_session(gi.to_guest_input_response())
    assert res.gcm_events
    gh_events = []
    for eid, ev in enumerate(res.gcm_events):
        h, blocks = gcm_event_ghash(ev)
        gh_events.append((eid, h, blocks,
                          int.from_bytes(ev.j0_mask, "big")))
    trace, _ = ghash_trace(gh_events)
    # the last event's S must satisfy the recorded tag equation
    ev = res.gcm_events[-1]
    s = _final_t(trace)
    ek_j0 = int.from_bytes(ev.j0_mask, "big")
    assert (s ^ ek_j0).to_bytes(16, "big") == ev.tag
    assert _checked(trace) == []


@pytest.fixture(scope="module")
def fixture_cbor_bytes():
    from tests.conftest import FIXTURE_CBOR

    return FIXTURE_CBOR.read_bytes()


def test_tampered_accumulator_detected():
    h = int.from_bytes(bytes([5] * 16), "big")
    trace, _ = ghash_trace([(0, h, [424242], 0)])
    bad = trace.copy()
    bad[64, LAYOUT["acc"].start + 17] ^= 1
    assert _checked(bad)


def test_forged_h_mid_event_detected():
    h = int.from_bytes(bytes([5] * 16), "big")
    trace, _ = ghash_trace([(0, h, [111, 222], 0)])
    bad = trace.copy()
    n = bad.shape[0]
    base = n - ROWS_PER_BLOCK
    for r in range(ROWS_PER_BLOCK):
        bad[base + r, LAYOUT["h"].start + 3] ^= 1
    assert _checked(bad)


def test_tampered_block_changes_tag_message():
    """Flipping a data block changes S and therefore the GCM_TAG send —
    the control chip's journal-grounded receive then fails."""
    h = int.from_bytes(bytes([5] * 16), "big")
    mask = 0x1234
    t1, _ = ghash_trace([(0, h, [999], mask)])
    t2, _ = ghash_trace([(0, h, [998], mask)])
    _, b1 = _bus_sum(t1)
    _, b2 = _bus_sum(t2)
    assert _checked(t1) == [] and _checked(t2) == []
    assert b1 != b2
