"""SHA-256 chip v2: witness generation, constraint satisfaction, chaining
metadata, bus balance, and tamper detection.  Full machine prove/verify of
the chip runs in test_guest_machine.py with a small config."""

import hashlib
import struct

import numpy as np
import pytest

from zktls_tpu.guest.crypto.sha256 import _IV, SHA256Recorder
from zktls_tpu.ops.field_ref import Fp4, P
from zktls_tpu.stark.bus import (
    BUS_SHA_RESULT,
    MAX_PAYLOAD,
    bus_term,
    delta_powers,
    digest_limbs,
)
from zktls_tpu.stark.chips.sha256 import LAYOUT, Sha256Air, sha256_trace
from zktls_tpu.stark.debug import check_trace

AIR = Sha256Air()
CHALLENGES = [Fp4(123, 5, 9, 2)] + delta_powers(Fp4(77, 3, 1, 4),
                                                MAX_PAYLOAD)


def _events(*messages, tags=()):
    rec = SHA256Recorder()
    for i, msg in enumerate(messages):
        tag = tags[i] if i < len(tags) else 0
        rec.new(msg).digest(result_tag=tag)
    return rec.events


def _checked(events):
    trace, publics = sha256_trace(events)
    perm = AIR.generate_perm_trace(trace, publics, CHALLENGES)
    bus_sum = [int(v) for v in perm[-1, -4:]]
    fails = check_trace(AIR, trace, bus_sum, perm_trace=perm,
                        challenges=CHALLENGES)
    return trace, perm, bus_sum, fails


def test_single_block_constraints_and_dig_column():
    trace, perm, bus, fails = _checked(_events(b"abc"))
    assert fails == []
    assert trace.shape == (64, LAYOUT.width)
    # the dig columns on the last row hold the true digest limbs
    want = hashlib.sha256(b"abc").digest()
    limbs = [int(v) for v in trace[-1, LAYOUT["dig"]]]
    assert limbs == digest_limbs(want)


def test_chained_multi_block_and_snapshot_tree():
    rec = SHA256Recorder()
    h = rec.new(b"q" * 150)          # 2 full blocks
    d1 = h.copy().digest()           # snapshot branch (pad block)
    h.update(b"tail bytes")
    d2 = h.digest(result_tag=5)      # main branch end, tagged
    trace, perm, bus, fails = _checked_events(rec.events)
    assert fails == []
    # balance: only the tagged digest is published; snapshot d1 has no
    # consumer and no tag, so it must not be sent
    total = Fp4(*bus) - bus_term(CHALLENGES, BUS_SHA_RESULT,
                                 [5] + digest_limbs(d2))
    assert total == Fp4(0)
    assert d1 == hashlib.sha256(b"q" * 150).digest()


def _checked_events(events):
    return _checked(events)


def test_bit_columns_are_bits():
    trace, *_ = _checked(_events(b"zk"))
    for name in ("a", "e", "s0", "maj", "w1", "sig1", "hc", "seq", "nc"):
        sl = LAYOUT[name]
        assert set(np.unique(trace[:, sl])) <= {0, 1}, name


def test_tampered_witness_detected():
    events = _events(b"abc")
    trace, publics = sha256_trace(events)
    perm = AIR.generate_perm_trace(trace, publics, CHALLENGES)
    bus = [int(v) for v in perm[-1, -4:]]
    for col in (0, LAYOUT["w_win"].start, LAYOUT["h_state"].start,
                LAYOUT["ch"].start, LAYOUT["dig"].start,
                LAYOUT["fresh"].start):
        bad = trace.copy()
        bad[13, col] = (int(bad[13, col]) + 1) % 3
        assert check_trace(AIR, bad, bus, perm_trace=perm,
                           challenges=CHALLENGES), f"col {col} undetected"


def test_fresh_group_must_start_at_iv():
    events = _events(b"abc")
    trace, publics = sha256_trace(events)
    perm = AIR.generate_perm_trace(trace, publics, CHALLENGES)
    bus = [int(v) for v in perm[-1, -4:]]
    bad = trace.copy()
    bad[:, LAYOUT["h_state"].start] = (_IV[0] & 0xFFFF) ^ 1
    assert check_trace(AIR, bad, bus, perm_trace=perm,
                       challenges=CHALLENGES)


def test_chain_inconsistency_raises_in_witness_gen():
    from zktls_tpu.guest.crypto.sha256 import CompressionEvent

    ev = _events(b"abc")[0]
    orphan = CompressionEvent(block=ev.block, state_in=(1, 2, 3, 4, 5, 6, 7, 8),
                              state_out=ev.state_out, obj=9, seq=3)
    with pytest.raises(ValueError, match="no producer"):
        sha256_trace([ev, orphan])


def test_result_tag_requires_real_chain():
    """A tagged digest not matching the verifier's expected digest breaks
    the balance (what journal binding rests on)."""
    events = _events(b"attested message", tags=(7,))
    trace, publics = sha256_trace(events)
    perm = AIR.generate_perm_trace(trace, publics, CHALLENGES)
    bus = [int(v) for v in perm[-1, -4:]]
    right = hashlib.sha256(b"attested message").digest()
    wrong = hashlib.sha256(b"forged message").digest()
    ok = Fp4(*bus) - bus_term(CHALLENGES, BUS_SHA_RESULT,
                              [7] + digest_limbs(right))
    bad = Fp4(*bus) - bus_term(CHALLENGES, BUS_SHA_RESULT,
                               [7] + digest_limbs(wrong))
    assert ok == Fp4(0)
    assert bad != Fp4(0)
