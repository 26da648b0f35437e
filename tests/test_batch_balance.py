"""Batch wiring: merge two fixture sessions and check the GLOBAL bus
balance host-side (chip perm-trace bus sums vs batch_public_messages) —
the exact identity verify_machine enforces, without the proving cost."""

import pytest

from zktls_tpu.core.legacy import LegacyGuestInput
from zktls_tpu.guest.program import run_guest
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.provers.stark import (
    batch_public_messages,
    build_chip_instances,
    journal_public_messages,
    merge_guest_outputs,
)
from zktls_tpu.stark.bus import MAX_PAYLOAD, bus_term, delta_powers

CHALLENGES = [Fp4(97, 41, 3, 8)] + delta_powers(Fp4(29, 17, 5, 12),
                                                MAX_PAYLOAD)


def _bus_total(chips, msgs):
    total = Fp4(0)
    for ci in chips:
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, CHALLENGES)
        total = total + Fp4(*[int(v) for v in perm[-1, -4:]])
    for tag, payload, mult in msgs:
        t = bus_term(CHALLENGES, tag, payload)
        total = total + (t if mult > 0 else Fp4(0) - t)
    return total


@pytest.fixture(scope="module")
def guest_out(fixture_cbor_bytes):
    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes).to_guest_input()
    return run_guest(gi), run_guest(gi)


def test_single_session_bus_balances(guest_out):
    out, _ = guest_out
    chips = _bus_chips = build_chip_instances(out)
    assert _bus_total(chips, journal_public_messages(out.journal)) == Fp4(0)


def test_two_session_batch_bus_balances(guest_out):
    out1, out2 = guest_out
    merged = merge_guest_outputs([out1, out2])
    chips = build_chip_instances(merged)
    msgs = batch_public_messages([out1.journal, out2.journal])
    assert _bus_total(chips, msgs) == Fp4(0)


def test_batch_balance_breaks_on_journal_tamper(guest_out):
    out1, out2 = guest_out
    merged = merge_guest_outputs([out1, out2])
    chips = build_chip_instances(merged)
    bad = bytearray(out2.journal)
    bad[-40] ^= 1        # inside gcm_records / filtered region
    msgs = batch_public_messages([out1.journal, bytes(bad)])
    assert _bus_total(chips, msgs) != Fp4(0)
