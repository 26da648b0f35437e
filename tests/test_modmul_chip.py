"""ModMul chip: event recording in the EC paths, constraint satisfaction,
tamper rejection, and a prove/verify roundtrip (the bigint/EC precompile
workload, SURVEY.md §2.2.B sp1-curves)."""

import random

import numpy as np
import pytest

from zktls_tpu.guest.crypto.ec import P256, SECP256K1, ecdsa_verify
from zktls_tpu.guest.crypto.modmul import (
    ModMulEvent,
    ModMulRecorder,
    recording,
)
from zktls_tpu.stark.chips.modmul import (
    MODULI_256,
    ModMul256Air,
    modmul_trace,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.debug import check_trace
from zktls_tpu.ops.field_ref import Fp4

AIR = ModMul256Air()
LAYOUT = AIR.slices
GAMMA = Fp4(987654321, 11, 22, 33)


def _checked(trace, public):
    perm = AIR.generate_perm_trace(trace, public, [GAMMA])
    return check_trace(AIR, trace, public, perm_trace=perm,
                       challenges=[GAMMA])


def _random_events(k, seed=1):
    rng = random.Random(seed)
    evs = []
    for _ in range(k):
        m = rng.choice(MODULI_256)
        a, b = rng.randrange(m), rng.randrange(m)
        evs.append(ModMulEvent(a, b, a * b % m, m))
    return evs


def test_trace_satisfies_constraints():
    evs = _random_events(6)
    m = MODULI_256[0]
    a = random.Random(2).randrange(1, m)
    evs.append(ModMulEvent(a, pow(a, -1, m), 1, m))  # inversion event
    trace, public = modmul_trace(evs)
    assert trace.shape == (256, AIR.width)
    assert bytes(public) == evs[-1].r.to_bytes(32, "little")
    assert _checked(trace, public) == []


def test_tampered_product_fails():
    evs = _random_events(3)
    trace, public = modmul_trace(evs)
    row = trace.shape[0] - 2
    trace[row, LAYOUT["r"].start] ^= 1  # corrupt one result limb
    assert _checked(trace, public) != []


def test_tampered_modulus_flag_fails():
    evs = [ev for ev in _random_events(8) if ev.m == MODULI_256[0]]
    if not evs:
        pytest.skip("seed produced no M0 events")
    trace, public = modmul_trace(evs)
    row = trace.shape[0] - 1
    # claim the last event was mod P-256.n instead of its true modulus
    trace[row, LAYOUT["f"]] = 0
    trace[row, LAYOUT["f"].start + 1] = 1
    assert _checked(trace, public) != []


def test_out_of_range_carry_byte_breaks_lookup():
    evs = _random_events(2)
    trace, public = modmul_trace(evs)
    row = trace.shape[0] - 1
    col = LAYOUT["c_lo"].start + 5
    # a non-byte value satisfies the carry equation shifted elsewhere only
    # if the lookup also passed; force it and expect LogUp imbalance
    trace[row, col] += 256
    trace[row, LAYOUT["c_mid"].start + 5] -= 1
    assert _checked(trace, public) != []


def test_ec_recording_covers_group_law():
    rec = ModMulRecorder()
    with recording(rec):
        pt = P256.mul(0xDEADBEEF12345678, P256.g)
    assert P256.is_on_curve(pt)
    assert len(rec.events) > 50
    for ev in rec.events:
        assert (ev.a * ev.b - ev.r) % ev.m == 0
        assert ev.m == P256.p


def test_ecdsa_verify_records_scalar_field_events():
    # make a synthetic key pair and signature
    d = 0x1234567890ABCDEF1234567890ABCDEF
    pub = SECP256K1.mul(d, SECP256K1.g)
    n = SECP256K1.n
    k = 0x5555
    R = SECP256K1.mul(k, SECP256K1.g)
    e = 0x77777777
    r = R[0] % n
    s = pow(k, -1, n) * (e + r * d) % n
    rec = ModMulRecorder()
    with recording(rec):
        ok = ecdsa_verify(SECP256K1, pub, e.to_bytes(32, "big"), r, s)
    assert ok
    assert any(ev.m == n for ev in rec.events)  # scalar-field ops recorded
    assert any(ev.m == SECP256K1.p for ev in rec.events)


def test_prove_verify_roundtrip():
    """Machine prove/verify of the ModMul chip alone (small config)."""
    from zktls_tpu.models.modmul_chip import modmul_air, modmul_instance
    from zktls_tpu.stark.machine import prove_machine, verify_machine

    cfg = StarkConfig(log_blowup=2, num_queries=12, fri_final_size=32)
    evs = _random_events(4, seed=3)
    inst = modmul_instance(evs)
    proof = prove_machine([inst], b"modmul-test", cfg)
    assert verify_machine([modmul_air()], proof, b"modmul-test", [], cfg)


def test_guest_run_exposes_modmul_events(fixture_cbor_bytes):
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.program import run_guest

    gi = LegacyGuestInput.from_cbor(fixture_cbor_bytes).to_guest_input()
    out = run_guest(gi)
    evs = out.modmul_events
    assert len(evs) > 1000  # ECDHE + cert sigs + x25519 + origin recovery
    evs256 = [ev for ev in evs if ev.m in set(MODULI_256)]
    assert len(evs256) > 1000
    # witness generation over the full real stream stays consistent
    trace, public = modmul_trace(evs256)
    assert bytes(public) == evs256[-1].r.to_bytes(32, "little")
