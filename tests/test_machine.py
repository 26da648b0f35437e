"""Machine STARK tests: multi-chip single proof, mixed-height batch FRI,
global LogUp bus balance, journal binding via the transcript.

Reference behavior matched: sp1-core-machine's multi-table shard proof with
LogUp glue (SURVEY.md §2.2.B).
"""

import numpy as np
import pytest

from zktls_tpu.ops.field_ref import P
from zktls_tpu.stark.air import Air
from zktls_tpu.stark.bus import np_bus_inverse_terms
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.ext_val import ExtVal
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                  fri_final_size=64)

TAG_VAL = 0x180      # sender → receiver: (tag, value)
TAG_RESULT = 0x181   # receiver → verifier: (tag, 42)


class SenderAir(Air):
    """256 rows; row i sends (TAG_VAL, i mod 64) on the bus."""

    width = 1
    num_public = 0
    max_constraint_degree = 3
    perm_width = 8           # inv (4) ‖ acc (4)
    has_bus = True
    name = "toy_sender"

    def eval(self, b):
        val = b.local[0]
        gamma, d1 = b.challenges[0], b.challenges[1]
        fp = d1 * ExtVal.from_base(val) + TAG_VAL
        inv = b.perm_ext(0)
        acc = b.perm_ext(1)
        inv_n = b.perm_ext(0, nxt=True)
        acc_n = b.perm_ext(1, nxt=True)
        b.assert_ext_zero(inv * (gamma - fp) - 1)
        b.assert_ext_zero((acc - inv) * b.is_first_row)
        b.assert_ext_zero((acc_n - acc - inv_n) * b.is_transition)
        for ell in range(4):
            b.when_last_row(acc.c[ell] - b.public[ell])

    def generate_perm_trace(self, main, publics, challenges):
        inv = np_bus_inverse_terms(challenges, TAG_VAL, main[:, :1])
        acc = np.cumsum(inv.astype(np.uint64), axis=0) % P
        return np.concatenate([inv, acc], axis=1).astype(np.uint32)


class ReceiverAir(Air):
    """64 rows; row j receives (TAG_VAL, j) with multiplicity 4 and, on the
    last row, sends (TAG_RESULT, 42) for the verifier to consume."""

    width = 2                # val, m_res
    num_public = 0
    max_constraint_degree = 3
    perm_width = 12          # inv (4) ‖ inv_res (4) ‖ acc (4)
    has_bus = True
    name = "toy_receiver"

    def eval(self, b):
        val, m_res = b.local[0], b.local[1]
        m_res_n = b.next[1]
        gamma, d1 = b.challenges[0], b.challenges[1]
        fp = d1 * ExtVal.from_base(val) + TAG_VAL
        fp_res = d1 * 42 + TAG_RESULT
        inv = b.perm_ext(0)
        inv_res = b.perm_ext(1)
        acc = b.perm_ext(2)
        inv_n = b.perm_ext(0, nxt=True)
        inv_res_n = b.perm_ext(1, nxt=True)
        acc_n = b.perm_ext(2, nxt=True)
        b.assert_ext_zero(inv * (gamma - fp) - 1)
        b.assert_ext_zero(inv_res * (gamma - fp_res) - 1)
        # m_res is boolean and may only fire on the global last row; the
        # verifier's mandatory public receive forces it to actually fire
        b.assert_bool(m_res)
        b.when_transition(m_res)   # zero on every row that has a successor
        u = inv * (-4) + inv_res * m_res
        u_n = inv_n * (-4) + inv_res_n * m_res_n
        b.assert_ext_zero((acc - u) * b.is_first_row)
        b.assert_ext_zero((acc_n - acc - u_n) * b.is_transition)
        for ell in range(4):
            b.when_last_row(acc.c[ell] - b.public[ell])

    def generate_perm_trace(self, main, publics, challenges):
        n = main.shape[0]
        inv = np_bus_inverse_terms(challenges, TAG_VAL, main[:, :1])
        res_payload = np.full((n, 1), 42, dtype=np.uint32)
        inv_res = np_bus_inverse_terms(challenges, TAG_RESULT, res_payload)
        m = main[:, 1].astype(np.uint64)[:, None]
        u = ((P - 4) * inv.astype(np.uint64) + m * inv_res) % P
        acc = np.cumsum(u, axis=0) % P
        return np.concatenate([inv, inv_res, acc], axis=1).astype(np.uint32)


def _toy_instances(tamper_sender: bool = False):
    sender_vals = (np.arange(256, dtype=np.uint32) % 64)
    if tamper_sender:
        sender_vals = sender_vals.copy()
        sender_vals[17] = 99   # sends a message nobody receives
    sender_trace = sender_vals.reshape(-1, 1)
    recv_trace = np.zeros((64, 2), dtype=np.uint32)
    recv_trace[:, 0] = np.arange(64)
    recv_trace[-1, 1] = 1
    return [
        ChipInstance(air=SenderAir(), trace=sender_trace, publics=[]),
        ChipInstance(air=ReceiverAir(), trace=recv_trace, publics=[]),
    ]


AIRS = [SenderAir(), ReceiverAir()]
RECEIVES = [(TAG_RESULT, [42])]
BINDING = b"journal-bytes-under-test"


def test_machine_roundtrip_mixed_heights():
    proof = prove_machine(_toy_instances(), BINDING, CFG)
    data = proof.to_bytes()
    proof2 = MachineProof.from_bytes(data)
    assert verify_machine(AIRS, proof2, BINDING, RECEIVES, CFG)
    # chips have different heights -> FRI joiner path exercised
    logs = sorted(c.log_n for c in proof2.chips)
    assert logs == [6, 8]


def test_machine_rejects_wrong_binding():
    proof = prove_machine(_toy_instances(), BINDING, CFG)
    with pytest.raises(VerificationError):
        verify_machine(AIRS, proof, b"some-other-journal", RECEIVES, CFG)


def test_machine_rejects_bus_imbalance_from_tampered_witness():
    proof = prove_machine(_toy_instances(tamper_sender=True), BINDING, CFG)
    with pytest.raises(VerificationError, match="bus imbalance"):
        verify_machine(AIRS, proof, BINDING, RECEIVES, CFG)


def test_machine_rejects_wrong_public_receive():
    proof = prove_machine(_toy_instances(), BINDING, CFG)
    with pytest.raises(VerificationError, match="bus imbalance"):
        verify_machine(AIRS, proof, BINDING, [(TAG_RESULT, [43])], CFG)
    with pytest.raises(VerificationError, match="bus imbalance"):
        verify_machine(AIRS, proof, BINDING, [], CFG)


def test_machine_rejects_tampered_bus_sum():
    proof = prove_machine(_toy_instances(), BINDING, CFG)
    chip = proof.chips[0]
    chip.bus_sum = list(chip.bus_sum)
    chip.bus_sum[0] = (chip.bus_sum[0] + 1) % P
    with pytest.raises(VerificationError):
        verify_machine(AIRS, proof, BINDING, RECEIVES, CFG)


def test_machine_rejects_tampered_public():
    proof = prove_machine(_toy_instances(), BINDING, CFG)
    # flip a FRI final value
    v = proof.fri_final[0]
    from zktls_tpu.ops.field_ref import Fp4
    proof.fri_final[0] = v + Fp4(1)
    with pytest.raises(VerificationError):
        verify_machine(AIRS, proof, BINDING, RECEIVES, CFG)


def test_spill_and_chunked_deep_byte_identical(monkeypatch):
    """Host-spill mode and chunked DEEP are pure memory-management
    strategies: proof bytes must be identical to the resident path."""
    from zktls_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.machine import ChipInstance, prove_machine

    cfg = StarkConfig(log_blowup=2, num_queries=3, pow_bits=0,
                      fri_final_size=16)
    trace, pub = fibonacci_trace(5)

    def mk():
        return [ChipInstance(air=FibonacciAir(), trace=trace,
                             publics=pub)]

    base = prove_machine(mk(), binding=b"spill", config=cfg).to_bytes()
    monkeypatch.setenv("ZKTLS_SPILL_BYTES", "0")
    monkeypatch.setenv("ZKTLS_CHUNKED_DEEP_BYTES", "0")
    assert prove_machine(mk(), binding=b"spill",
                         config=cfg).to_bytes() == base
