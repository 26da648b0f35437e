"""Preprocessed (fixed) columns in the machine STARK: committed once at
setup, root carried in the VERIFYING KEY instead of the proof — the
mechanism that puts the recursion VM's program hash in the vk (the
reference's analogue: Plonky3 preprocessed traces / SP1's committed
program ROM)."""

import numpy as np
import pytest

from zktls_tpu.stark.air import Air
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    preprocessed_root,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=6, pow_bits=0,
                  fri_final_size=8)


class FixedMulAir(Air):
    """y = c·x + d with (c, d) preprocessed — the prover cannot choose the
    coefficients, only (x, y) satisfying the committed program."""

    width = 2
    preprocessed_width = 2
    num_public = 0
    max_constraint_degree = 2
    name = "FixedMulAir"

    def eval(self, b):
        x, y = b.local[0], b.local[1]
        c, d = b.pre_local[0], b.pre_local[1]
        b.assert_zero(y - (c * x + d))
        # a transition constraint through the preprocessed NEXT row, so
        # the en-opening path is exercised too: c rows are nonincreasing
        c_n = b.pre_next[0]
        b.when_transition((c - c_n) * (c - c_n - 1))


def _instance(n=32, seed=7):
    rng = np.random.default_rng(seed)
    c = np.sort(rng.integers(0, 50, n).astype(np.uint32))[::-1].copy()
    # make consecutive diffs 0/1: use a step pattern
    c = np.minimum.accumulate(c)
    c = c - (c - c.min()) % 1  # keep simple; enforce diff in {0,1}
    c = np.arange(n, 0, -1, dtype=np.uint32) // 2  # diffs are 0 or 1
    d = rng.integers(0, 1000, n).astype(np.uint32)
    x = rng.integers(0, 10**6, n).astype(np.uint32)
    y = (c.astype(np.uint64) * x + d) % 2013265921
    pre = np.stack([c, d], axis=1).astype(np.uint32)
    trace = np.stack([x, y.astype(np.uint32)], axis=1)
    return ChipInstance(air=FixedMulAir(), trace=trace, publics=[],
                        preprocessed=pre), pre


def test_preprocessed_prove_verify_roundtrip():
    inst, pre = _instance()
    log_n = 5
    proof = prove_machine([inst], binding=b"pre-test", config=CFG)
    vk = {"FixedMulAir": preprocessed_root(
        inst.air, pre, log_n, log_n, CFG)}
    proof2 = MachineProof.from_bytes(proof.to_bytes())
    assert verify_machine([FixedMulAir()], proof2, binding=b"pre-test",
                          config=CFG, preprocessed_roots=vk)


def test_preprocessed_wrong_vk_root_rejected():
    inst, pre = _instance()
    proof = prove_machine([inst], binding=b"pre-test", config=CFG)
    bad_root = preprocessed_root(inst.air, pre, 5, 5, CFG)
    bad_root = list(bad_root)
    bad_root[0] ^= 1
    with pytest.raises(VerificationError):
        verify_machine([FixedMulAir()], proof, binding=b"pre-test",
                       config=CFG,
                       preprocessed_roots={"FixedMulAir": bad_root})


def test_preprocessed_missing_vk_rejected():
    inst, _pre = _instance()
    proof = prove_machine([inst], binding=b"pre-test", config=CFG)
    with pytest.raises(VerificationError):
        verify_machine([FixedMulAir()], proof, binding=b"pre-test",
                       config=CFG)


def test_preprocessed_substitution_rejected():
    """A prover proving against a DIFFERENT fixed matrix cannot pass the
    honest vk: the openings hash to another root."""
    inst, pre = _instance()
    pre2 = pre.copy()
    pre2[3, 1] += 1
    inst2 = ChipInstance(air=FixedMulAir(), trace=inst.trace.copy(),
                         publics=[], preprocessed=pre2)
    # fix up the trace so the forged matrix still satisfies constraints
    inst2.trace[3, 1] = int(
        (int(pre2[3, 0]) * int(inst2.trace[3, 0]) + int(pre2[3, 1]))
        % 2013265921)
    forged = prove_machine([inst2], binding=b"pre-test", config=CFG)
    vk = {"FixedMulAir": preprocessed_root(inst.air, pre, 5, 5, CFG)}
    with pytest.raises(VerificationError):
        verify_machine([FixedMulAir()], forged, binding=b"pre-test",
                       config=CFG, preprocessed_roots=vk)


def test_preprocessed_constraint_violation_rejected():
    inst, pre = _instance()
    inst.trace[5, 1] ^= 1          # y no longer equals c·x + d
    proof = prove_machine([inst], binding=b"pre-test", config=CFG)
    vk = {"FixedMulAir": preprocessed_root(inst.air, pre, 5, 5, CFG)}
    with pytest.raises(VerificationError):
        verify_machine([FixedMulAir()], proof, binding=b"pre-test",
                       config=CFG, preprocessed_roots=vk)
