"""The shrink layer: a compress-layer recursion proof re-proven under
BN254/MiMC commitments — the proof the Groth16 wrap circuit verifies.

Full chain at small scale: machine proof → compress (Poseidon2 outer)
→ shrink (MiMC outer) → verify_bn, with tamper rejection at each rung.
"""

import pytest

from zktls_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import ChipInstance, prove_machine, \
    verify_machine
from zktls_tpu.stark.machine_bn import MachineProofBN
from zktls_tpu.stark.recursion import (
    MachineShape,
    RecursionVKBN,
    outer_airs,
    recursion_prove,
    recursion_prove_bn,
    recursion_verify_bn,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=2, pow_bits=0,
                  fri_final_size=16)


@pytest.fixture(scope="module")
def chain():
    trace, pub = fibonacci_trace(5)
    airs = [FibonacciAir()]
    inner = prove_machine(
        [ChipInstance(air=airs[0], trace=trace, publics=pub)],
        binding=b"fib-chain", config=CFG)
    vk_a, proof_a = recursion_prove(airs, inner, b"fib-chain",
                                    inner_config=CFG, outer_config=CFG)
    return airs, inner, vk_a, proof_a


def test_shrink_layer_end_to_end(chain):
    airs, inner, vk_a, proof_a = chain
    # the shrink layer verifies the COMPRESS proof: its inner airs are
    # the verifier-VM machine, its inner vk root is the compress program
    # root, and its binding matches the compress outer binding
    a_binding = b"fib-chain" + vk_a.shape.to_bytes()
    from zktls_tpu.stark.recursion import _session_messages

    a_msgs = _session_messages(vk_a.shape, b"fib-chain", [])
    vk_b, proof_b = recursion_prove_bn(
        outer_airs(), proof_a, a_binding,
        public_messages=a_msgs,
        inner_config=CFG, outer_config=CFG,
        inner_preprocessed_roots={"VmAir": list(vk_a.program_root)})
    blob = proof_b.to_bytes()
    proof_b2 = MachineProofBN.from_bytes(blob)
    vk_b2 = RecursionVKBN.from_bytes(vk_b.to_bytes())
    assert recursion_verify_bn(vk_b2, proof_b2, a_binding,
                               public_messages=a_msgs,
                               outer_config=CFG)
    # tampered binding → chain seed/pubs differ → bus imbalance
    with pytest.raises(VerificationError):
        recursion_verify_bn(vk_b2, proof_b2, a_binding[:-1] + b"X",
                            public_messages=a_msgs, outer_config=CFG)
    # forged program root → preprocessed path fails
    bad_vk = RecursionVKBN(
        shape=vk_b.shape, program_root=vk_b.program_root ^ 1,
        inner_preprocessed_roots=vk_b.inner_preprocessed_roots,
        n_instrs=vk_b.n_instrs, n_pubs=vk_b.n_pubs)
    with pytest.raises(VerificationError):
        recursion_verify_bn(bad_vk, proof_b2, a_binding,
                            public_messages=a_msgs, outer_config=CFG)
    # tampered witness → some check fails
    bad = MachineProofBN.from_bytes(blob)
    bad.queries[0].openings[0].trace_row[0] ^= 1
    with pytest.raises(VerificationError):
        recursion_verify_bn(vk_b2, bad, a_binding,
                            public_messages=a_msgs, outer_config=CFG)


def test_shrink_rejects_forged_compress_root(chain):
    """Using a DIFFERENT compress program root as the inner vk makes the
    strict build reject the honest compress proof (its preprocessed
    openings hash to the real root, not the forged one)."""
    airs, inner, vk_a, proof_a = chain
    a_binding = b"fib-chain" + vk_a.shape.to_bytes()
    from zktls_tpu.stark.recursion import _session_messages

    a_msgs = _session_messages(vk_a.shape, b"fib-chain", [])
    bad_root = list(vk_a.program_root)
    bad_root[0] ^= 1
    with pytest.raises(VerificationError):
        recursion_prove_bn(
            outer_airs(), proof_a, a_binding, public_messages=a_msgs,
            inner_config=CFG, outer_config=CFG,
            inner_preprocessed_roots={"VmAir": bad_root})
