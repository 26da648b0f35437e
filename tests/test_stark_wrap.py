"""The Groth16 wrap circuit: R1CS arithmetization of the BN-committed
machine verifier (snark/stark_wrap.py).  Fast tests build the circuit
over a small BN machine proof; the Groth16 end-to-end and the full
machine→compress→shrink→Groth16 chain are gated (minutes of pure-Python
pairing/MSM work)."""

import os

import pytest

from zktls_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import ChipInstance
from zktls_tpu.stark.machine_bn import prove_machine_bn, verify_machine_bn
from zktls_tpu.snark.stark_wrap import (
    build_stark_wrap_circuit,
    statement_digest_fr,
)

CFG = StarkConfig(log_blowup=2, num_queries=2, pow_bits=2,
                  fri_final_size=16)


@pytest.fixture(scope="module")
def bn_proof():
    trace, pub = fibonacci_trace(5)
    airs = [FibonacciAir()]
    proof = prove_machine_bn(
        [ChipInstance(air=airs[0], trace=trace, publics=pub)],
        binding=b"fib-wrap", config=CFG)
    assert verify_machine_bn(airs, proof, binding=b"fib-wrap", config=CFG)
    return airs, proof


def test_wrap_circuit_satisfiable(bn_proof):
    airs, proof = bn_proof
    cs = build_stark_wrap_circuit(airs, proof, b"fib-wrap", [], CFG, {})
    assert cs.check()
    assert cs.n_public == 1
    # the public input IS the statement digest
    assert cs.assignment()[1] == statement_digest_fr(b"fib-wrap", [], {})


def test_wrap_circuit_rejects_tampered_assignment(bn_proof):
    """Constraint-level soundness probe: flipping any witness value of a
    satisfying assignment must violate some constraint (the builder's
    witness asserts are prover-side conveniences, not the soundness
    argument)."""
    airs, proof = bn_proof
    cs = build_stark_wrap_circuit(airs, proof, b"fib-wrap", [], CFG, {})
    import random

    rng = random.Random(7)
    for _ in range(5):
        idx = rng.randrange(2, cs.n_vars)
        old = cs._assignment[idx]
        cs._assignment[idx] = (old + 1) % (2**61)
        assert not cs.check(), f"tampered wire {idx} still satisfies"
        cs._assignment[idx] = old


def test_wrap_circuit_rejects_tampered_proof(bn_proof):
    """The builder re-runs the verifier over the witness: a tampered
    proof fails its asserts (an adversary without a valid proof cannot
    produce a satisfying assignment)."""
    from zktls_tpu.stark.machine_bn import MachineProofBN

    airs, proof = bn_proof
    bad = MachineProofBN.from_bytes(proof.to_bytes())
    bad.queries[0].openings[0].trace_row[0] ^= 1
    with pytest.raises(AssertionError):
        build_stark_wrap_circuit(airs, bad, b"fib-wrap", [], CFG, {})


@pytest.mark.skipif(not os.environ.get("ZKTLS_SLOW_TESTS"),
                    reason="pure-Python Groth16 at ~140k constraints is "
                           "minutes; set ZKTLS_SLOW_TESTS=1")
def test_wrap_groth16_end_to_end(bn_proof):
    from zktls_tpu.snark.groth16 import prove, setup, verify

    airs, proof = bn_proof
    cs = build_stark_wrap_circuit(airs, proof, b"fib-wrap", [], CFG, {})
    keys = setup(cs, seed=b"wrap-test")
    pf = prove(keys, cs)
    stmt = statement_digest_fr(b"fib-wrap", [], {})
    assert verify(keys.vk(), [stmt], pf)
    assert not verify(keys.vk(), [stmt ^ 1], pf)


@pytest.mark.skipif(not os.environ.get("ZKTLS_SLOW_TESTS"),
                    reason="full chain is ~30 min on CPU; "
                           "set ZKTLS_SLOW_TESTS=1")
def test_full_chain_machine_compress_shrink_wrap():
    """machine → compress → shrink → wrap circuit, all four rungs."""
    from zktls_tpu.stark.machine import prove_machine
    from zktls_tpu.stark.recursion import (
        _session_messages,
        outer_airs,
        recursion_prove,
        recursion_prove_bn,
    )

    cfg = StarkConfig(log_blowup=2, num_queries=2, pow_bits=0,
                      fri_final_size=16)
    trace, pub = fibonacci_trace(5)
    airs = [FibonacciAir()]
    inner = prove_machine(
        [ChipInstance(air=airs[0], trace=trace, publics=pub)],
        binding=b"chain", config=cfg)
    vk_a, proof_a = recursion_prove(airs, inner, b"chain",
                                    inner_config=cfg, outer_config=cfg)
    a_binding = b"chain" + vk_a.shape.to_bytes()
    a_msgs = _session_messages(vk_a.shape, b"chain", [])
    vk_b, proof_b = recursion_prove_bn(
        outer_airs(), proof_a, a_binding, public_messages=a_msgs,
        inner_config=cfg, outer_config=cfg,
        inner_preprocessed_roots={"VmAir": list(vk_a.program_root)})
    b_msgs = _session_messages(
        vk_b.shape, a_binding, a_msgs,
        dict((n, list(r)) for n, r in vk_b.inner_preprocessed_roots))
    b_binding = a_binding + vk_b.shape.to_bytes()
    cs = build_stark_wrap_circuit(
        outer_airs(), proof_b, b_binding, b_msgs, cfg,
        {"VmAir": vk_b.program_root})
    assert cs.check()
