"""Recursion prototype: a machine proof verified INSIDE a machine proof
(VmAir + sponge chips), end to end at small scale — the compress rung of
VERDICT r3 item #1."""

import pytest

from zktls_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.recursion import (
    MachineShape,
    build_program,
    outer_airs,
    recursion_prove,
    recursion_verify,
)
from zktls_tpu.stark.verifier import VerificationError

INNER_CFG = StarkConfig(log_blowup=2, num_queries=4, pow_bits=0,
                        fri_final_size=16)
OUTER_CFG = StarkConfig(log_blowup=2, num_queries=4, pow_bits=0,
                        fri_final_size=16)


@pytest.fixture(scope="module")
def inner():
    trace, pub = fibonacci_trace(5)
    airs = [FibonacciAir()]
    proof = prove_machine(
        [ChipInstance(air=airs[0], trace=trace, publics=pub)],
        binding=b"fib-recursion", config=INNER_CFG)
    assert verify_machine(airs, proof, binding=b"fib-recursion",
                          config=INNER_CFG)
    return airs, proof


def test_program_builds_and_interprets(inner):
    airs, proof = inner
    prog = build_program(airs, MachineShape.of(proof), b"fib-recursion",
                         [], INNER_CFG, proof=proof)
    assert len(prog.instrs) > 100
    # verifier-side rebuild (no proof values) yields the IDENTICAL
    # instruction stream — the program is a pure function of the shape
    prog2 = build_program(airs, MachineShape.of(proof), b"fib-recursion",
                          [], INNER_CFG, proof=None)
    assert len(prog.instrs) == len(prog2.instrs)
    from zktls_tpu.stark.chips.vm import instr_payload

    for pc, (i1, i2) in enumerate(zip(prog.instrs, prog2.instrs)):
        assert instr_payload(pc, i1) == instr_payload(pc, i2), pc
    assert prog.chain_seeds == prog2.chain_seeds


def test_recursion_end_to_end(inner):
    airs, proof = inner
    vk, outer = recursion_prove(airs, proof, b"fib-recursion",
                                inner_config=INNER_CFG,
                                outer_config=OUTER_CFG)
    # serialization roundtrips: outer proof AND verifying key
    outer2 = MachineProof.from_bytes(outer.to_bytes())
    from zktls_tpu.stark.recursion import RecursionVK

    vk2 = RecursionVK.from_bytes(vk.to_bytes())
    # FAST path: verify against the vk — the program is never rebuilt
    assert recursion_verify(airs, vk2, outer2, b"fib-recursion",
                            inner_config=INNER_CFG,
                            outer_config=OUTER_CFG)
    # setup path: bare shape — rebuilds the program, derives the same vk
    assert recursion_verify(airs, vk.shape, outer2, b"fib-recursion",
                            inner_config=INNER_CFG,
                            outer_config=OUTER_CFG)
    # a different binding must fail (chain seed + pub values differ →
    # bus imbalance against the proven transcript)
    with pytest.raises(VerificationError):
        recursion_verify(airs, vk2, outer2, b"fib-recursioX",
                         inner_config=INNER_CFG, outer_config=OUTER_CFG)
    # a forged program cannot pass: a tampered vk root breaks the
    # preprocessed Merkle openings
    bad_vk = RecursionVK(shape=vk.shape,
                         program_root=tuple(
                             [vk.program_root[0] ^ 1,
                              *vk.program_root[1:]]),
                         n_instrs=vk.n_instrs, n_pubs=vk.n_pubs)
    with pytest.raises(VerificationError):
        recursion_verify(airs, bad_vk, outer2, b"fib-recursion",
                         inner_config=INNER_CFG, outer_config=OUTER_CFG)


def test_tampered_inner_proof_rejected(inner):
    """The program builder (= the prover's own witness generation) must
    refuse an invalid inner proof: flipping a trace-root limb breaks the
    Merkle equality asserts."""
    airs, proof = inner
    bad = MachineProof.from_bytes(proof.to_bytes())
    bad.chips[0].trace_root = list(bad.chips[0].trace_root)
    bad.chips[0].trace_root[0] ^= 1
    with pytest.raises(VerificationError):
        build_program(airs, MachineShape.of(bad), b"fib-recursion", [],
                      INNER_CFG, proof=bad)


def test_recursion_multichip_inner(inner):
    """Generality beyond the toy: the recursion program verifies a REAL
    multi-chip inner machine (stream parser + GCM data + xor table, with
    LogUp buses, perm traces, periodic columns and public messages)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_gcm_data import AIRS, CFG, _setup

    chips, msgs = _setup()
    inner_proof = prove_machine(chips, binding=b"gcmdata", config=CFG)
    assert verify_machine(AIRS, inner_proof, binding=b"gcmdata",
                          public_messages=msgs, config=CFG)
    prog = build_program(AIRS, MachineShape.of(inner_proof), b"gcmdata",
                         msgs, CFG, proof=inner_proof)
    # every verifier assert held on the real proof (strict mode)
    assert len(prog.instrs) > 10_000
    # the shape-only rebuild matches
    prog2 = build_program(AIRS, MachineShape.of(inner_proof), b"gcmdata",
                          msgs, CFG, proof=None)
    assert len(prog.instrs) == len(prog2.instrs)
    # a tampered bus message changes the program's constants, and the
    # real proof no longer satisfies it
    bad = [(t, list(p), m) for t, p, m in msgs]
    for ent in bad:
        if ent[0] == 0x113:  # BUS_FILTERED
            ent[1][2] ^= 1
            break
    with pytest.raises(VerificationError):
        build_program(AIRS, MachineShape.of(inner_proof), b"gcmdata",
                      bad, CFG, proof=inner_proof)


def test_forged_witness_rejected_by_outer_verifier(inner):
    """A malicious prover cannot fake the recursion witness: mutating a
    VM witness value after program build breaks either a sponge chain, a
    dataflow message, or a field equation — the outer proof fails."""
    import numpy as np

    from zktls_tpu.stark.chips.vm import LAYOUT as VL, vm_trace
    from zktls_tpu.stark.recursion import (
        _outer_chips,
        _session_messages,
        _vk_from_prog,
    )

    airs, proof = inner
    shape = MachineShape.of(proof)
    prog = build_program(airs, shape, b"fib-recursion",
                         [], INNER_CFG, proof=proof)
    chips = _outer_chips(prog)
    # flip a witness value limb in the VM trace (a wit-op output)
    vtrace = chips[0].trace.copy()
    wit_rows = [i for i in range(len(prog.instrs))
                if prog.instrs[i].op == "wit"]
    row = wit_rows[0]
    vtrace[row, VL["o1"].start] ^= 1
    chips[0] = ChipInstance(air=chips[0].air, trace=vtrace, publics=[],
                            preprocessed=chips[0].preprocessed)
    outer_binding = b"fib-recursion" + shape.to_bytes()
    bad_outer = prove_machine(chips, binding=outer_binding,
                              config=OUTER_CFG)
    vk = _vk_from_prog(prog, shape, OUTER_CFG)
    with pytest.raises(VerificationError):
        verify_machine(
            outer_airs(), bad_outer, binding=outer_binding,
            public_messages=_session_messages(shape, b"fib-recursion",
                                              []),
            config=OUTER_CFG,
            preprocessed_roots={"VmAir": list(vk.program_root)})


def test_trusted_vk_cache(inner, tmp_path):
    """The verifier derives the program root itself and caches it — a
    prover-supplied root is never trusted.  Second lookup hits the disk
    cache; a cache entry for a different shape is ignored."""
    from zktls_tpu.stark.recursion import recursion_vk, trusted_vk

    airs, proof = inner
    shape = MachineShape.of(proof)
    vk1 = trusted_vk(airs, shape, b"fib-recursion", [],
                     inner_config=INNER_CFG, outer_config=OUTER_CFG,
                     cache_dir=str(tmp_path))
    files = list(tmp_path.glob("rvk-*.bin"))
    assert len(files) == 1
    direct = recursion_vk(airs, shape, b"fib-recursion", [],
                          inner_config=INNER_CFG, outer_config=OUTER_CFG)
    assert vk1.program_root == direct.program_root
    # cache hit: corrupting the stored bytes for a DIFFERENT shape check
    vk2 = trusted_vk(airs, shape, b"fib-recursion", [],
                     inner_config=INNER_CFG, outer_config=OUTER_CFG,
                     cache_dir=str(tmp_path))
    assert vk2 == vk1
    # corrupt entry → rebuilt, not trusted
    files[0].write_bytes(b"garbage")
    vk3 = trusted_vk(airs, shape, b"fib-recursion", [],
                     inner_config=INNER_CFG, outer_config=OUTER_CFG,
                     cache_dir=str(tmp_path))
    assert vk3.program_root == vk1.program_root


@pytest.mark.skipif(not __import__("os").environ.get("ZKTLS_SLOW_TESTS"),
                    reason="full-scale program build is ~4 min + ~6 GB; "
                           "set ZKTLS_SLOW_TESTS=1")
def test_full_zktls_program_builds():
    """The recursion compiler handles the COMPLETE 10-chip zkTLS machine
    proof: building the program in strict mode re-verifies the proof
    instruction-by-instruction (measured r4: 10.1M instructions, 37k w16
    + 44k w24 sponge permutations, ~250 s build)."""
    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.program import run_guest
    from zktls_tpu.provers.stark import (
        build_chip_instances,
        journal_airs,
        journal_public_messages,
    )
    from tests.conftest import FIXTURE_CBOR

    gi = LegacyGuestInput.from_cbor(
        FIXTURE_CBOR.read_bytes()).to_guest_input()
    cfg = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                      fri_final_size=64)
    out = run_guest(gi)
    proof = prove_machine(build_chip_instances(out), binding=out.journal,
                          config=cfg)
    airs = journal_airs(out.journal, proof)
    msgs = journal_public_messages(out.journal)
    prog = build_program(airs, MachineShape.of(proof), out.journal, msgs,
                         cfg, proof=proof)
    assert len(prog.instrs) > 1_000_000
