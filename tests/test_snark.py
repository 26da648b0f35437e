"""SNARK wrap subsystem: BN254 pairing self-tests, Groth16 soundness on a
small circuit, the journal wrap, and the exported EVM verifier's
precompile-sequence simulation.

(The reference's counterpart: gnark/rapidsnark Groth16 over BN254,
SURVEY.md §2.2.B/C.)  The BN254 implementation has no external oracle in
this environment, so the tests are algebraic: group orders, bilinearity,
pairing-product identities — any curve/twist/Frobenius mistake breaks
them."""

import os

import pytest

from zktls_tpu.snark.bn254 import (
    G1,
    G2,
    R,
    f12_pow,
    fp12_one,
    g1_add,
    g1_mul,
    g1_neg,
    g2_add,
    g2_mul,
    is_on_g1,
    is_on_g2,
    msm_g1,
    pairing,
    pairing_product,
)
from zktls_tpu.snark.groth16 import Groth16Proof, prove, setup, verify
from zktls_tpu.snark.r1cs import R1CS


def test_generators_and_orders():
    assert is_on_g1(G1) and is_on_g2(G2)
    assert g1_mul(G1, R) is None
    assert g2_mul(G2, R) is None
    assert g1_add(G1, g1_neg(G1)) is None


def test_pairing_bilinear_and_nondegenerate():
    e = pairing(G1, G2)
    assert e != fp12_one()
    a, b = 31337, 271828182845
    assert pairing(g1_mul(G1, a), g2_mul(G2, b)) == f12_pow(e, a * b)
    assert pairing(g1_mul(G1, a), G2) == pairing(G1, g2_mul(G2, a))


def test_pairing_product_identity():
    p77 = g1_mul(G1, 77)
    assert pairing_product([(p77, G2), (g1_neg(p77), G2)])
    assert not pairing_product([(p77, G2), (g1_neg(g1_mul(G1, 78)), G2)])


def test_msm_matches_naive():
    import random

    rng = random.Random(5)
    pts = [g1_mul(G1, rng.randrange(1, R)) for _ in range(17)]
    ss = [rng.randrange(R) for _ in range(17)]
    want = None
    for pt, s in zip(pts, ss):
        want = g1_add(want, g1_mul(pt, s))
    assert msm_g1(pts, ss) == want


def _toy_circuit():
    # public p1 = x·y, public p2 = (x+3)²·y
    cs = R1CS()
    x_val, y_val = 1234567890123456789, 98765432109876543210
    p1 = cs.public_input(x_val * y_val % R)
    p2 = cs.public_input((x_val + 3) ** 2 * y_val % R)
    x = cs.witness(x_val)
    y = cs.witness(y_val)
    xy = cs.mul({x: 1}, {y: 1})
    cs.enforce_eq({xy: 1}, {p1: 1})
    x3sq = cs.mul({x: 1, 0: 3}, {x: 1, 0: 3})
    out = cs.mul({x3sq: 1}, {y: 1})
    cs.enforce_eq({out: 1}, {p2: 1})
    assert cs.check()
    return cs


def test_groth16_roundtrip_and_soundness():
    cs = _toy_circuit()
    keys = setup(cs)
    proof = prove(keys, cs)
    pubs = cs.assignment()[1 : cs.n_public + 1]
    assert verify(keys.vk(), pubs, proof)
    assert len(proof.to_bytes()) == 256
    # wrong public input
    assert not verify(keys.vk(), [pubs[0] + 1, pubs[1]], proof)
    # tampered proof point
    bad = Groth16Proof.from_bytes(proof.to_bytes())
    bad.c = g1_add(bad.c, G1)
    assert not verify(keys.vk(), pubs, bad)
    # serialization roundtrip
    assert Groth16Proof.from_bytes(proof.to_bytes()).to_bytes() == \
        proof.to_bytes()


def test_evm_simulation_matches_native_verify(tmp_path):
    from zktls_tpu.verifier_export import (
        export_verifier,
        groth16_contract,
        simulate_evm_verify,
    )

    cs = _toy_circuit()
    keys = setup(cs)
    proof = prove(keys, cs)
    pubs = cs.assignment()[1 : cs.n_public + 1]
    vk = keys.vk()
    assert simulate_evm_verify(vk, pubs, proof.to_bytes())
    assert not simulate_evm_verify(vk, [pubs[0] ^ 1, pubs[1]],
                                   proof.to_bytes())
    # the emitted contract embeds this vk and the public-input count
    sol = groth16_contract(vk)
    assert str(vk["alpha1"][0]) in sol
    assert "uint256[2] calldata" in sol and "staticcall(gas(), 8" in sol
    files = export_verifier("evm", tmp_path, vk=vk)
    assert {f.name for f in files} == {"ZkTlsVerifier.sol",
                                       "Groth16Verifier.sol", "vk.json"}
    files = export_verifier("solana", tmp_path / "sol", vk=vk)
    assert {f.name for f in files} == {"vk.json", "VERIFIER_SPEC.md"}


def test_generated_solidity_mimc_matches_wrap(tmp_path):
    """ADVICE r3: execute the TEMPLATED Solidity mimcHash/journalChunks
    semantics (constants parsed back out of the generated contract text)
    and check the digest equals journal_digest_fr for several journal
    lengths — a transcription bug in the template breaks this."""
    import re

    from zktls_tpu.snark.wrap import journal_digest_fr
    from zktls_tpu.verifier_export import zktls_contract

    sol = zktls_contract()
    rr = int(re.search(r"uint256 constant RR =\s*(\d+);", sol).group(1))
    chunk_bytes = int(re.search(
        r"uint256 constant CHUNK_BYTES = (\d+);", sol).group(1))
    max_chunks = int(re.search(
        r"uint256 constant MAX_CHUNKS = (\d+);", sol).group(1))
    rc = {int(m.group(1)): int(m.group(2))
          for m in re.finditer(r"rc\[(\d+)\] = (\d+);", sol)}
    n_rounds = int(re.search(r"rIdx < (\d+); rIdx\+\+", sol).group(1))
    assert sorted(rc) == list(range(n_rounds))

    def sol_journal_chunks(journal: bytes) -> list[int]:
        # journalChunks as written in the contract
        n = (len(journal) + chunk_bytes - 1) // chunk_bytes
        assert n <= max_chunks - 1, "journal too long"
        chunks = [0] * max_chunks
        for i in range(n):
            start = i * chunk_bytes
            end = min(start + chunk_bytes, len(journal))
            v = 0
            for j in range(start, end):
                v = (v << 8) | journal[j]
            chunks[i] = v
        chunks[max_chunks - 1] = len(journal)
        return chunks

    def sol_mimc_hash(chunks: list[int]) -> int:
        # mimcHash as written in the contract
        h = 0
        for chunk in chunks:
            m = chunk % rr
            x = m
            for r_idx in range(n_rounds):
                t = (x + h + rc[r_idx]) % rr
                t2 = t * t % rr
                t4 = t2 * t2 % rr
                x = t4 * t % rr
            h = (x + h + m) % rr
        return h

    for journal in (b"", b"j", b"x" * 31, b"y" * 32, os.urandom(93),
                    os.urandom(1088), b"z" * ((max_chunks - 1)
                                              * chunk_bytes)):
        assert sol_mimc_hash(sol_journal_chunks(journal)) == \
            journal_digest_fr(journal), len(journal)


def test_bundled_vk_param_gate(tmp_path, monkeypatch):
    """ADVICE r3: the bundled wrap_vk.json is only used when its embedded
    circuit parameters match the live circuit; on mismatch export falls
    back to a fresh wrap_setup()."""
    import zktls_tpu.snark.wrap as wrap_mod
    from zktls_tpu.verifier_export import export_verifier

    # matching params: bundle loads, no setup call
    def boom(*a, **k):
        raise AssertionError("wrap_setup must not run when bundle matches")

    monkeypatch.setattr(wrap_mod, "wrap_setup", boom)
    files = export_verifier("evm", tmp_path)
    assert {f.name for f in files} == {"ZkTlsVerifier.sol",
                                       "Groth16Verifier.sol", "vk.json"}
    import json

    exported = json.loads((tmp_path / "vk.json").read_text())
    assert exported["circuit"] == wrap_mod.wrap_circuit_params()

    # stale bundle: params differ → setup fallback is taken
    monkeypatch.setattr(wrap_mod, "wrap_circuit_params",
                        lambda seed=b"zktls-wrap-v1": {"max_chunks": -1})
    called = {}

    class FakeKeys:
        def vk(self):
            called["setup"] = True
            import zktls_tpu.snark.wrap  # the real bundle's vk shape

            raw = json.loads((tmp_path / "vk.json").read_text())
            return {
                "alpha1": tuple(raw["alpha1"]),
                "beta2": (tuple(raw["beta2"][0]), tuple(raw["beta2"][1])),
                "gamma2": (tuple(raw["gamma2"][0]),
                           tuple(raw["gamma2"][1])),
                "delta2": (tuple(raw["delta2"][0]),
                           tuple(raw["delta2"][1])),
                "ic": [tuple(p) for p in raw["ic"]],
            }

    monkeypatch.setattr(wrap_mod, "wrap_setup", lambda *a, **k: FakeKeys())
    export_verifier("evm", tmp_path / "stale")
    assert called.get("setup")


@pytest.mark.skipif(not os.environ.get("ZKTLS_SLOW_TESTS"),
                    reason="fixed-size wrap setup+prove is minutes of pure "
                           "Python; set ZKTLS_SLOW_TESTS=1")
def test_journal_wrap_end_to_end():
    """One CRS for ALL journals (round-3: fixed MAX_CHUNKS circuit) and
    end-to-end contract composition: ZkTlsVerifier's on-chain MiMC digest
    of the journal feeds Groth16Verifier; a forged journal is rejected."""
    from zktls_tpu.snark.wrap import wrap_prove, wrap_setup, wrap_verify
    from zktls_tpu.verifier_export import simulate_zktls_verify

    keys = wrap_setup()
    journal = b"J" * 93
    digest, proof = wrap_prove(keys, journal)
    assert wrap_verify(keys.vk(), digest, proof)
    assert not wrap_verify(keys.vk(), digest + 1, proof)
    assert simulate_zktls_verify(keys.vk(), journal, proof)
    # same vk verifies a DIFFERENT-length journal (single CRS)
    j2 = b"K" * 400
    d2, p2 = wrap_prove(keys, j2)
    assert simulate_zktls_verify(keys.vk(), j2, p2)
    # forged journal byte → digest changes → pairing check fails
    assert not simulate_zktls_verify(keys.vk(), b"X" + j2[1:], p2)
