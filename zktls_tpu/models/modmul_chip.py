"""Guest-witness → ModMul chip bridge: prove/verify the recorded modular
multiplications of every EC operation in the session — ECDHE shared-secret
derivation, ECDSA certificate / ServerKeyExchange / origin-signature
checks (the reference's bigint/EC precompile workload, SURVEY.md §2.2.B
`sp1-curves`; §3.4 "ECDHE scalar-mult", "secp256k1 signature")."""

from __future__ import annotations

from ..stark.chips.modmul import MODULI_256, ModMul256Air, modmul_trace
from ..stark.config import StarkConfig
from ..stark.proof import StarkProof
from ..stark.prover import prove
from ..stark.verifier import verify

__all__ = ["prove_modmul_events", "verify_modmul_proof", "modmul_air"]

_AIR = ModMul256Air()


def modmul_air() -> ModMul256Air:
    return _AIR


def prove_modmul_events(events, config: StarkConfig) -> bytes:
    """STARK-prove every recorded 256-bit modular multiplication.  The
    final event's product binds as public values (for the fixture session
    that is the last product of the secp256k1 origin recovery).

    Events whose modulus falls outside this chip's 256-bit set (e.g. the
    P-384 field of a P-384 certificate signature) are proven by the wider
    width-class chips at the machine level; this per-chip entry point
    proves the covered subset and logs what it skipped rather than failing
    the whole session."""
    import logging

    covered = [ev for ev in events if ev.m in set(MODULI_256)]
    if len(covered) != len(events):
        extra = {hex(ev.m) for ev in events if ev.m not in set(MODULI_256)}
        logging.getLogger(__name__).warning(
            "modmul chip: %d/%d events use moduli outside the 256-bit set "
            "(%s) — proven by the wider width-class chips",
            len(events) - len(covered), len(events), sorted(extra))
    trace, public = modmul_trace(covered)
    return prove(_AIR, trace, public, config).to_bytes()


def verify_modmul_proof(proof_bytes: bytes, config: StarkConfig) -> bool:
    return verify(_AIR, StarkProof.from_bytes(proof_bytes), config)
