"""Guest-witness → GHASH chip bridge: prove/verify the GF(2^128)
authentication-tag polynomial of the recorded session's AES-GCM record
decryptions (SURVEY.md §3.4; complements the AES-128 keystream chip —
together they cover the full AES-GCM record-protection workload)."""

from __future__ import annotations

from ..guest.crypto.gcm import GCMEvent
from ..stark.chips.ghash import GhashAir, gcm_event_ghash, ghash_trace
from ..stark.config import StarkConfig
from ..stark.proof import StarkProof
from ..stark.prover import prove
from ..stark.verifier import verify

__all__ = ["prove_ghash_events", "verify_ghash_proof", "ghash_air"]

_AIR = GhashAir()


def ghash_air() -> GhashAir:
    return _AIR


def prove_ghash_events(events: list[GCMEvent], config: StarkConfig) -> bytes:
    """STARK-prove the GHASH computation of every recorded GCM decryption;
    the final event's S = GHASH(h, AAD ‖ CT ‖ len) binds as public values
    (tag = S ⊕ E_K(J0), with E_K(J0) proven by the AES-128 chip)."""
    ghash_events = [gcm_event_ghash(ev) for ev in events]
    trace, public = ghash_trace(ghash_events)
    return prove(_AIR, trace, public, config).to_bytes()


def verify_ghash_proof(proof_bytes: bytes, config: StarkConfig) -> bool:
    return verify(_AIR, StarkProof.from_bytes(proof_bytes), config)
