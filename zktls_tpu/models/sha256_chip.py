"""Guest-witness → SHA-256 chip bridge: prove/verify the recorded session's
SHA-256 compressions (the transcript-hash workload of SURVEY.md §3.4)."""

from __future__ import annotations

from ..guest.crypto.sha256 import CompressionEvent
from ..stark.chips.sha256 import Sha256Air, sha256_trace
from ..stark.config import StarkConfig
from ..stark.proof import StarkProof
from ..stark.prover import prove
from ..stark.verifier import verify

__all__ = ["prove_sha256_events", "verify_sha256_proof", "sha256_air"]

_AIR = Sha256Air()


def sha256_air() -> Sha256Air:
    return _AIR


def prove_sha256_events(events: list[CompressionEvent],
                        config: StarkConfig) -> bytes:
    """STARK-prove every SHA-256 compression the guest performed.  The final
    event's digest is bound as the proof's public values."""
    comps = [(e.block, e.state_in) for e in events]
    trace, public = sha256_trace(comps)
    return prove(_AIR, trace, public, config).to_bytes()


def verify_sha256_proof(proof_bytes: bytes, config: StarkConfig) -> bool:
    proof = StarkProof.from_bytes(proof_bytes)
    return verify(_AIR, proof, config)
