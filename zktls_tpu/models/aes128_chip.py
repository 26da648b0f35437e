"""Guest-witness → AES-128 chip bridge: prove/verify the recorded session's
AES-GCM counter-mode keystream blocks (SURVEY.md §3.4 record-decryption
workload)."""

from __future__ import annotations

from ..guest.crypto.gcm import GCMEvent
from ..stark.chips.aes128 import Aes128Air, aes128_trace
from ..stark.config import StarkConfig
from ..stark.proof import StarkProof
from ..stark.prover import prove
from ..stark.verifier import verify

__all__ = ["prove_gcm_events", "verify_aes128_proof", "aes128_air"]

_AIR = Aes128Air()


def aes128_air() -> Aes128Air:
    return _AIR


def prove_gcm_events(events: list[GCMEvent], config: StarkConfig) -> bytes:
    """STARK-prove every AES-128 keystream block (counter encryption) of the
    guest's GCM decryptions; the final block binds as public values."""
    blocks = []
    for ev in events:
        for cb in ev.counter_blocks:
            blocks.append((ev.key, cb))
    trace, public = aes128_trace(blocks)
    return prove(_AIR, trace, public, config).to_bytes()


def verify_aes128_proof(proof_bytes: bytes, config: StarkConfig) -> bool:
    return verify(_AIR, StarkProof.from_bytes(proof_bytes), config)
