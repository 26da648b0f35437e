"""STARK prover adapter: runs the guest, generates chip traces from the
witness events, and proves them on the TPU STARK stack.

The framework analogue of the reference's SP1GuestProver / Risc0GuestProver
(crates/guest-prover-{sp1,r0}): instead of shipping a RISC-V ELF to a zkVM,
the guest replay produces witness event streams (SHA-256 compressions,
AES-GCM decryptions, EC operations) and each chip family proves its stream.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.types import GuestInput
from ..guest.program import GuestOutput, run_guest
from ..stark.config import DEFAULT_CONFIG, StarkConfig

__all__ = ["StarkGuestProver", "BundleProof"]


@dataclass
class BundleProof:
    """A bundle of chip proofs covering the guest execution (serialized as
    length-prefixed concatenation of per-chip STARK proofs)."""

    chip_proofs: dict[str, bytes]

    def to_bytes(self) -> bytes:
        from ..core import cbor

        return cbor.dumps({k: v for k, v in sorted(self.chip_proofs.items())})

    @classmethod
    def from_bytes(cls, data: bytes) -> "BundleProof":
        from ..core import cbor

        return cls(chip_proofs=dict(cbor.loads(data)))


class StarkGuestProver:
    """ZkProver proving the guest witness with the available chip set."""

    def __init__(self, config: StarkConfig = DEFAULT_CONFIG):
        self.config = config

    def prove(self, guest_input: GuestInput) -> tuple[bytes, bytes]:
        out: GuestOutput = run_guest(guest_input)
        chip_proofs: dict[str, bytes] = {}

        from ..models.aes128_chip import prove_gcm_events
        from ..models.ghash_chip import prove_ghash_events
        from ..models.modmul_chip import prove_modmul_events
        from ..models.sha256_chip import prove_sha256_events

        chip_proofs["sha256"] = prove_sha256_events(
            out.replay.sha256_recorder.events, self.config
        )
        if out.replay.gcm_events:
            chip_proofs["aes128"] = prove_gcm_events(
                out.replay.gcm_events, self.config
            )
            chip_proofs["ghash"] = prove_ghash_events(
                out.replay.gcm_events, self.config
            )
        if out.modmul_events:
            chip_proofs["modmul"] = prove_modmul_events(
                out.modmul_events, self.config
            )

        return out.journal, BundleProof(chip_proofs).to_bytes()

    def verify(self, journal: bytes, proof: bytes) -> bool:
        from ..models.aes128_chip import verify_aes128_proof
        from ..models.ghash_chip import verify_ghash_proof
        from ..models.modmul_chip import verify_modmul_proof
        from ..models.sha256_chip import verify_sha256_proof

        bundle = BundleProof.from_bytes(proof)
        ok = verify_sha256_proof(bundle.chip_proofs["sha256"], self.config)
        if "aes128" in bundle.chip_proofs:
            ok = ok and verify_aes128_proof(
                bundle.chip_proofs["aes128"], self.config)
        if "ghash" in bundle.chip_proofs:
            ok = ok and verify_ghash_proof(
                bundle.chip_proofs["ghash"], self.config)
        if "modmul" in bundle.chip_proofs:
            ok = ok and verify_modmul_proof(
                bundle.chip_proofs["modmul"], self.config)
        return ok
