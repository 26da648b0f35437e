"""STARK prover adapter: runs the guest, generates chip traces from the
witness events, and proves them as ONE machine proof on the TPU STARK
stack.

The framework analogue of the reference's SP1GuestProver / Risc0GuestProver
(crates/guest-prover-{sp1,r0}): instead of shipping a RISC-V ELF to a zkVM,
the guest replay produces witness event streams (SHA-256 compressions,
AES-GCM decryptions, EC operations) and the machine STARK proves them under
a single journal-bound transcript with cross-chip bus binding
(stark/machine.py, stark/bus.py).

What `verify(journal, proof)` checks (round-2 binding surface):
  * the proof transcript is bound to THIS journal (binding bytes);
  * the SHA-256 chip published the journal's own digest and the journal's
    stream_sha256 field as IV-rooted chained digests — by collision
    resistance the proven preimages ARE the journal and the stream tape;
  * every journal GCM record header (nonce, tag, n_blocks) is consumed by
    the control chip, whose key/H/mask/tag/counter wiring to the AES and
    GHASH chips is bus-enforced;
  * every chip's AIR constraints and the global bus balance hold.

Known gaps (honest scope — round-3 work): ciphertext/plaintext bytes are
not yet bound to the stream commitment (needs the record-parser chip), and
ModMul events are proven but not yet bus-bound to an EC schedule.
"""

from __future__ import annotations

from ..core.types import GuestInput
from ..guest.program import GuestOutput, run_guest
from ..stark.config import DEFAULT_CONFIG, StarkConfig
from ..stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)

__all__ = ["StarkGuestProver", "build_chip_instances",
           "journal_public_messages", "journal_airs"]


def build_chip_instances(out: GuestOutput) -> list[ChipInstance]:
    """The machine chip set for a guest execution."""
    from ..models.aes128_chip import aes128_instance
    from ..models.ghash_chip import gcm_control_instance, ghash_instance
    from ..models.modmul_chip import modmul_instances
    from ..models.sha256_chip import sha256_instance

    chips = [sha256_instance(out.replay.sha256_recorder.events)]
    if out.replay.gcm_events:
        chips.append(aes128_instance(out.replay.gcm_events))
        chips.append(ghash_instance(out.replay.gcm_events))
        chips.append(gcm_control_instance(out.replay.gcm_events))
    if out.modmul_events:
        chips.extend(modmul_instances(out.modmul_events))
    return chips


def _air_registry() -> dict:
    from ..models.aes128_chip import aes128_air
    from ..models.ghash_chip import gcm_control_air, ghash_air
    from ..models.sha256_chip import sha256_air
    from ..stark.chips.modmul import (
        modmul_air_256,
        modmul_air_384,
        modmul_air_rsa,
    )

    return {
        "Sha256Air": sha256_air,
        "Aes128Air": aes128_air,
        "GhashAir": ghash_air,
        "GcmControlAir": gcm_control_air,
        "ModMul256Air": modmul_air_256,
        "ModMul384Air": modmul_air_384,
        "ModMulRsa1024Air": lambda: modmul_air_rsa(1024),
        "ModMulRsa2048Air": lambda: modmul_air_rsa(2048),
        "ModMulRsa4096Air": lambda: modmul_air_rsa(4096),
    }


def journal_airs(journal: bytes, proof: MachineProof) -> list:
    """The chip set to verify a proof of this journal against.  The journal
    pins the REQUIRED chips (SHA-256 and the 256-bit ModMul always — every
    session derives keys, hashes its journal, and recovers the origin
    signer; the GCM triangle whenever the journal carries record headers).
    The optional wider ModMul widths are taken from the proof itself —
    extra valid chips never weaken the statement, unknown names reject."""
    from ..guest.journal import decode_journal

    registry = _air_registry()
    j = decode_journal(journal)
    required = {"Sha256Air", "ModMul256Air"}
    if j["gcm_records"]:
        required |= {"Aes128Air", "GhashAir", "GcmControlAir"}
    names = {cp.name for cp in proof.chips}
    missing = required - names
    if missing:
        from ..stark.verifier import VerificationError

        raise VerificationError(f"proof is missing required chips: "
                                f"{sorted(missing)}")
    airs = []
    for name in names:
        if name not in registry:
            from ..stark.verifier import VerificationError

            raise VerificationError(f"unknown chip in proof: {name!r}")
        airs.append(registry[name]())
    return airs


def journal_public_messages(journal: bytes) -> list[tuple]:
    """The verifier-side bus messages implied by a journal: it RECEIVES
    (mult −1) the SHA-chip's published digests — recomputing the journal
    digest itself, reading stream_sha256 from the journal — and SENDS
    (mult +1) every GCM record header for the control chip to consume."""
    import hashlib

    from ..guest.journal import decode_journal
    from ..stark.bus import (
        BUS_GCM_RECORD,
        BUS_SHA_RESULT,
        RESULT_TAG_JOURNAL,
        RESULT_TAG_STREAM,
        digest_limbs,
        u16_limbs,
    )
    from ..stark.chips.gcm_control import parse_gcm_records

    j = decode_journal(journal)
    msgs: list[tuple] = [
        (BUS_SHA_RESULT,
         [RESULT_TAG_JOURNAL]
         + digest_limbs(hashlib.sha256(journal).digest()), -1),
        (BUS_SHA_RESULT,
         [RESULT_TAG_STREAM] + digest_limbs(j["stream_sha256"]), -1),
    ]
    for rec in parse_gcm_records(j["gcm_records"]):
        msgs.append((BUS_GCM_RECORD,
                     [rec["eid"]] + u16_limbs(rec["nonce"])
                     + u16_limbs(rec["tag"]) + [rec["n_blocks"]], 1))
    return msgs


class StarkGuestProver:
    """ZkProver proving the guest witness as one machine STARK proof."""

    def __init__(self, config: StarkConfig = DEFAULT_CONFIG):
        self.config = config

    def prove(self, guest_input: GuestInput,
              timings: dict | None = None) -> tuple[bytes, bytes]:
        out: GuestOutput = run_guest(guest_input)
        chips = build_chip_instances(out)
        proof = prove_machine(chips, binding=out.journal,
                              config=self.config, timings=timings)
        return out.journal, proof.to_bytes()

    def verify(self, journal: bytes, proof: bytes) -> bool:
        """Raises stark.verifier.VerificationError on failure."""
        mp = MachineProof.from_bytes(proof)
        return verify_machine(
            journal_airs(journal, mp), mp, binding=journal,
            public_messages=journal_public_messages(journal),
            config=self.config)
