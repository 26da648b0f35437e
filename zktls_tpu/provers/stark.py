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


def journal_airs(journal: bytes | list[bytes], proof: MachineProof) -> list:
    """The chip set to verify a proof of this journal (or, for batches,
    list of journals) against.  EVERY journal pins REQUIRED chips (SHA-256
    and the 256-bit ModMul always — every session derives keys, hashes its
    journal, and recovers the origin signer; the GCM triangle whenever the
    journal carries record headers); a batch's requirement is the union, so
    a GCM-less first journal cannot under-require chips for GCM sessions
    later in the batch.  The optional wider ModMul widths are taken from
    the proof itself — extra valid chips never weaken the statement,
    unknown names reject."""
    from ..guest.journal import decode_journal

    registry = _air_registry()
    journals = [journal] if isinstance(journal, (bytes, bytearray)) \
        else list(journal)
    required = {"Sha256Air", "ModMul256Air"}
    for jb in journals:
        j = decode_journal(jb)
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


def merge_guest_outputs(outs: list[GuestOutput]) -> GuestOutput:
    """Merge several sessions' witnesses into one chip workload (the
    BASELINE.json multi-transcript batch configs): SHA hash-object ids get
    per-session offsets so chains stay disjoint; GCM events concatenate in
    session order (their event ids are the global enumeration, which the
    batch verifier mirrors when deriving record-header messages from the
    journals); ModMul events concatenate."""
    import copy as _copy

    from ..guest.crypto.sha256 import SHA256Recorder

    if len(outs) == 1:
        return outs[0]
    merged = _copy.copy(outs[0])
    merged.replay = _copy.copy(outs[0].replay)
    rec = SHA256Recorder()
    sha_events = []
    gcm_events = []
    modmul_events = []
    for i, out in enumerate(outs):
        off = (i + 1) << 20
        for e in out.replay.sha256_recorder.events:
            e2 = _copy.copy(e)
            e2.obj = e.obj + off
            sha_events.append(e2)
        gcm_events.extend(out.replay.gcm_events)
        modmul_events.extend(out.modmul_events)
    rec.events = sha_events
    merged.replay.sha256_recorder = rec
    merged.replay.gcm_events = gcm_events
    merged.modmul_events = modmul_events
    return merged


def batch_public_messages(journals: list[bytes]) -> list[tuple]:
    """Verifier-side bus messages for a session batch: per-journal SHA
    results, and GCM record headers with event ids renumbered by the
    global session-order enumeration."""
    from ..guest.journal import decode_journal
    from ..stark.bus import BUS_GCM_RECORD, u16_limbs
    from ..stark.chips.gcm_control import parse_gcm_records

    msgs: list[tuple] = []
    eid_off = 0
    for journal in journals:
        for tag, payload, mult in journal_public_messages(journal):
            if tag == BUS_GCM_RECORD:
                continue
            msgs.append((tag, payload, mult))
        j = decode_journal(journal)
        for rec in parse_gcm_records(j["gcm_records"]):
            msgs.append((BUS_GCM_RECORD,
                         [eid_off + rec["eid"]] + u16_limbs(rec["nonce"])
                         + u16_limbs(rec["tag"]) + [rec["n_blocks"]], 1))
        eid_off += len(j["gcm_records"]) // 32
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

    # -- multi-transcript batching (BASELINE.json configs 4-5) -----------

    def prove_batch(self, guest_inputs: list[GuestInput],
                    timings: dict | None = None
                    ) -> tuple[list[bytes], bytes]:
        """Prove several sessions as ONE machine proof (segment batching:
        the round-1 per-session axis becomes stacked trace rows).  Returns
        (journals, proof); the proof binds the concatenation of all
        journals."""
        outs = [run_guest(gi) for gi in guest_inputs]
        merged = merge_guest_outputs(outs)
        chips = build_chip_instances(merged)
        binding = b"".join(out.journal for out in outs)
        proof = prove_machine(chips, binding=binding, config=self.config,
                              timings=timings)
        return [out.journal for out in outs], proof.to_bytes()

    def verify_batch(self, journals: list[bytes], proof: bytes) -> bool:
        mp = MachineProof.from_bytes(proof)
        return verify_machine(
            journal_airs(journals, mp), mp,
            binding=b"".join(journals),
            public_messages=batch_public_messages(journals),
            config=self.config)
