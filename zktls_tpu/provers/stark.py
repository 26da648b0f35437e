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

Round-5 composition (the handshake-algebra chain): the ModMul chips
publish every proven mulmod on BUS_MODMUL; the EC schedule chip composes
them into the ECDHE d·G / d·S dual ladder (d·G generator-pinned); the
key-schedule chip consumes the d·S result as the premaster and proves the
TLS 1.2 PRF chain premaster → master → key block via atomic SHA hop
statements; the GCM control chip's TLS 1.2 AES-128 header rows
mandatorily consume the derived session key + record-nonce salt
(BUS_SESSION_KEY).  Remaining gaps (honest scope): binding the server
key-exchange point S and the client public to the handshake transcript
bytes (transcript-locator chip), x25519's Montgomery ladder (those
sessions use a free-premaster key-schedule intake), SHA-384-suite and
TLS 1.3 HKDF key schedules, and the certificate signature algebra.
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


def _filtered_multiplicities(journal: bytes, obj: int = 1) -> list[tuple]:
    """(obj, pos, count) multiplicities of the verifier's filtered-byte
    sends implied by a journal's filtered ranges."""
    from ..guest.journal import decode_journal

    j = decode_journal(journal)
    counts: dict[tuple, int] = {}
    for begin, length in zip(j["filtered_begins"], j["filtered_lengths"]):
        for k in range(length):
            key = (obj, begin + k)
            counts[key] = counts.get(key, 0) + 1
    return [(o, pos, cnt) for (o, pos), cnt in counts.items()]


def _derive_ks_sessions(out: GuestOutput, obj: int = 1,
                        ec_rid: int | None = 2,
                        sid_base: int = 0x1000) -> list:
    """Key-schedule witness for a session, when its suite is covered
    (TLS 1.2, AES-128-GCM → SHA-256 PRF).  The GCM control chip's header
    rows consume BUS_SESSION_KEY mandatorily for exactly these records,
    so eligibility here must match the chip's g_kr gate."""
    from ..stark.chips.ec import EC_CURVES
    from ..stark.chips.keyschedule import KsSession

    rep = out.replay
    suite = rep.cipher_suite
    if (rep.version != 0x0303 or getattr(suite, "aead", "") != "aes-gcm"
            or getattr(suite, "key_len", 0) != 16):
        return []
    n_client = sum(1 for m in (out.gcm_metas or [])
                   if getattr(m, "dir", "c") == "c")
    n_server = len(out.gcm_metas or []) - n_client
    kw = dict(n_client_records=n_client, n_server_records=n_server,
              obj=obj, sid_base=sid_base)
    ecd = getattr(rep, "ecdhe_weierstrass", None)
    if ecd is not None and ecd[0] in EC_CURVES and ec_rid is not None:
        curve, scalar, spoint = ecd
        pt = curve.mul(scalar, spoint)
        kw.update(ec_rid=ec_rid,
                  ec_nbits=(scalar % curve.n).bit_length(), ec_point=pt)
    # else: free-premaster intake (x25519 / P-384 — documented gap)
    return [KsSession(rep.premaster_secret, rep.master_secret,
                      b"extended master secret" + rep.session_hash,
                      b"key expansion" + rep.server_random
                      + rep.client_random, **kw)]


def build_chip_instances(out: GuestOutput) -> list[ChipInstance]:
    """The machine chip set for a guest execution."""
    from ..models.aes128_chip import aes_instances
    from ..models.ghash_chip import gcm_control_instance, ghash_instance
    from ..models.modmul_chip import modmul_instances
    from ..models.sha256_chip import sha256_instance
    from ..stark.chips.gcm_data import GcmDataAir, gcm_data_trace
    from ..stark.chips.keyschedule import (
        KeyScheduleAir,
        keyschedule_trace,
    )
    from ..stark.chips.stream_parser import (
        StreamParserAir,
        parser_sessions_from_replay,
        parser_trace,
    )
    from ..stark.chips.xor_table import (
        XorTableAir,
        xor_table_trace,
        xor_use_counts,
    )

    # key-schedule witness first: its SHA-hop and xor-table consumption
    # feeds the other chips' multiplicities
    ks_sessions = getattr(out, "ks_sessions", None)
    if ks_sessions is None:
        ks_sessions = _derive_ks_sessions(out)
    ks_trace = None
    hop_counts: dict = {}
    ks_xor_pairs: list = []
    if ks_sessions:
        ks_trace, hop_counts, ks_xor_pairs = keyschedule_trace(ks_sessions)

    chips = [sha256_instance(out.replay.sha256_recorder.events,
                             hop_counts=hop_counts)]
    rec512 = getattr(out.replay, "sha512_recorder", None)
    if rec512 is not None and rec512.events:
        # SHA-384 suites: transcript/PRF/HKDF compressions on the SHA-512
        # chip (IV-rooted chains; composition into the key schedule is
        # the round-5 EC/KDF binding track)
        from ..stark.chips.sha512 import Sha512Air, sha512_trace

        trace512, p512 = sha512_trace(rec512.events)
        chips.append(ChipInstance(air=Sha512Air(), trace=trace512,
                                  publics=p512))
    if out.replay.gcm_events:
        events = out.replay.gcm_events
        chips.extend(aes_instances(events))
        chips.append(ghash_instance(events))
        chips.append(gcm_control_instance(events, metas=out.gcm_metas,
                                          v13=out.v13))
        # stream binding chips (round 3): parser locates every record in
        # the committed tape; the data chip xors plaintext and matches the
        # journal's filtered ranges; the xor table serves the nibble xors
        sessions = getattr(out, "parser_sessions", None)
        if sessions is None:
            sessions = [parser_sessions_from_replay(
                out.stream, events, out.v13, obj=1)]
        ptrace, _ = parser_trace(sessions)
        chips.append(ChipInstance(air=StreamParserAir(), trace=ptrace,
                                  publics=[]))
        filtered = getattr(out, "filtered_mults", None)
        if filtered is None:
            filtered = _filtered_multiplicities(out.journal, obj=1)
        dtrace, _, xor_pairs = gcm_data_trace(
            out.gcm_metas, events, filtered=filtered)
        chips.append(ChipInstance(air=GcmDataAir(), trace=dtrace,
                                  publics=[]))
        xtrace, _ = xor_table_trace(
            xor_use_counts(list(xor_pairs) + ks_xor_pairs))
        chips.append(ChipInstance(air=XorTableAir(), trace=xtrace,
                                  publics=[]))
        # keccak chip: the journal's request/response hashes over the
        # bus-bound application-stream bytes
        from ..stark.chips.keccak import KeccakAir, keccak_trace

        streams = getattr(out, "keccak_streams", None)
        if streams is None:
            streams = [(1, 0, out.replay.request_plaintext),
                       (1, 1, out.replay.response_plaintext)]
        ktrace, _ = keccak_trace(streams)
        chips.append(ChipInstance(air=KeccakAir(), trace=ktrace,
                                  publics=[]))
    chacha_events = getattr(out.replay, "chacha_events", None)
    cc_sends: dict = {}
    if chacha_events:
        # ChaCha suites: every keystream block (incl. the Poly1305
        # one-time-key block) proven by the ChaCha20 chip.  TLS 1.3
        # sessions (0x1303) get FULL record binding: the control chip
        # consumes the journal record headers, the parser locates every
        # record in the committed tape, the data chip xors plaintext,
        # and the Poly1305 tag chain (recorded mulmods over 2^130−5 on
        # the ModMul chip) is composed into the in-circuit tag check.
        # 0xCCA8 (TLS 1.2) keystream algebra proves unbound until the
        # parser's nonce-less 1.2 walk lands (documented gap).
        from ..stark.chips.chacha import (
            ChaCha20Air,
            chacha_event_blocks,
            chacha_trace,
        )
        from ..stark.chips.chacha_control import (
            ChaChaControlAir,
            chacha_control_trace,
        )
        from ..stark.chips.gcm_data import ChaChaDataAir

        consumed: dict = {}
        bind_cha = bool(out.gcm_metas) and not out.replay.gcm_events
        if bind_cha:
            ctl_trace, _, cc_sends, consumed = chacha_control_trace(
                chacha_events, out.gcm_metas)
            chips.append(ChipInstance(air=ChaChaControlAir(),
                                      trace=ctl_trace, publics=[]))
            sessions = getattr(out, "parser_sessions", None)
            if sessions is None:
                sessions = [parser_sessions_from_replay(
                    out.stream, chacha_events, out.v13, obj=1)]
            ptrace, _ = parser_trace(sessions)
            chips.append(ChipInstance(air=StreamParserAir(), trace=ptrace,
                                      publics=[]))
            filtered = getattr(out, "filtered_mults", None)
            if filtered is None:
                filtered = _filtered_multiplicities(out.journal, obj=1)
            from ..stark.chips.gcm_data import gcm_data_trace

            dtrace, _, xor_pairs = gcm_data_trace(
                out.gcm_metas, chacha_events, filtered=filtered,
                le_pairs=1)
            chips.append(ChipInstance(air=ChaChaDataAir(), trace=dtrace,
                                      publics=[]))
            xtrace, _ = xor_table_trace(
                xor_use_counts(list(xor_pairs) + ks_xor_pairs))
            chips.append(ChipInstance(air=XorTableAir(), trace=xtrace,
                                      publics=[]))
            from ..stark.chips.keccak import KeccakAir, keccak_trace

            streams = getattr(out, "keccak_streams", None)
            if streams is None:
                streams = [(1, 0, out.replay.request_plaintext),
                           (1, 1, out.replay.response_plaintext)]
            ktrace, _ = keccak_trace(streams)
            chips.append(ChipInstance(air=KeccakAir(), trace=ktrace,
                                      publics=[]))

        ctrace, cpub = chacha_trace(chacha_event_blocks(chacha_events),
                                    consumed=consumed)
        chips.append(ChipInstance(air=ChaCha20Air(), trace=ctrace,
                                  publics=cpub))
    # EC schedule: the ECDHE d·G / d·S dual ladder proven over the
    # recorded mulmod statements (round-5 composition; BUS_MODMUL sends
    # from the ModMul chips feed the ladder's receives).  The d·G lane is
    # generator-pinned in-chip (gb); results are published for the
    # key-schedule composition (premaster consumer 📋) — binding the
    # server point S to the transcript is the documented locator gap.
    from ..stark.chips.ec import (
        EC_CURVES,
        EcScheduleAir,
        LadderJob,
        ec_schedule_trace,
    )

    ec_pairs = getattr(out, "ec_jobs", None)
    if ec_pairs is None:
        ecd = getattr(out.replay, "ecdhe_weierstrass", None)
        ec_pairs = [ecd] if ecd is not None else []
    ks_linked = {s.ec_rid for s in ks_sessions if s.ec_rid is not None}
    jobs = []
    for i, pair in enumerate(ec_pairs):
        curve, scalar, server_point = pair
        if curve not in EC_CURVES:
            continue  # P-384 ladder width class 📋
        rid2 = 2 * i + 2
        jobs.append(LadderJob(curve, scalar, curve.g, server_point,
                              pb1=False, gb1=True,
                              rid1=2 * i + 1, rid2=rid2,
                              mres2=1 if rid2 in ks_linked else 0))
    sends: dict = {}
    if jobs:
        etrace, sends = ec_schedule_trace(jobs)
        chips.append(ChipInstance(air=EcScheduleAir(), trace=etrace,
                                  publics=[]))
    # Poly1305 accumulator statements consumed by the ChaCha control chip
    for key, cnt in cc_sends.items():
        sends[key] = sends.get(key, 0) + cnt
    if ks_trace is not None:
        chips.append(ChipInstance(air=KeyScheduleAir(), trace=ks_trace,
                                  publics=[]))
    if out.modmul_events:
        chips.extend(modmul_instances(out.modmul_events, sends=sends))
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

    from ..stark.chips.gcm_data import ChaChaDataAir, GcmDataAir
    from ..stark.chips.keccak import KeccakAir
    from ..stark.chips.stream_parser import StreamParserAir
    from ..stark.chips.xor_table import XorTableAir

    from ..stark.chips.aes256 import Aes256Air
    from ..stark.chips.chacha import ChaCha20Air
    from ..stark.chips.chacha_control import ChaChaControlAir
    from ..stark.chips.sha512 import Sha512Air

    from ..stark.chips.ec import EcScheduleAir
    from ..stark.chips.keyschedule import KeyScheduleAir

    return {
        "KeccakAir": KeccakAir,
        "ChaCha20Air": ChaCha20Air,
        "ChaChaControlAir": ChaChaControlAir,
        "ChaChaDataAir": ChaChaDataAir,
        "EcScheduleAir": EcScheduleAir,
        "KeyScheduleAir": KeyScheduleAir,
        "Sha256Air": sha256_air,
        "Sha512Air": Sha512Air,
        "Aes128Air": aes128_air,
        "Aes256Air": Aes256Air,
        "GhashAir": ghash_air,
        "GcmControlAir": gcm_control_air,
        "StreamParserAir": StreamParserAir,
        "GcmDataAir": GcmDataAir,
        "XorTableAir": XorTableAir,
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
    from ..stark.chips.gcm_control import parse_gcm_records

    required = {"Sha256Air", "ModMul256Air"}
    need_aes = False
    for jb in journals:
        j = decode_journal(jb)
        if j["gcm_records"]:
            recs = parse_gcm_records(j["gcm_records"])
            if any(r["cha"] for r in recs):
                required |= {"ChaCha20Air", "ChaChaControlAir",
                             "StreamParserAir", "ChaChaDataAir",
                             "XorTableAir", "KeccakAir"}
            if any(not r["cha"] for r in recs):
                required |= {"GhashAir", "GcmControlAir",
                             "StreamParserAir", "GcmDataAir",
                             "XorTableAir", "KeccakAir"}
                need_aes = True
    names = {cp.name for cp in proof.chips}
    missing = required - names
    if need_aes and not ({"Aes128Air", "Aes256Air"} & names):
        missing |= {"Aes128Air|Aes256Air"}
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


def journal_public_messages(journal: bytes, obj: int = 1,
                            eid_off: int = 0) -> list[tuple]:
    """The verifier-side bus messages implied by a journal: it RECEIVES
    (mult −1) the SHA-chip's published digests — recomputing the journal
    digest itself, reading stream_sha256 from the journal — and SENDS
    (mult +1) every GCM record header for the control chip to consume and
    every filtered-response byte for the GCM data chip to match against
    decrypted plaintext.  The stream digest's payload carries the chain's
    expose-blocks flag: GCM journals pin xb = 1, forcing the chain's
    message blocks onto the bus where only the stream-parser chip can
    consume them."""
    import hashlib

    from ..guest.journal import decode_journal
    from ..stark.bus import (
        BUS_FILTERED,
        BUS_GCM_RECORD,
        BUS_SHA_RESULT,
        RESULT_TAG_JOURNAL,
        RESULT_TAG_STREAM,
        digest_limbs,
        u16_limbs,
    )
    from ..stark.chips.gcm_control import parse_gcm_records

    j = decode_journal(journal)
    has_gcm = bool(j["gcm_records"])
    msgs: list[tuple] = [
        (BUS_SHA_RESULT,
         [RESULT_TAG_JOURNAL]
         + digest_limbs(hashlib.sha256(journal).digest()) + [0], -1),
        (BUS_SHA_RESULT,
         [RESULT_TAG_STREAM] + digest_limbs(j["stream_sha256"])
         + [1 if has_gcm else 0], -1),
    ]
    for rec in parse_gcm_records(j["gcm_records"]):
        # the trailing cha field discriminates ChaCha20-Poly1305 records
        # (consumed by ChaChaControlAir) from AES-GCM ones (GcmControlAir,
        # whose fingerprint has no cha term ≡ cha = 0)
        msgs.append((BUS_GCM_RECORD,
                     [eid_off + rec["eid"]] + u16_limbs(rec["nonce"])
                     + u16_limbs(rec["tag"])
                     + [rec["n_blocks"], rec["ct_len"], rec["v13"],
                        rec["is_resp"], rec["cha"]], 1))
    if has_gcm:
        from ..stark.bus import BUS_HASH_RESULT, u16_limbs as _u16

        for begin, length, content in zip(
                j["filtered_begins"], j["filtered_lengths"],
                j["filtered_contents"]):
            for k in range(length):
                msgs.append((BUS_FILTERED,
                             [obj, 1, begin + k, content[k]], 1))
        # the keccak chip publishes the journal's request/response hashes
        # over the bus-bound application-stream bytes
        msgs.append((BUS_HASH_RESULT,
                     [obj, 0] + _u16(j["request_hash"]), -1))
        msgs.append((BUS_HASH_RESULT,
                     [obj, 1] + _u16(j["response_hash"]), -1))
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

    from ..stark.chips.stream_parser import parser_sessions_from_replay

    if len(outs) == 1:
        return outs[0]
    merged = _copy.copy(outs[0])
    merged.replay = _copy.copy(outs[0].replay)
    rec = SHA256Recorder()
    sha_events = []
    sha512_events = []
    gcm_events = []
    modmul_events = []
    ec_jobs = []
    ks_sessions = []
    metas = []
    sessions = []
    filtered = []
    kstreams = []
    eid_off = 0
    for i, out in enumerate(outs):
        off = (i + 1) << 20
        for e in out.replay.sha256_recorder.events:
            e2 = _copy.copy(e)
            # stream-tape chains keep deterministic ids (session i →
            # obj i+1, matching the verifier's filtered/bus derivation);
            # everything else is offset for uniqueness
            e2.obj = (i + 1) if e.expose_block else e.obj + off
            sha_events.append(e2)
        if out.replay.gcm_events:
            sessions.append(parser_sessions_from_replay(
                out.stream, out.replay.gcm_events, out.v13, obj=i + 1,
                eid_off=eid_off))
            kstreams.append((i + 1, 0, out.replay.request_plaintext))
            kstreams.append((i + 1, 1, out.replay.response_plaintext))
            for m in out.gcm_metas:
                m2 = _copy.copy(m)
                m2.eid = m.eid + eid_off
                m2.obj = i + 1
                metas.append(m2)
            filtered.extend(_filtered_multiplicities(out.journal,
                                                     obj=i + 1))
        r512 = getattr(out.replay, "sha512_recorder", None)
        if r512 is not None:
            for e in r512.events:
                e2 = _copy.copy(e)
                e2.obj = e.obj + off
                sha512_events.append(e2)
        gcm_events.extend(out.replay.gcm_events)
        eid_off += len(out.replay.gcm_events)
        modmul_events.extend(out.modmul_events)
        ecd = getattr(out.replay, "ecdhe_weierstrass", None)
        from ..stark.chips.ec import EC_CURVES as _ECC

        ec_rid = None
        if ecd is not None:
            ec_jobs.append(ecd)
            if ecd[0] in _ECC:
                ec_rid = 2 * (len(ec_jobs) - 1) + 2
        ks_sessions.extend(_derive_ks_sessions(
            out, obj=i + 1, ec_rid=ec_rid,
            sid_base=0x1000 + 0x20 * i))
    rec.events = sha_events
    merged.replay.sha256_recorder = rec
    if sha512_events:
        from ..guest.crypto.sha512 import SHA512Recorder

        rec512 = SHA512Recorder()
        rec512.events = sha512_events
        merged.replay.sha512_recorder = rec512
    else:
        merged.replay.sha512_recorder = None
    merged.replay.gcm_events = gcm_events
    merged.modmul_events = modmul_events
    merged.ec_jobs = ec_jobs
    merged.ks_sessions = ks_sessions
    merged.gcm_metas = metas
    merged.parser_sessions = sessions
    merged.filtered_mults = filtered
    merged.keccak_streams = kstreams
    return merged


def batch_public_messages(journals: list[bytes]) -> list[tuple]:
    """Verifier-side bus messages for a session batch: per-journal SHA
    results, GCM record headers with event ids renumbered by the global
    session-order enumeration, and filtered bytes under the session's
    stream object id (i + 1)."""
    from ..guest.journal import decode_journal
    from ..stark.chips.gcm_control import GCM_RECORD_SIZE

    msgs: list[tuple] = []
    eid_off = 0
    for i, journal in enumerate(journals):
        msgs += journal_public_messages(journal, obj=i + 1,
                                        eid_off=eid_off)
        j = decode_journal(journal)
        eid_off += len(j["gcm_records"]) // GCM_RECORD_SIZE
    return msgs


def _vk_jsonable(vk: dict) -> dict:
    """Groth16 vk dict → cbor-safe (32-byte big-endian coordinates)."""
    def e1(p):
        return [int(p[0]).to_bytes(32, "big"),
                int(p[1]).to_bytes(32, "big")]

    def e2(p):
        return [e1(p[0]), e1(p[1])]

    return {"alpha1": e1(vk["alpha1"]), "beta2": e2(vk["beta2"]),
            "gamma2": e2(vk["gamma2"]), "delta2": e2(vk["delta2"]),
            "ic": [e1(p) for p in vk["ic"]]}


def _vk_unjsonable(obj: dict) -> dict:
    def d1(p):
        return (int.from_bytes(p[0], "big"), int.from_bytes(p[1], "big"))

    def d2(p):
        return (d1(p[0]), d1(p[1]))

    return {"alpha1": d1(obj["alpha1"]), "beta2": d2(obj["beta2"]),
            "gamma2": d2(obj["gamma2"]), "delta2": d2(obj["delta2"]),
            "ic": [d1(p) for p in obj["ic"]]}


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

    # -- recursion: the compress rung (stark/recursion.py) ----------------

    def compress(self, journal: bytes, proof: bytes,
                 outer_config: StarkConfig | None = None,
                 timings: dict | None = None) -> bytes:
        """Wrap a machine proof in a recursion proof: the verifier-VM
        machine (VmAir + sponge chips, program in vk-committed
        preprocessed columns) verifies it in-circuit.  Returns a
        self-describing blob {vk, proof}; verify with
        `verify_compressed(journal, blob)`."""
        from ..core import cbor
        from ..stark.recursion import recursion_prove

        mp = MachineProof.from_bytes(proof)
        vk, outer = recursion_prove(
            journal_airs(journal, mp), mp, journal,
            public_messages=journal_public_messages(journal),
            inner_config=self.config,
            outer_config=outer_config or self.config,
            timings=timings)
        return cbor.dumps({"vk": vk.to_bytes(),
                           "proof": outer.to_bytes()})

    def verify_compressed(self, journal: bytes, blob: bytes,
                          outer_config: StarkConfig | None = None) -> bool:
        """Verify a compressed (recursion) proof.  The blob's vk is used
        only as a SHAPE carrier: the program root is re-derived locally
        (once per statement geometry, then disk-cached — recursion.
        trusted_vk), so a forged program can never smuggle in its own
        root.  Verification is then O(outer proof)."""
        from ..core import cbor
        from ..stark.recursion import (
            RecursionVK,
            recursion_verify,
            trusted_vk,
        )
        from ..stark.verifier import VerificationError

        obj = cbor.loads(blob)
        shape = RecursionVK.from_bytes(obj["vk"]).shape
        # required-chip policy matches the direct path: the shape's chip
        # set must satisfy the journal's requirements
        names = {n for n, _l, _p in shape.chips}
        registry = _air_registry()
        unknown = names - set(registry)
        if unknown:
            raise VerificationError(f"unknown chips in shape: {unknown}")
        airs = [registry[n]() for n in names]

        class _P:
            chips = [type("C", (), {"name": n})() for n in names]

        journal_airs(journal, _P())   # raises if required chips missing
        msgs = journal_public_messages(journal)
        vk = trusted_vk(airs, shape, journal, msgs,
                        inner_config=self.config,
                        outer_config=outer_config or self.config)
        return recursion_verify(
            airs, vk, MachineProof.from_bytes(obj["proof"]), journal,
            public_messages=msgs,
            inner_config=self.config,
            outer_config=outer_config or self.config)

    # -- the full wrap chain: compress → shrink → Groth16 ----------------

    def wrap(self, journal: bytes, proof: bytes,
             groth16_keys=None,
             shrink_config: StarkConfig | None = None,
             timings: dict | None = None) -> bytes:
        """machine proof → compress (Poseidon2 recursion) → shrink
        (BN254/MiMC recursion) → Groth16 — the reference's
        core→compress→shrink→wrap pipeline (sp1.rs:116, prover.rs:90).
        The returned blob carries {vk_a, vk_b, groth16 proof, g16 vk}; the
        Groth16 circuit IS the shrink-layer verifier, so the seal exists
        only if a valid machine STARK stands behind the journal.

        groth16_keys: a Groth16Keys CRS for this statement shape (from
        wrap_setup_chain / a previous run); when None, setup runs inline
        (fine for tests; cache it for production)."""
        from ..core import cbor
        from ..snark.groth16 import prove as g16_prove, setup as g16_setup
        from ..snark.stark_wrap import build_stark_wrap_circuit
        from ..stark.recursion import (
            _session_messages,
            outer_airs,
            recursion_prove,
            recursion_prove_bn,
        )

        mp = MachineProof.from_bytes(proof)
        airs = journal_airs(journal, mp)
        msgs = journal_public_messages(journal)
        t0 = __import__("time").time()
        vk_a, proof_a = recursion_prove(
            airs, mp, journal, public_messages=msgs,
            inner_config=self.config, timings=timings)
        if timings is not None:
            timings["compress_s"] = round(
                __import__("time").time() - t0, 2)
        a_binding = journal + vk_a.shape.to_bytes()
        a_msgs = _session_messages(vk_a.shape, journal, msgs)
        scfg = shrink_config or self.config
        t0 = __import__("time").time()
        vk_b, proof_b = recursion_prove_bn(
            outer_airs(), proof_a, a_binding, public_messages=a_msgs,
            inner_config=self.config, outer_config=scfg,
            inner_preprocessed_roots={
                "VmAir": list(vk_a.program_root)},
            timings=timings)
        if timings is not None:
            timings["shrink_s"] = round(__import__("time").time() - t0, 2)
        b_msgs = _session_messages(
            vk_b.shape, a_binding, a_msgs,
            dict((n, list(r)) for n, r in vk_b.inner_preprocessed_roots))
        b_binding = a_binding + vk_b.shape.to_bytes()
        t0 = __import__("time").time()
        cs = build_stark_wrap_circuit(
            outer_airs(), proof_b, b_binding, b_msgs, scfg,
            {"VmAir": vk_b.program_root})
        if timings is not None:
            timings["wrap_circuit_s"] = round(
                __import__("time").time() - t0, 2)
            timings["wrap_constraints"] = len(cs.constraints)
        if groth16_keys is None:
            groth16_keys = g16_setup(cs, seed=b"zktls-stark-wrap-v1")
        g16 = g16_prove(groth16_keys, cs)
        if timings is not None:
            timings["groth16_s"] = round(__import__("time").time() - t0, 2)
        return cbor.dumps({
            "vk_a": vk_a.to_bytes(), "vk_b": vk_b.to_bytes(),
            "g16": g16.to_bytes(),
            "g16_vk": cbor.dumps(_vk_jsonable(groth16_keys.vk())),
        })

    def verify_wrapped(self, journal: bytes, blob: bytes) -> bool:
        """Verify the Groth16 seal: recompute the statement digest from
        (journal, chain vks) and run the pairing check.  The Groth16 vk
        identifies the circuit — and the circuit embeds the shrink-layer
        program root, which transitively pins the compress program and
        the zkTLS machine behind it.  NOTE: the caller must trust the
        Groth16 vk for this statement shape (standard SNARK trust model —
        distribute it like the reference distributes its gnark vk)."""
        from ..core import cbor
        from ..snark.groth16 import Groth16Proof, verify as g16_verify
        from ..snark.stark_wrap import statement_digest_fr
        from ..stark.recursion import (
            RecursionVK,
            RecursionVKBN,
            _session_messages,
        )

        obj = cbor.loads(blob)
        vk_a = RecursionVK.from_bytes(obj["vk_a"])
        vk_b = RecursionVKBN.from_bytes(obj["vk_b"])
        msgs = journal_public_messages(journal)
        a_binding = journal + vk_a.shape.to_bytes()
        a_msgs = _session_messages(vk_a.shape, journal, msgs)
        b_msgs = _session_messages(
            vk_b.shape, a_binding, a_msgs,
            dict((n, list(r)) for n, r in vk_b.inner_preprocessed_roots))
        b_binding = a_binding + vk_b.shape.to_bytes()
        stmt = statement_digest_fr(b_binding, b_msgs,
                                   {"VmAir": vk_b.program_root})
        g16_vk = _vk_unjsonable(cbor.loads(obj["g16_vk"]))
        return g16_verify(g16_vk, [stmt],
                          Groth16Proof.from_bytes(obj["g16"]))

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
