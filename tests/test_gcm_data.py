"""GCM data chip + stream parser + xor table wired through the real bus in
one machine proof; public messages stand in for the SHA-256, control and
GHASH chips and the verifier's filtered-byte sends."""

import numpy as np
import pytest

from types import SimpleNamespace

from zktls_tpu.stark.bus import (
    BUS_FILTERED,
    BUS_GCM_CT,
    BUS_GCM_KS,
    BUS_SHA_BLOCK,
)
from zktls_tpu.stark.chips.gcm_data import GcmDataAir, gcm_data_trace
from zktls_tpu.stark.chips.record_walk import walk_stream_records
from zktls_tpu.stark.chips.stream_parser import (
    StreamParserAir,
    parser_sessions_from_replay,
    parser_trace,
)
from zktls_tpu.stark.chips.xor_table import (
    XorTableAir,
    xor_table_trace,
    xor_use_counts,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from test_stream_parser import _mini_session, parser_messages  # noqa: E402

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0, fri_final_size=16)
OBJ = 1


def _events_with_keystream(events, stream):
    """Attach deterministic fake keystream to the mini-session events."""
    recs = {bytes(ev.tag): i for i, ev in enumerate(events)}
    metas = walk_stream_records(stream, events, False)
    out = list(events)
    for meta in metas:
        n_blocks = (len(meta.ct) + 15) // 16
        ks = [bytes((meta.eid * 31 + b * 7 + j) % 256
                    for j in range(16)) for b in range(n_blocks)]
        out[meta.eid] = SimpleNamespace(
            tag=out[meta.eid].tag, plaintext=out[meta.eid].plaintext,
            keystream=ks)
    return out


def _setup():
    stream, events = _mini_session()
    events = _events_with_keystream(events, stream)
    metas = walk_stream_records(stream, events, False)
    # filtered claim: bytes 5..12 of the response
    resp = bytearray()
    for meta in sorted((m for m in metas if m.is_resp),
                       key=lambda m: m.rbase):
        ks = b"".join(events[meta.eid].keystream)
        resp += bytes(c ^ k for c, k in zip(meta.ct, ks))
    frange = (5, 8)
    filtered = [(frange[0] + i, 1) for i in range(frange[1])]
    filt_msgs = [(BUS_FILTERED,
                  [OBJ, 1, frange[0] + i, resp[frange[0] + i]], 1)
                 for i in range(frange[1])]

    sess = parser_sessions_from_replay(stream, events, False, OBJ)
    ptrace, _ = parser_trace([sess])
    dtrace, _, xor_pairs = gcm_data_trace(metas, events, 0, OBJ,
                                          filtered=filtered)
    xtrace, _ = xor_table_trace(xor_use_counts(xor_pairs))
    chips = [
        ChipInstance(air=StreamParserAir(), trace=ptrace, publics=[]),
        ChipInstance(air=GcmDataAir(), trace=dtrace, publics=[]),
        ChipInstance(air=XorTableAir(), trace=xtrace, publics=[]),
    ]
    msgs = []
    # SHA chip stand-in: sends the tape's half-blocks
    for tag, payload, mult in parser_messages(stream, events, 0, OBJ):
        if tag == BUS_SHA_BLOCK:
            msgs.append((tag, payload, mult))
    # control-chip stand-in: consumes parse-rec/nonce/tag bytes, sends ks
    for tag, payload, mult in parser_messages(stream, events, 0, OBJ):
        if tag != BUS_SHA_BLOCK:
            # BUS_CT_BYTE is consumed by the data chip, not here
            from zktls_tpu.stark.bus import BUS_CT_BYTE

            if tag != BUS_CT_BYTE:
                msgs.append((tag, payload, mult))
    for meta in metas:
        ks = events[meta.eid].keystream
        for bi, blk in enumerate(ks):
            limbs = [blk[2 * j] * 256 + blk[2 * j + 1] for j in range(8)]
            msgs.append((BUS_GCM_KS, [meta.eid, bi + 1] + limbs, 1))
        # GHASH stand-in: consumes the assembled ct blocks
        for bi in range(len(ks)):
            cb = meta.ct[16 * bi : 16 * bi + 16].ljust(16, b"\x00")
            limbs = [cb[2 * j] * 256 + cb[2 * j + 1] for j in range(8)]
            msgs.append((BUS_GCM_CT, [meta.eid, bi + 1] + limbs, -1))
    msgs += filt_msgs
    # keccak stand-in: consume every app-stream plaintext byte
    from zktls_tpu.stark.bus import BUS_HASH_BYTE

    for meta in metas:
        if not meta.is_app:
            continue
        ks = b"".join(events[meta.eid].keystream)
        pt = bytes(cb ^ kb for cb, kb in zip(meta.ct, ks))
        dsv = 1 if meta.dir == "s" else 0
        for j, byq in enumerate(pt):
            msgs.append((BUS_HASH_BYTE,
                         [OBJ, dsv, meta.rbase + j, byq], -1))
    return chips, msgs


AIRS = [StreamParserAir(), GcmDataAir(), XorTableAir()]


def test_parser_gcmdata_xor_machine():
    chips, msgs = _setup()
    proof = prove_machine(chips, binding=b"gcmdata", config=CFG)
    mp = MachineProof.from_bytes(proof.to_bytes())
    assert verify_machine(AIRS, mp, binding=b"gcmdata",
                          public_messages=msgs, config=CFG)


def test_forged_filtered_byte_rejected():
    chips, msgs = _setup()
    proof = prove_machine(chips, binding=b"gcmdata", config=CFG)
    mp = MachineProof.from_bytes(proof.to_bytes())
    bad = [(t, list(p), m) for t, p, m in msgs]
    for ent in bad:
        if ent[0] == BUS_FILTERED:
            ent[1][2] ^= 1     # claim a different response byte
            break
    with pytest.raises(VerificationError):
        verify_machine(AIRS, mp, binding=b"gcmdata",
                       public_messages=bad, config=CFG)


def _v13_meta_and_events(inner_type: int, claim_app: int):
    """One fake TLS 1.3 GCM record whose plaintext ends with `inner_type`,
    with the prover claiming is_app = claim_app."""
    from zktls_tpu.stark.chips.record_walk import GcmRecordMeta

    pt = bytes(range(20)) + bytes([inner_type])
    ks = bytes((7 * i + 3) % 256 for i in range(32))
    ct = bytes(p ^ k for p, k in zip(pt, ks))
    ev = SimpleNamespace(tag=b"\xaa" * 16, plaintext=pt,
                         keystream=[ks[:16], ks[16:]])
    meta = GcmRecordMeta(dir="s", eid=0, seqno=0, rectype=23,
                         ct_len=len(ct), is_resp=claim_app,
                         is_app=claim_app, rbase=0, ct=ct,
                         tag=b"\x01" * 16, v13=1)
    return [meta], [ev]


@pytest.mark.parametrize("inner_type,claim", [(23, 0), (22, 1)])
def test_v13_inner_type_refutes_false_isr(inner_type, claim):
    """Round-4 soundness fix: a TLS 1.3 record cannot under-claim
    is_resp = 0 on a true application record (hiding response bytes from
    the keccak/filtered binding) nor over-claim it on a handshake record
    — the chip checks the decrypted inner content type byte."""
    from zktls_tpu.ops.field_ref import Fp4
    from zktls_tpu.stark.bus import MAX_PAYLOAD, delta_powers
    from zktls_tpu.stark.debug import check_trace

    challenges = [Fp4(5, 1, 2, 3)] + delta_powers(Fp4(11, 7, 13, 2),
                                                  MAX_PAYLOAD)
    air = GcmDataAir()

    # honest claim satisfies the AIR
    metas, events = _v13_meta_and_events(inner_type, 1 if inner_type == 23
                                         else 0)
    trace, _, _ = gcm_data_trace(metas, events, 1, OBJ)
    perm = air.generate_perm_trace(trace, [], challenges)
    publics = [int(v) for v in perm[-1, -4:]]
    assert check_trace(air, trace, publics, perm_trace=perm,
                       challenges=challenges) == []

    # the false claim violates the inner-content-type constraints
    metas, events = _v13_meta_and_events(inner_type, claim)
    trace, _, _ = gcm_data_trace(metas, events, 1, OBJ)
    perm = air.generate_perm_trace(trace, [], challenges)
    publics = [int(v) for v in perm[-1, -4:]]
    assert check_trace(air, trace, publics, perm_trace=perm,
                       challenges=challenges) != []


def test_forged_ct_block_rejected():
    chips, msgs = _setup()
    proof = prove_machine(chips, binding=b"gcmdata", config=CFG)
    mp = MachineProof.from_bytes(proof.to_bytes())
    bad = [(t, list(p), m) for t, p, m in msgs]
    for ent in bad:
        if ent[0] == BUS_GCM_CT:
            ent[1][3] ^= 4     # GHASH would consume a different block
            break
    with pytest.raises(VerificationError):
        verify_machine(AIRS, mp, binding=b"gcmdata",
                       public_messages=bad, config=CFG)
