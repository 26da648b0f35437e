"""Key-schedule chip: the TLS 1.2 PRF chain premaster → master → traffic
keys proven via atomic SHA hop statements and xor-table opad proofs, with
the session key + nonce salt published for the record-control chip (the
reference guest's in-execution key derivation, SURVEY.md §3.4)."""

import pytest

from zktls_tpu.guest.crypto.prf import prf_sha256
from zktls_tpu.guest.crypto.sha256 import SHA256Recorder
from zktls_tpu.models.sha256_chip import sha256_instance
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.bus import (
    BUS_SESSION_KEY,
    MAX_PAYLOAD,
    delta_powers,
    u16_limbs,
)
from zktls_tpu.stark.chips.keyschedule import (
    KeyScheduleAir,
    KsSession,
    keyschedule_trace,
)
from zktls_tpu.stark.chips.xor_table import (
    XorTableAir,
    xor_table_trace,
    xor_use_counts,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.debug import check_trace
from zktls_tpu.stark.machine import (
    ChipInstance,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                  fri_final_size=64)
CHALS = [Fp4(222, 111, 7, 3)] + delta_powers(Fp4(919, 29, 5, 8),
                                             MAX_PAYLOAD)


def _session(pm_len=32):
    pm = bytes(range(pm_len))
    shash = bytes(range(100, 132))
    crand, srand = bytes(range(32)), bytes(range(32, 64))
    rec = SHA256Recorder()
    master = prf_sha256(pm, b"extended master secret", shash, 48, rec)
    key_block = prf_sha256(master, b"key expansion", srand + crand, 40,
                           rec)
    sess = KsSession(pm, master, b"extended master secret" + shash,
                     b"key expansion" + srand + crand, 3, 4)
    return rec, sess, key_block


def _skey_messages(key_block, sign=-1):
    msgs = []
    for dirf, mk in ((0, 3), (1, 4)):
        key = key_block[16 * dirf : 16 * dirf + 16]
        iv = key_block[32 + 4 * dirf : 32 + 4 * dirf + 4]
        payload = ([1, dirf, 0] + u16_limbs(key) + [0] * 8
                   + u16_limbs(iv) + [0] * 4)
        msgs.append((BUS_SESSION_KEY, payload, sign * mk))
    return msgs


@pytest.mark.parametrize("pm_len", [32, 48])
def test_trace_satisfies_air(pm_len):
    _rec, sess, _kb = _session(pm_len)
    trace, _hops, _xors = keyschedule_trace([sess])
    air = KeyScheduleAir()
    perm = air.generate_perm_trace(trace, [], CHALS)
    bus = [int(x) for x in perm[-1, -4:]]
    assert check_trace(air, trace, bus, perm_trace=perm,
                       challenges=CHALS) == []


@pytest.fixture(scope="module")
def proved():
    rec, sess, key_block = _session()
    trace, hops, xors = keyschedule_trace([sess])
    chips = [sha256_instance(rec.events, hop_counts=hops),
             ChipInstance(air=KeyScheduleAir(), trace=trace, publics=[])]
    xtrace, _ = xor_table_trace(xor_use_counts(xors))
    chips.append(ChipInstance(air=XorTableAir(), trace=xtrace,
                              publics=[]))
    proof = prove_machine(chips, binding=b"ks", config=CFG)
    return [c.air for c in chips], proof, key_block


def test_machine_roundtrip(proved):
    airs, proof, key_block = proved
    assert verify_machine(airs, proof, binding=b"ks",
                          public_messages=_skey_messages(key_block),
                          config=CFG)


def test_foreign_key_rejected(proved):
    airs, proof, key_block = proved
    bad = bytearray(key_block)
    bad[3] ^= 1   # flip a client-key byte
    with pytest.raises(VerificationError):
        verify_machine(airs, proof, binding=b"ks",
                       public_messages=_skey_messages(bytes(bad)),
                       config=CFG)


def test_foreign_salt_rejected(proved):
    airs, proof, key_block = proved
    bad = bytearray(key_block)
    bad[33] ^= 1  # flip a client-IV (record nonce salt) byte
    with pytest.raises(VerificationError):
        verify_machine(airs, proof, binding=b"ks",
                       public_messages=_skey_messages(bytes(bad)),
                       config=CFG)


def test_wrong_premaster_rejected_at_witness():
    rec, sess, _kb = _session()
    sess.premaster = bytes(32)  # not the PRF's secret
    with pytest.raises(ValueError, match="mismatch"):
        keyschedule_trace([sess])


def test_unrecorded_hop_rejected():
    """Consuming a compression the session never performed fails at the
    SHA chip's witness boundary (and would be unprovable)."""
    rec, sess, _kb = _session()
    _t, hops, _x = keyschedule_trace([sess])
    other = SHA256Recorder()
    prf_sha256(b"x" * 32, b"other", b"seed", 32, other)
    with pytest.raises(ValueError, match="no recorded event"):
        sha256_instance(other.events, hop_counts=hops)
