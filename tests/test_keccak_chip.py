"""Keccak-256 chip: reference-vs-guest oracle, machine proof with
bus-bound stream bytes, and forged-hash rejection."""

import pytest

from zktls_tpu.guest.crypto.keccak import keccak256
from zktls_tpu.stark.bus import BUS_HASH_BYTE, BUS_HASH_RESULT, u16_limbs
from zktls_tpu.stark.chips.keccak import (
    KeccakAir,
    keccak256_ref,
    keccak_trace,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0, fri_final_size=16)


def test_reference_matches_guest_keccak():
    for msg in (b"", b"a", b"hello world", b"x" * 135, b"y" * 136,
                b"z" * 137, bytes(range(256)) * 3):
        assert keccak256_ref(msg) == keccak256(msg), len(msg)


def _msgs(streams):
    msgs = []
    for obj, dirs, data in streams:
        for pos, byv in enumerate(data):
            msgs.append((BUS_HASH_BYTE, [obj, dirs, pos, byv], 1))
        msgs.append((BUS_HASH_RESULT,
                     [obj, dirs] + u16_limbs(keccak256_ref(data)), -1))
    return msgs


STREAMS = [(1, 0, b"GET /get HTTP/1.1\r\nHost: httpbin.org\r\n\r\n"),
           (1, 1, b"HTTP/1.1 200 OK\r\n\r\n" + b"J" * 150)]


def test_keccak_machine_prove_verify():
    trace, publics = keccak_trace(STREAMS)
    chips = [ChipInstance(air=KeccakAir(), trace=trace, publics=publics)]
    proof = prove_machine(chips, binding=b"keccak", config=CFG)
    mp = MachineProof.from_bytes(proof.to_bytes())
    assert verify_machine([KeccakAir()], mp, binding=b"keccak",
                          public_messages=_msgs(STREAMS), config=CFG)
    # forged digest claim
    bad = _msgs(STREAMS)
    bad[-1] = (BUS_HASH_RESULT,
               [1, 1] + u16_limbs(keccak256_ref(b"forged")), -1)
    with pytest.raises(VerificationError):
        verify_machine([KeccakAir()], MachineProof.from_bytes(
            proof.to_bytes()), binding=b"keccak",
            public_messages=bad, config=CFG)
    # forged stream byte claim
    bad = _msgs(STREAMS)
    tag, payload, mult = bad[3]
    bad[3] = (tag, [payload[0], payload[1], payload[2],
                    payload[3] ^ 1], mult)
    with pytest.raises(VerificationError):
        verify_machine([KeccakAir()], MachineProof.from_bytes(
            proof.to_bytes()), binding=b"keccak",
            public_messages=bad, config=CFG)
