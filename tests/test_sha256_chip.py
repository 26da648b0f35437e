"""SHA-256 chip: witness generation, constraint satisfaction, tamper
detection, and digest binding.  (The full STARK prove of this chip runs in
bench.py and the slow marker below — its one-time XLA trace is too heavy
for the default suite; pipeline coverage comes from the Fibonacci chip.)"""

import hashlib
import os
import struct

import numpy as np
import pytest

from zktls_tpu.guest.crypto.sha256 import _IV, SHA256Recorder
from zktls_tpu.stark.chips.sha256 import LAYOUT, Sha256Air, sha256_trace
from zktls_tpu.stark.debug import check_trace

AIR = Sha256Air()


def _pad_block(msg: bytes) -> bytes:
    assert len(msg) <= 55
    return msg + b"\x80" + b"\x00" * (55 - len(msg)) + struct.pack(
        ">Q", len(msg) * 8)


def _digest_from_public(public) -> bytes:
    words = [(public[2 * i + 1] << 16) | public[2 * i] for i in range(8)]
    return b"".join(w.to_bytes(4, "big") for w in words)


def test_single_block_digest_and_constraints():
    trace, public = sha256_trace([(_pad_block(b"abc"), _IV)])
    assert trace.shape == (64, LAYOUT.width)
    assert _digest_from_public(public) == hashlib.sha256(b"abc").digest()
    assert check_trace(AIR, trace, public) == []


def test_multi_block_from_recorder_events():
    rec = SHA256Recorder()
    h = rec.new()
    h.update(b"q" * 150)
    digest = h.digest()
    comps = [(e.block, e.state_in) for e in rec.events]
    trace, public = sha256_trace(comps)
    assert trace.shape[0] == 256  # 3 compressions -> padded to 4 blocks
    assert _digest_from_public(public) == digest
    assert check_trace(AIR, trace, public) == []


def test_bit_columns_are_bits():
    trace, _ = sha256_trace([(_pad_block(b"zk"), _IV)])
    for name in ("a", "e", "s0", "maj", "w1", "sig1", "hc"):
        sl = LAYOUT[name]
        assert set(np.unique(trace[:, sl])) <= {0, 1}, name


def test_tampered_witness_detected():
    trace, public = sha256_trace([(_pad_block(b"abc"), _IV)])
    for col in (0, LAYOUT["w_win"].start, LAYOUT["h_state"].start,
                LAYOUT["ch"].start):
        bad = trace.copy()
        bad[13, col] = (int(bad[13, col]) + 1) % 3  # flip a bit/limb
        assert check_trace(AIR, bad, public), f"col {col} tamper undetected"


def test_wrong_public_digest_detected():
    trace, public = sha256_trace([(_pad_block(b"abc"), _IV)])
    bad_public = list(public)
    bad_public[3] ^= 1
    fails = check_trace(AIR, trace, bad_public)
    assert fails and all(r == 63 for r, _c in fails)  # only the binding row


def test_padding_goes_in_front():
    """The digest-binding compression must be the last block group."""
    rec = SHA256Recorder()
    rec.new(b"first").digest()
    rec.new(b"second").digest()
    comps = [(e.block, e.state_in) for e in rec.events]
    trace, public = sha256_trace(comps)
    assert _digest_from_public(public) == hashlib.sha256(b"second").digest()


@pytest.mark.skipif(not os.environ.get("ZKTLS_SLOW_TESTS"),
                    reason="full SHA-256 chip STARK (one-time XLA trace is "
                           "minutes); set ZKTLS_SLOW_TESTS=1")
def test_full_prove_verify():
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.prover import prove
    from zktls_tpu.stark.verifier import verify

    cfg = StarkConfig(log_blowup=2, num_queries=8, fri_final_size=64)
    trace, public = sha256_trace([(_pad_block(b"abc"), _IV)])
    proof = prove(AIR, trace, public, cfg)
    assert verify(AIR, proof, cfg)
