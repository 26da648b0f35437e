"""TLS key-schedule primitives: HMAC, the TLS 1.2 PRF (RFC 5246 §5) and the
TLS 1.3 HKDF schedule (RFC 8446 §7.1 / RFC 5869).

The fixture session derives its master secret via the *extended* master
secret (RFC 7627 — extension 23 is present in the recorded ServerHello) and
its key block via the TLS 1.2 PRF; TLS 1.3 sessions use HKDF instead.
All hashing flows through the witness-recording SHA-256 so every compression
reaches the SHA-256 AIR chip.
"""

from __future__ import annotations

import struct

from .sha256 import SHA256, SHA256Recorder

__all__ = ["hmac_sha256", "prf_sha256", "hkdf_extract", "hkdf_expand",
           "hkdf_expand_label", "tls13_derive_secret"]


def hmac_sha256(key: bytes, msg: bytes, rec: SHA256Recorder | None = None) -> bytes:
    if len(key) > 64:
        key = SHA256(key, recorder=rec).digest()
    key = key.ljust(64, b"\x00")
    inner = SHA256(bytes(b ^ 0x36 for b in key), recorder=rec).update(msg).digest()
    return SHA256(bytes(b ^ 0x5C for b in key), recorder=rec).update(inner).digest()


def prf_sha256(secret: bytes, label: bytes, seed: bytes, out_len: int,
               rec: SHA256Recorder | None = None) -> bytes:
    """P_SHA256(secret, label ‖ seed) — RFC 5246 §5."""
    ls = label + seed
    out = b""
    a = ls
    while len(out) < out_len:
        a = hmac_sha256(secret, a, rec)
        out += hmac_sha256(secret, a + ls, rec)
    return out[:out_len]


# ---------------------------------------------------------------------------
# TLS 1.3 HKDF schedule
# ---------------------------------------------------------------------------


def hkdf_extract(salt: bytes, ikm: bytes, rec: SHA256Recorder | None = None) -> bytes:
    return hmac_sha256(salt or b"\x00" * 32, ikm, rec)


def hkdf_expand(prk: bytes, info: bytes, out_len: int,
                rec: SHA256Recorder | None = None) -> bytes:
    out = b""
    t = b""
    i = 1
    while len(out) < out_len:
        t = hmac_sha256(prk, t + info + bytes([i]), rec)
        out += t
        i += 1
    return out[:out_len]


def hkdf_expand_label(secret: bytes, label: bytes, context: bytes, out_len: int,
                      rec: SHA256Recorder | None = None) -> bytes:
    full = b"tls13 " + label
    info = struct.pack(">H", out_len) + bytes([len(full)]) + full + \
        bytes([len(context)]) + context
    return hkdf_expand(secret, info, out_len, rec)


def tls13_derive_secret(secret: bytes, label: bytes, transcript_hash: bytes,
                        rec: SHA256Recorder | None = None) -> bytes:
    return hkdf_expand_label(secret, label, transcript_hash, 32, rec)
