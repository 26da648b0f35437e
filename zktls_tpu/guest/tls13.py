"""TLS 1.3 (RFC 8446) key schedule and record protection, shared by the
recording client and the replaying guest.

The recorded ClientHello offers TLS 1.3 (supported_versions + x25519
key_share, SURVEY.md §2.3), so sessions against modern servers negotiate
1.3; the reference guest's rustls replays them the same way it replays 1.2.
All hashing runs through the witness-recording SHA-256.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .crypto.gcm import AESGCM, GCMEvent
from .crypto.chacha import ChaCha20Poly1305
from .crypto.prf import hkdf_expand_label, hkdf_extract, hmac_sha256
from .crypto.sha256 import SHA256Recorder
from .tls import CipherSuite, ContentType, Record

__all__ = ["Tls13KeySchedule", "Tls13RecordCrypto", "strip_inner_plaintext"]


@dataclass
class Tls13KeySchedule:
    """The SHA-256 HKDF schedule; secrets exposed for witness generation."""

    suite: CipherSuite
    rec: SHA256Recorder | None = None
    early_secret: bytes = b""
    handshake_secret: bytes = b""
    master_secret: bytes = b""
    client_hs_secret: bytes = b""
    server_hs_secret: bytes = b""
    client_app_secret: bytes = b""
    server_app_secret: bytes = b""
    secrets_log: dict = field(default_factory=dict)

    def start(self, shared_secret: bytes) -> None:
        zeros = b"\x00" * 32
        self.early_secret = hkdf_extract(zeros, zeros, self.rec)
        import hashlib

        empty_hash = hashlib.sha256(b"").digest()
        derived = hkdf_expand_label(self.early_secret, b"derived",
                                    empty_hash, 32, self.rec)
        self.handshake_secret = hkdf_extract(derived, shared_secret, self.rec)

    def handshake_traffic(self, transcript_hash: bytes) -> None:
        self.client_hs_secret = hkdf_expand_label(
            self.handshake_secret, b"c hs traffic", transcript_hash, 32,
            self.rec)
        self.server_hs_secret = hkdf_expand_label(
            self.handshake_secret, b"s hs traffic", transcript_hash, 32,
            self.rec)
        self.secrets_log["c_hs"] = self.client_hs_secret
        self.secrets_log["s_hs"] = self.server_hs_secret

    def application_traffic(self, transcript_hash: bytes) -> None:
        import hashlib

        empty_hash = hashlib.sha256(b"").digest()
        derived = hkdf_expand_label(self.handshake_secret, b"derived",
                                    empty_hash, 32, self.rec)
        self.master_secret = hkdf_extract(derived, b"\x00" * 32, self.rec)
        self.client_app_secret = hkdf_expand_label(
            self.master_secret, b"c ap traffic", transcript_hash, 32,
            self.rec)
        self.server_app_secret = hkdf_expand_label(
            self.master_secret, b"s ap traffic", transcript_hash, 32,
            self.rec)
        self.secrets_log["c_ap"] = self.client_app_secret
        self.secrets_log["s_ap"] = self.server_app_secret

    def finished_verify(self, base_secret: bytes, transcript_hash: bytes
                        ) -> bytes:
        fk = hkdf_expand_label(base_secret, b"finished", b"", 32, self.rec)
        return hmac_sha256(fk, transcript_hash, self.rec)


class Tls13RecordCrypto:
    """Per-direction record protection: key/iv from a traffic secret,
    nonce = iv XOR seq (RFC 8446 §5.3)."""

    def __init__(self, suite: CipherSuite, secret: bytes,
                 rec: SHA256Recorder | None = None):
        self.suite = suite
        self.key = hkdf_expand_label(secret, b"key", b"", suite.key_len, rec)
        self.iv = hkdf_expand_label(secret, b"iv", b"", 12, rec)
        self.aead = (AESGCM(self.key) if suite.aead == "aes-gcm"
                     else ChaCha20Poly1305(self.key))
        self.seq = 0

    def _nonce(self) -> bytes:
        return bytes(a ^ b for a, b in zip(self.iv,
                                           self.seq.to_bytes(12, "big")))

    def decrypt(self, record: Record,
                events: list[GCMEvent] | None = None) -> bytes:
        aad = bytes([record.typ]) + record.version + \
            len(record.payload).to_bytes(2, "big")
        nonce = self._nonce()
        if isinstance(self.aead, AESGCM):
            out = self.aead.decrypt(nonce, record.payload, aad, events)
        else:
            out = self.aead.decrypt(nonce, record.payload, aad)
        self.seq += 1
        return out

    def encrypt(self, inner_plaintext: bytes) -> bytes:
        total = len(inner_plaintext) + 16
        aad = bytes([ContentType.APPLICATION_DATA]) + b"\x03\x03" + \
            total.to_bytes(2, "big")
        out = self.aead.encrypt(self._nonce(), inner_plaintext, aad)
        self.seq += 1
        return out


def strip_inner_plaintext(plaintext: bytes) -> tuple[int, bytes]:
    """TLSInnerPlaintext: content ‖ type ‖ zero-padding — returns
    (content_type, content)."""
    i = len(plaintext) - 1
    while i >= 0 and plaintext[i] == 0:
        i -= 1
    if i < 0:
        raise ValueError("all-padding TLS 1.3 record")
    return plaintext[i], plaintext[:i]
