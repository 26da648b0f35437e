"""Embedded trust-anchor store (Mozilla CA bundle snapshot, roots.pem).

The reference host pins `webpki_roots::TLS_SERVER_ROOTS`
(crates/input-builder/src/request.rs:25-27) and the guest verifies the
presented chain to one of those anchors inside the zkVM.  This module is
the framework's equivalent: a vendored snapshot of the Mozilla root
program's CA bundle (the same upstream webpki-roots is generated from),
loaded once and indexed by subject DER and SPKI hash.
"""

from __future__ import annotations

import hashlib
import pathlib
from functools import lru_cache

__all__ = ["trust_anchors", "find_anchor_by_subject", "anchor_spki_hashes"]

_PEM_PATH = pathlib.Path(__file__).with_name("roots.pem")


@lru_cache(maxsize=1)
def _store():
    """subject-DER → list of anchor certs; plus the SPKI sha256 set."""
    from cryptography import x509 as cx509

    pem = _PEM_PATH.read_bytes()
    by_subject: dict[bytes, list] = {}
    spki_hashes: set[bytes] = set()
    start = 0
    while True:
        b = pem.find(b"-----BEGIN CERTIFICATE-----", start)
        if b < 0:
            break
        e = pem.find(b"-----END CERTIFICATE-----", b)
        block = pem[b : e + len(b"-----END CERTIFICATE-----")]
        start = e + 1
        try:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                cert = cx509.load_pem_x509_certificate(block)
        except Exception:
            continue
        from cryptography.hazmat.primitives import serialization

        subj = cert.subject.public_bytes()
        spki = cert.public_key().public_bytes(
            serialization.Encoding.DER,
            serialization.PublicFormat.SubjectPublicKeyInfo)
        by_subject.setdefault(subj, []).append(cert)
        spki_hashes.add(hashlib.sha256(spki).digest())
    return by_subject, spki_hashes


def trust_anchors() -> dict:
    return _store()[0]


def anchor_spki_hashes() -> set:
    return _store()[1]


def find_anchor_by_subject(subject_der: bytes) -> list:
    """Anchor certificates whose subject equals the given DER name."""
    return _store()[0].get(subject_der, [])
