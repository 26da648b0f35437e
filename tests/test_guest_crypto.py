"""Guest crypto primitives vs standard vectors and the `cryptography` oracle
(test pyramid level 1, SURVEY.md §4: pure-function golden tests)."""

import hashlib
import hmac as hmac_std
import os

import pytest

from zktls_tpu.guest.crypto.aes import AES
from zktls_tpu.guest.crypto.chacha import ChaCha20Poly1305
from zktls_tpu.guest.crypto.ec import P256, P384, SECP256K1, ecdsa_recover, ecdsa_verify
from zktls_tpu.guest.crypto.gcm import AESGCM, GCMEvent
from zktls_tpu.guest.crypto.prf import (
    hkdf_expand_label,
    hmac_sha256,
    prf_sha256,
)
from zktls_tpu.guest.crypto.rsa import rsa_pkcs1v15_verify, rsa_pss_verify
from zktls_tpu.guest.crypto.sha256 import SHA256, SHA256Recorder, sha256
from zktls_tpu.guest.crypto.x25519 import x25519, x25519_base


def test_sha256_vectors():
    assert sha256(b"") == hashlib.sha256(b"").digest()
    assert sha256(b"abc").hex() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    for n in [1, 55, 56, 63, 64, 65, 127, 128, 1000]:
        data = bytes(range(256)) * 4
        assert sha256(data[:n]) == hashlib.sha256(data[:n]).digest()


def test_sha256_incremental_and_recorder():
    rec = SHA256Recorder()
    h = rec.new()
    h.update(b"a" * 100)
    h.update(b"b" * 100)
    d = h.digest()
    assert d == hashlib.sha256(b"a" * 100 + b"b" * 100).digest()
    # 200 bytes + padding = 4 blocks compressed
    assert len(rec.events) == 4
    assert all(len(e.block) == 64 for e in rec.events)
    # event chain is consistent
    for prev, nxt in zip(rec.events, rec.events[1:]):
        assert prev.state_out == nxt.state_in


def test_hmac_and_prf():
    for klen in [5, 32, 64, 100]:
        k, m = os.urandom(klen), os.urandom(77)
        assert hmac_sha256(k, m) == hmac_std.new(k, m, hashlib.sha256).digest()
    # RFC 5246-style PRF self-consistency + length handling
    out = prf_sha256(b"secret", b"master secret", b"seed", 48)
    assert len(out) == 48
    assert out[:20] == prf_sha256(b"secret", b"master secret", b"seed", 20)


def test_hkdf_expand_label_rfc8448_vector():
    # RFC 8448 §3: derived = Derive-Secret(early_secret, "derived", "")
    early = bytes.fromhex(
        "33ad0a1c607ec03b09e6cd9893680ce210adf300aa1f2660e1b22e10f170f92a"
    )
    empty_hash = hashlib.sha256(b"").digest()
    derived = hkdf_expand_label(early, b"derived", empty_hash, 32)
    assert derived.hex() == (
        "6f2615a108c702c5678f54fc9dbab69716c076189c48250cebeac3576c3611ba"
    )


def test_aes_fips197_vectors():
    # FIPS 197 appendix C
    key128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert AES(key128).encrypt_block(pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    key256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert AES(key256).encrypt_block(pt).hex() == "8ea2b7ca516745bfeafc49904b496089"


def test_aes_gcm_vs_cryptography_oracle():
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM as OracleGCM

    for key_len in (16, 32):
        key = os.urandom(key_len)
        nonce = os.urandom(12)
        aad = os.urandom(13)
        pt = os.urandom(111)
        oracle_ct = OracleGCM(key).encrypt(nonce, pt, aad)
        ours = AESGCM(key)
        assert ours.encrypt(nonce, pt, aad) == oracle_ct
        events: list[GCMEvent] = []
        assert ours.decrypt(nonce, oracle_ct, aad, events) == pt
        (ev,) = events
        assert ev.plaintext == pt
        assert len(ev.keystream) == (len(pt) + 15) // 16
        with pytest.raises(ValueError, match="tag mismatch"):
            ours.decrypt(nonce, oracle_ct[:-1] + b"\x00", aad)


def test_chacha20poly1305_rfc8439_vector():
    key = bytes(range(0x80, 0xA0))
    nonce = bytes.fromhex("070000004041424344454647")
    aad = bytes.fromhex("50515253c0c1c2c3c4c5c6c7")
    pt = (
        b"Ladies and Gentlemen of the class of '99: If I could offer you "
        b"only one tip for the future, sunscreen would be it."
    )
    ct = ChaCha20Poly1305(key).encrypt(nonce, pt, aad)
    assert ct[-16:].hex() == "1ae10b594f09e26a7e902ecbd0600691"
    assert ChaCha20Poly1305(key).decrypt(nonce, ct, aad) == pt


def test_x25519_rfc7748_vector():
    k = bytes.fromhex(
        "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4"
    )
    u = bytes.fromhex(
        "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c"
    )
    assert x25519(k, u).hex() == (
        "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"
    )
    # base-point consistency with the cryptography oracle
    from cryptography.hazmat.primitives.asymmetric.x25519 import X25519PrivateKey
    from cryptography.hazmat.primitives import serialization

    priv = os.urandom(32)
    pk = X25519PrivateKey.from_private_bytes(priv)
    oracle_pub = pk.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw
    )
    assert x25519_base(priv) == oracle_pub


def test_p256_ecdh_vs_cryptography_oracle():
    from cryptography.hazmat.primitives.asymmetric import ec as oec

    priv = oec.generate_private_key(oec.SECP256R1())
    peer = oec.generate_private_key(oec.SECP256R1())
    shared = priv.exchange(oec.ECDH(), peer.public_key())
    d = priv.private_numbers().private_value
    q = peer.public_key().public_numbers()
    ours = P256.mul(d, (q.x, q.y))
    assert ours[0].to_bytes(32, "big") == shared
    assert P256.is_on_curve(ours)
    # SEC1 codec round-trip (compressed + uncompressed)
    enc = P256.encode_point(ours)
    assert P256.decode_point(enc) == ours
    assert P256.decode_point(P256.encode_point(ours, compressed=True)) == ours


def test_ecdsa_verify_vs_cryptography_oracle():
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec as oec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        decode_dss_signature,
    )

    for curve, ocurve, hname in [(P256, oec.SECP256R1(), hashlib.sha256),
                                 (P384, oec.SECP384R1(), hashlib.sha384)]:
        priv = oec.generate_private_key(ocurve)
        msg = b"zktls"
        sig = priv.sign(msg, oec.ECDSA(
            hashes.SHA256() if hname is hashlib.sha256 else hashes.SHA384()))
        r, s = decode_dss_signature(sig)
        pub = priv.public_key().public_numbers()
        h = hname(msg).digest()
        assert ecdsa_verify(curve, (pub.x, pub.y), h, r, s)
        assert not ecdsa_verify(curve, (pub.x, pub.y), h, r, s + 1)


def test_secp256k1_recover():
    # sign with a known key, then recover
    d = 0xC0FFEE + 12345
    pub = SECP256K1.mul(d, SECP256K1.g)
    z = int.from_bytes(hashlib.sha256(b"origin").digest(), "big")
    k = 0xDEADBEEF
    R = SECP256K1.mul(k, SECP256K1.g)
    r = R[0] % SECP256K1.n
    s = pow(k, -1, SECP256K1.n) * (z + r * d) % SECP256K1.n
    v = R[1] & 1
    # account for high-s normalization absence: direct recovery
    rec = ecdsa_recover(SECP256K1, hashlib.sha256(b"origin").digest(), r, s, v)
    assert rec == pub
    assert ecdsa_verify(SECP256K1, pub, hashlib.sha256(b"origin").digest(), r, s)


def test_rsa_verify_vs_cryptography_oracle():
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub = priv.public_key().public_numbers()
    msg = b"server key exchange"
    h = hashlib.sha256(msg).digest()
    sig15 = priv.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    assert rsa_pkcs1v15_verify(pub.n, pub.e, "sha256", h, sig15)
    assert not rsa_pkcs1v15_verify(pub.n, pub.e, "sha256", h, sig15[:-1] + b"\x00")
    sig_pss = priv.sign(
        msg,
        padding.PSS(mgf=padding.MGF1(hashes.SHA256()), salt_length=32),
        hashes.SHA256(),
    )
    assert rsa_pss_verify(pub.n, pub.e, "sha256", h, sig_pss)
    assert not rsa_pss_verify(pub.n, pub.e, "sha256", h, sig15)
